"""Optimizer tests: convex quadratics, scipy L-BFGS cross-check (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from style_transfer_tpu.optim import OptimizerSpec, make_chunk_fn, make_step_fn


def _quadratic(target):
    def objective(x):
        loss = 0.5 * jnp.sum(jnp.square(x - target))
        return loss, {"loss": loss}

    return objective


def test_adam_converges_on_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0])
    step, opt = make_step_fn(_quadratic(target), OptimizerSpec("adam", learning_rate=0.1))
    x = jnp.zeros(3)
    state = opt.init(x)
    run = jax.jit(make_chunk_fn(step, 500))
    x, state, losses = run(x, state)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-3)
    assert float(losses["loss"][-1]) < 1e-6


def test_lbfgs_converges_fast_on_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    step, opt = make_step_fn(_quadratic(target), OptimizerSpec("lbfgs"))
    x = jnp.zeros(4)
    state = opt.init(x)
    run = jax.jit(make_chunk_fn(step, 10))
    x, state, losses = run(x, state)
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-5)


def test_lbfgs_matches_scipy_on_rosenbrock():
    """Same minimizer as scipy's L-BFGS-B on the 2-D Rosenbrock function."""

    def rosen(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    def objective(x):
        v = rosen(x)
        return v, {"loss": v}

    step, opt = make_step_fn(objective, OptimizerSpec("lbfgs", memory_size=10))
    x = jnp.asarray([-1.2, 1.0])
    state = opt.init(x)
    run = jax.jit(make_chunk_fn(step, 120))
    x, state, _ = run(x, state)

    ref = scipy.optimize.minimize(
        lambda v: rosen(v), np.array([-1.2, 1.0]), method="L-BFGS-B"
    )
    np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-4)


def test_chunk_fn_is_jittable_and_stacks_losses():
    step, opt = make_step_fn(_quadratic(jnp.ones(2)), OptimizerSpec("adam", learning_rate=0.05))
    x = jnp.zeros(2)
    run = jax.jit(make_chunk_fn(step, 7))
    x, state, losses = run(x, opt.init(x))
    assert losses["loss"].shape == (7,)
    # monotone decrease on a quadratic with small lr
    seq = np.asarray(losses["loss"])
    assert (np.diff(seq) <= 1e-9).all()


def test_unknown_optimizer_rejected():
    with pytest.raises(ValueError, match="unknown optimizer"):
        OptimizerSpec("sgd").build()
