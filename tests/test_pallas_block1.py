"""Fused block-1 tail kernel vs the jnp oracle (forward AND custom VJP).

``block1_tail(r1, k2, b2)`` must equal average-pooled ``relu(conv(r1)+b2)``
plus ``gram_matrix(r1)`` (models/vgg.py::_conv/_pool + ops/losses.py), and
its gradient w.r.t. ``r1`` must match ``jax.grad`` of the oracle objective.
Interpreter mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models.vgg import _conv, _pool
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import block1 as B


def _inputs(h, w, seed=0, dtype=jnp.float32):
    r = np.random.RandomState(seed)
    r1 = jnp.asarray(np.maximum(r.randn(1, h, w, 64), 0).astype(np.float32)).astype(dtype)
    k2 = jnp.asarray(r.randn(3, 3, 64, 64).astype(np.float32) * 0.05).astype(dtype)
    b2 = jnp.asarray(r.randn(64).astype(np.float32) * 0.1).astype(dtype)
    return r1, k2, b2


def _oracle(r1, k2, b2):
    pool = _pool(jax.nn.relu(_conv(r1, k2, b2)), "average", None)
    gram = L.gram_matrix(r1)
    return pool, gram


@pytest.mark.parametrize("hw,dtype", [
    ((8, 8), jnp.float32),
    ((16, 24), jnp.float32),
    ((24, 16), jnp.bfloat16),
])
def test_forward_matches_oracle(hw, dtype):
    h, w = hw
    r1, k2, b2 = _inputs(h, w, seed=1, dtype=dtype)
    pool_f, gram_f = B.block1_tail(r1, k2, b2)
    pool_o, gram_o = _oracle(r1, k2, b2)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(pool_f, np.float32), np.asarray(pool_o, np.float32),
        rtol=tol, atol=tol,
    )
    np.testing.assert_allclose(gram_f, gram_o, rtol=tol, atol=tol)


@pytest.mark.parametrize("hw,dtype", [
    ((8, 8), jnp.float32),
    ((16, 24), jnp.float32),
    ((24, 16), jnp.bfloat16),
])
def test_backward_matches_oracle(hw, dtype):
    """Gradient through BOTH outputs (pool used downstream + gram in a
    style loss), the exact composition the objective uses."""
    h, w = hw
    r1, k2, b2 = _inputs(h, w, seed=2, dtype=dtype)
    rng = np.random.RandomState(3)
    t_pool = jnp.asarray(rng.randn(1, h // 2, w // 2, 64).astype(np.float32)).astype(dtype)
    t_gram = jnp.asarray(rng.randn(64, 64).astype(np.float32))

    def loss_fused(x):
        pool, gram = B.block1_tail(x, k2, b2)
        return L.content_loss(pool, t_pool) + 256.0 * L.style_loss(gram, t_gram)

    def loss_oracle(x):
        pool, gram = _oracle(x, k2, b2)
        return L.content_loss(pool, t_pool) + 256.0 * L.style_loss(gram, t_gram)

    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(loss_fused(r1), loss_oracle(r1), rtol=tol)
    g_f = jax.grad(loss_fused)(r1)
    g_o = jax.grad(loss_oracle)(r1)
    np.testing.assert_allclose(
        np.asarray(g_f, np.float32), np.asarray(g_o, np.float32),
        rtol=tol, atol=tol * 0.1,
    )


def test_shape_validation():
    r1, k2, b2 = _inputs(8, 8)
    with pytest.raises(ValueError):
        B.block1_tail(r1[:, :5], k2, b2)  # H odd
    with pytest.raises(ValueError):
        B.block1_tail(r1[:, :, :7], k2, b2)  # W odd


def test_unaligned_height_pads():
    """H not a multiple of the tile (e.g. 20) zero-pads internally and must
    still match the oracle, forward and backward."""
    r1, k2, b2 = _inputs(20, 16, seed=6)
    pool_f, gram_f = B.block1_tail(r1, k2, b2)
    pool_o, gram_o = _oracle(r1, k2, b2)
    np.testing.assert_allclose(pool_f, pool_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gram_f, gram_o, rtol=1e-5, atol=1e-5)

    t_gram = jnp.asarray(np.random.RandomState(7).randn(64, 64).astype(np.float32))

    def loss(x, fused):
        pool, gram = (B.block1_tail if fused else _oracle)(x, k2, b2)[:2]
        return jnp.sum(pool.astype(jnp.float32) ** 2) + L.style_loss(gram, t_gram)

    g_f = jax.grad(lambda x: loss(x, True))(r1)
    g_o = jax.grad(lambda x: loss(x, False))(r1)
    np.testing.assert_allclose(g_f, g_o, rtol=1e-4, atol=1e-5)


def _oracle_full(x, k1, b1, k2, b2):
    r1 = jax.nn.relu(_conv(x, k1, b1))
    pool = _pool(jax.nn.relu(_conv(r1, k2, b2)), "average", None)
    return pool, L.gram_matrix(r1)


def _full_inputs(h, w, seed=0, dtype=jnp.float32):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.rand(1, h, w, 3).astype(np.float32)).astype(dtype)
    k1 = jnp.asarray(r.randn(3, 3, 3, 64).astype(np.float32) * 0.2).astype(dtype)
    b1 = jnp.asarray(r.randn(64).astype(np.float32) * 0.1).astype(dtype)
    k2 = jnp.asarray(r.randn(3, 3, 64, 64).astype(np.float32) * 0.05).astype(dtype)
    b2 = jnp.asarray(r.randn(64).astype(np.float32) * 0.1).astype(dtype)
    return x, k1, b1, k2, b2


@pytest.mark.parametrize("hw,dtype", [
    ((16, 16), jnp.float32),
    ((24, 32), jnp.float32),
    ((20, 16), jnp.float32),  # H pads to the tile internally
    ((32, 16), jnp.bfloat16),
])
def test_full_forward_matches_oracle(hw, dtype):
    h, w = hw
    x, k1, b1, k2, b2 = _full_inputs(h, w, seed=8, dtype=dtype)
    pool_f, gram_f = B.block1_full(x, k1, b1, k2, b2)
    pool_o, gram_o = _oracle_full(x, k1, b1, k2, b2)
    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(
        np.asarray(pool_f, np.float32), np.asarray(pool_o, np.float32),
        rtol=tol, atol=tol,
    )
    np.testing.assert_allclose(gram_f, gram_o, rtol=tol, atol=tol)


@pytest.mark.parametrize("hw,dtype", [
    ((16, 16), jnp.float32),
    ((20, 16), jnp.float32),
    ((32, 16), jnp.bfloat16),
])
def test_full_backward_matches_oracle(hw, dtype):
    h, w = hw
    x, k1, b1, k2, b2 = _full_inputs(h, w, seed=9, dtype=dtype)
    rng = np.random.RandomState(10)
    t_pool = jnp.asarray(rng.randn(1, h // 2, w // 2, 64).astype(np.float32)).astype(dtype)
    t_gram = jnp.asarray(rng.randn(64, 64).astype(np.float32))

    def loss(xx, fused):
        f = B.block1_full if fused else _oracle_full
        pool, gram = f(xx, k1, b1, k2, b2)
        return L.content_loss(pool, t_pool) + 256.0 * L.style_loss(gram, t_gram)

    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(loss(x, True), loss(x, False), rtol=tol)
    g_f = jax.grad(lambda xx: loss(xx, True))(x)
    g_o = jax.grad(lambda xx: loss(xx, False))(x)
    np.testing.assert_allclose(
        np.asarray(g_f, np.float32), np.asarray(g_o, np.float32),
        rtol=tol, atol=tol * 0.1,
    )
