"""The fused block-2 kernel (ops/pallas/block2.py) must reproduce the oracle
composition — conv2_1+ReLU+conv2_2+ReLU+avg-pool and the conv2_1 Gram —
values AND input gradient, in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models import vgg as V
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import block2 as B2


@pytest.fixture(scope="module")
def weights():
    r = np.random.RandomState(0)
    return (
        jnp.asarray(r.randn(3, 3, 64, 128).astype(np.float32) * 0.05),
        jnp.asarray(r.randn(128).astype(np.float32) * 0.1),
        jnp.asarray(r.randn(3, 3, 128, 128).astype(np.float32) * 0.05),
        jnp.asarray(r.randn(128).astype(np.float32) * 0.1),
    )


def _oracle(p1, k1, b1, k2, b2):
    y1 = jax.nn.relu(V._conv(p1, k1, b1))
    y2 = jax.nn.relu(V._conv(y1, k2, b2))
    return V._pool(y2, "average", None), L.gram_matrix(y1)


@pytest.mark.parametrize("hw", [(16, 16), (18, 10), (8, 24)])
def test_forward_matches_oracle(weights, hw):
    k1, b1, k2, b2 = weights
    h, w = hw
    p1 = jnp.asarray(np.random.RandomState(1).randn(1, h, w, 64).astype(np.float32) * 0.5)
    pool_ref, g_ref = jax.jit(lambda x: _oracle(x, k1, b1, k2, b2))(p1)
    pool_k, g_k = jax.jit(lambda x: B2.block2_fused(x, k1, b1, k2, b2))(p1)
    assert pool_k.shape == pool_ref.shape == (1, h // 2, w // 2, 128)
    np.testing.assert_allclose(np.asarray(pool_k), np.asarray(pool_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_input_gradient_matches_oracle(weights):
    k1, b1, k2, b2 = weights
    h, w = 12, 16
    p1 = jnp.asarray(np.random.RandomState(2).randn(1, h, w, 64).astype(np.float32) * 0.5)

    def loss_ref(x):
        p, g = _oracle(x, k1, b1, k2, b2)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    def loss_k(x):
        p, g = B2.block2_fused(x, k1, b1, k2, b2)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_ref))(p1)
    v2, g2 = jax.jit(jax.value_and_grad(loss_k))(p1)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5 * max(1.0, scale))


def test_composes_with_packed_block1(weights):
    """block1_packed -> block2_fused end-to-end vs the oracle two-block
    chain, values and image gradient.

    The seed is chosen so every pre-activation keeps a >=5e-6 margin from
    zero (asserted below): at a ReLU knife edge the subgradient is
    ambiguous and a ~1-ulp fp-reassociation difference between the kernel
    and the oracle legitimately flips a mask bit, which is not a bug but
    would fail an elementwise gradient comparison (seed 3 hits exactly one
    such edge at this shape)."""
    from style_transfer_tpu.ops.pallas import block1_packed as B1

    r = np.random.RandomState(9)
    k11 = jnp.asarray(r.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b11 = jnp.asarray(r.randn(64).astype(np.float32) * 0.1)
    k12 = jnp.asarray(r.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b12 = jnp.asarray(r.randn(64).astype(np.float32) * 0.1)
    # fresh block-2 weights from the same stream (the module fixture's
    # weights pair with seed-3 inputs at a knife edge — see docstring)
    k21 = jnp.asarray(r.randn(3, 3, 64, 128).astype(np.float32) * 0.05)
    b21 = jnp.asarray(r.randn(128).astype(np.float32) * 0.1)
    k22 = jnp.asarray(r.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    b22 = jnp.asarray(r.randn(128).astype(np.float32) * 0.1)
    x = jnp.asarray(r.randn(1, 16, 24, 3).astype(np.float32))

    # precondition: no pre-activation within 5e-6 of the ReLU knife edge
    pre11 = V._conv(x, k11, b11)
    y11 = jax.nn.relu(pre11)
    pre12 = V._conv(y11, k12, b12)
    p1 = V._pool(jax.nn.relu(pre12), "average", None)
    pre21 = V._conv(p1, k21, b21)
    pre22 = V._conv(jax.nn.relu(pre21), k22, b22)
    margin = min(float(jnp.min(jnp.abs(p))) for p in (pre11, pre12, pre21, pre22))
    assert margin > 5e-6, (
        f"test data sits {margin:.1e} from a ReLU knife edge — pick another seed"
    )

    def loss_oracle(x):
        y11 = jax.nn.relu(V._conv(x, k11, b11))
        y12 = jax.nn.relu(V._conv(y11, k12, b12))
        p1 = V._pool(y12, "average", None)
        p2, g21 = _oracle(p1, k21, b21, k22, b22)
        return (jnp.sum(p2.astype(jnp.float32) ** 2)
                + 5.0 * jnp.sum(L.gram_matrix(y11) ** 2) + 10.0 * jnp.sum(g21**2))

    def loss_k(x):
        p1, g11 = B1.block1_packed(x, k11, b11, k12, b12)
        p2, g21 = B2.block2_fused(p1, k21, b21, k22, b22)
        return (jnp.sum(p2.astype(jnp.float32) ** 2)
                + 5.0 * jnp.sum(g11**2) + 10.0 * jnp.sum(g21**2))

    v1, g1 = jax.jit(jax.value_and_grad(loss_oracle))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_k))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-5 * max(1.0, scale))


def test_shape_validation(weights):
    k1, b1, k2, b2 = weights
    with pytest.raises(ValueError, match="even"):
        B2.block2_fused(jnp.zeros((1, 15, 16, 64)), k1, b1, k2, b2)
    with pytest.raises(ValueError, match="even"):
        B2.block2_fused(jnp.zeros((1, 16, 16, 32)), k1, b1, k2, b2)
