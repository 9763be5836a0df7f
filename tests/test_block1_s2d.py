"""Exactness of the space-to-depth block-1 lowering (models/block1_s2d.py):
same multiply-adds as the standard conv path, re-grouped — pool1, the
conv1_1 Gram, and the image gradient must all match the oracle to fp32
reassociation tolerance, for both pooling modes and non-square shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models import vgg as V
from style_transfer_tpu.models.block1_s2d import block1_s2d, gram_from_blocked
from style_transfer_tpu.ops import losses as L


@pytest.fixture(scope="module")
def weights():
    r = np.random.RandomState(0)
    return (
        jnp.asarray(r.randn(3, 3, 3, 64).astype(np.float32) * 0.1),
        jnp.asarray(r.randn(64).astype(np.float32) * 0.1),
        jnp.asarray(r.randn(3, 3, 64, 64).astype(np.float32) * 0.05),
        jnp.asarray(r.randn(64).astype(np.float32) * 0.1),
    )


def _naive(x, k1, b1, k2, b2, pooling):
    y1 = jax.nn.relu(V._conv(x, k1, b1))
    y2 = jax.nn.relu(V._conv(y1, k2, b2))
    return V._pool(y2, pooling, None), y1


@pytest.mark.parametrize("pooling", ["average", "max"])
@pytest.mark.parametrize("hw", [(16, 16), (34, 26), (8, 48)])
def test_pool1_and_gram_match_oracle(weights, pooling, hw):
    k1, b1, k2, b2 = weights
    h, w = hw
    x = jnp.asarray(np.random.RandomState(1).randn(1, h, w, 3).astype(np.float32))
    p_ref, y1_ref = jax.jit(lambda x: _naive(x, k1, b1, k2, b2, pooling))(x)
    p_s2d, y1b = jax.jit(
        lambda x: block1_s2d(x, k1, b1, k2, b2, pooling=pooling)
    )(x)
    assert p_s2d.shape == p_ref.shape == (1, h // 2, w // 2, 64)
    np.testing.assert_allclose(np.asarray(p_s2d), np.asarray(p_ref), atol=2e-6)
    g_ref = L.gram_matrix(y1_ref)
    g_s2d = gram_from_blocked(y1b, (h, w))
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_image_gradient_matches_oracle(weights):
    k1, b1, k2, b2 = weights
    h, w = 20, 28
    x = jnp.asarray(np.random.RandomState(2).randn(1, h, w, 3).astype(np.float32))

    def loss_ref(x):
        p, y1 = _naive(x, k1, b1, k2, b2, "average")
        return jnp.sum(p**2) + 10.0 * jnp.sum(L.gram_matrix(y1) ** 2)

    def loss_s2d(x):
        p, y1b = block1_s2d(x, k1, b1, k2, b2)
        return jnp.sum(p**2) + 10.0 * jnp.sum(gram_from_blocked(y1b, (h, w)) ** 2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_ref))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_s2d))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-6 * max(1.0, scale))


def test_dummy_slots_are_zero(weights):
    """The shifted blocking's boundary slots (full-res rows/cols -1 and H/W)
    must be exactly zero — they stand in for conv1_2's zero padding and
    must not pollute the Gram."""
    k1, b1, k2, b2 = weights
    x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16, 3).astype(np.float32))
    _, y1b = block1_s2d(x, k1, b1, k2, b2)
    hb, wb = y1b.shape[1], y1b.shape[2]
    grid = np.asarray(y1b).reshape(hb, wb, 2, 2, 64)
    assert np.all(grid[0, :, 0] == 0)  # full-res row -1
    assert np.all(grid[-1, :, 1] == 0)  # full-res row H
    assert np.all(grid[:, 0, :, 0] == 0)  # full-res col -1
    assert np.all(grid[:, -1, :, 1] == 0)  # full-res col W


def test_shape_validation(weights):
    k1, b1, k2, b2 = weights
    with pytest.raises(ValueError, match="even"):
        block1_s2d(jnp.zeros((1, 15, 16, 3)), k1, b1, k2, b2)
    with pytest.raises(ValueError, match="pooling"):
        block1_s2d(jnp.zeros((1, 16, 16, 3)), k1, b1, k2, b2, pooling="median")
