"""The fused single-conv+Gram kernel (ops/pallas/conv_gram.py) must
reproduce the oracle composition — Gram value and input gradient — in
interpret mode on CPU, including on an 8-device mesh via its shard_map
wrapper. Seeds keep pre-activations away from ReLU knife edges (see
tests/test_block2.py for why).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models import vgg as V
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import conv_gram as CG


def _w(r, cin, cout, scale=0.05):
    return (
        jnp.asarray(r.randn(3, 3, cin, cout).astype(np.float32) * scale),
        jnp.asarray(r.randn(cout).astype(np.float32) * 0.1),
    )


def _margin(x, k, b):
    return float(jnp.min(jnp.abs(V._conv(x, k, b))))


def test_conv_gram_matches_oracle():
    r = np.random.RandomState(5)
    k, b = _w(r, 256, 256)
    x = jnp.asarray(r.randn(1, 10, 14, 256).astype(np.float32) * 0.3)
    g_ref = L.gram_matrix(jax.nn.relu(V._conv(x, k, b)))
    g_k = jax.jit(lambda x: CG.conv_gram(x, k, b))(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_conv_gram_gradient_matches_oracle():
    r = np.random.RandomState(11)
    k, b = _w(r, 128, 128)
    x = jnp.asarray(r.randn(1, 12, 16, 128).astype(np.float32) * 0.3)
    assert _margin(x, k, b) > 2e-6, "pick another seed"
    t = jnp.asarray(r.randn(128, 128).astype(np.float32))

    def loss_oracle(x):
        g = L.gram_matrix(jax.nn.relu(V._conv(x, k, b)))
        return jnp.sum((g - t) ** 2)

    def loss_k(x):
        return jnp.sum((CG.conv_gram(x, k, b) - t) ** 2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_oracle))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_k))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-5 * max(1.0, scale))


def test_conv_gram_odd_rows_pad():
    """Heights that don't divide the row tile exercise the _pad_rows path."""
    r = np.random.RandomState(9)
    k, b = _w(r, 128, 128)
    x = jnp.asarray(r.randn(1, 7, 10, 128).astype(np.float32) * 0.3)
    g_ref = L.gram_matrix(jax.nn.relu(V._conv(x, k, b)))
    g_k = jax.jit(lambda x: CG.conv_gram(x, k, b))(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_conv_gram_shape_validation():
    r = np.random.RandomState(8)
    k, b = _w(r, 64, 64)
    with pytest.raises(ValueError, match="conv_gram"):
        CG.conv_gram(jnp.zeros((2, 8, 8, 64)), k, b)


@pytest.fixture(scope="module")
def mesh8():
    from style_transfer_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (forced-host) devices")
    return mesh_mod.make_mesh(8)


def test_sharded_conv_gram_matches_unsharded(mesh8):
    from style_transfer_tpu.parallel import mesh as mesh_mod

    r = np.random.RandomState(13)
    k, b = _w(r, 128, 128)
    x = jnp.asarray(r.randn(1, 16, 12, 128).astype(np.float32) * 0.3)
    assert _margin(x, k, b) > 2e-6, "pick another seed"
    t = jnp.asarray(r.randn(128, 128).astype(np.float32))
    sharded = CG.make_sharded_conv_gram(mesh8, mesh_mod.SPATIAL_AXIS)

    def loss_ref(x):
        return jnp.sum((CG.conv_gram(x, k, b) - t) ** 2)

    def loss_sh(x):
        return jnp.sum((sharded(x, k, b) - t) ** 2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_ref))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_sh))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-5 * max(1.0, scale))


def test_sharded_conv_gram_shape_gate(mesh8):
    from style_transfer_tpu.parallel import mesh as mesh_mod

    r = np.random.RandomState(8)
    k, b = _w(r, 64, 64)
    sharded = CG.make_sharded_conv_gram(mesh8, mesh_mod.SPATIAL_AXIS)
    with pytest.raises(ValueError, match="divisible"):
        sharded(jnp.zeros((1, 12, 8, 64)), k, b)
