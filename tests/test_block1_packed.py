"""The W-pair-packed fused block-1 kernel (ops/pallas/block1_packed.py) must
reproduce the oracle composition — conv1_1+ReLU+conv1_2+ReLU+avg-pool and the
conv1_1 Gram — values AND image gradient, in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models import vgg as V
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import block1_packed as B


@pytest.fixture(scope="module")
def weights():
    r = np.random.RandomState(0)
    return (
        jnp.asarray(r.randn(3, 3, 3, 64).astype(np.float32) * 0.1),
        jnp.asarray(r.randn(64).astype(np.float32) * 0.1),
        jnp.asarray(r.randn(3, 3, 64, 64).astype(np.float32) * 0.05),
        jnp.asarray(r.randn(64).astype(np.float32) * 0.1),
    )


def _oracle(x, k1, b1, k2, b2):
    y1 = jax.nn.relu(V._conv(x, k1, b1))
    y2 = jax.nn.relu(V._conv(y1, k2, b2))
    return V._pool(y2, "average", None), L.gram_matrix(y1)


@pytest.mark.parametrize("hw", [(16, 16), (34, 26), (8, 48), (20, 8)])
def test_forward_matches_oracle(weights, hw):
    k1, b1, k2, b2 = weights
    h, w = hw
    x = jnp.asarray(np.random.RandomState(1).randn(1, h, w, 3).astype(np.float32))
    p_ref, g_ref = jax.jit(lambda x: _oracle(x, k1, b1, k2, b2))(x)
    p_k, g_k = jax.jit(lambda x: B.block1_packed(x, k1, b1, k2, b2))(x)
    assert p_k.shape == p_ref.shape == (1, h // 2, w // 2, 64)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref), atol=3e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_image_gradient_matches_oracle(weights):
    k1, b1, k2, b2 = weights
    h, w = 20, 28
    x = jnp.asarray(np.random.RandomState(2).randn(1, h, w, 3).astype(np.float32))

    def loss_ref(x):
        p, g = _oracle(x, k1, b1, k2, b2)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    def loss_k(x):
        p, g = B.block1_packed(x, k1, b1, k2, b2)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_ref))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_k))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=3e-6 * max(1.0, scale))


def test_padded_height_path(weights):
    """Heights that are not a multiple of 2*tile exercise the zero-padded
    tail rows (masked out of conv/Gram and sliced off the outputs)."""
    k1, b1, k2, b2 = weights
    h, w = 10, 16  # tile at W=16 is 32 -> heavy padding
    x = jnp.asarray(np.random.RandomState(3).randn(1, h, w, 3).astype(np.float32))
    p_ref, g_ref = _oracle(x, k1, b1, k2, b2)
    p_k, g_k = B.block1_packed(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref), atol=3e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_packed_im2col_roundtrip():
    """col2im(im2col-adjoint) sanity: d(sum(patches * t))/dx equals the
    XLA autodiff of the packed im2col."""
    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(12, 8, 3).astype(np.float32))
    t = jnp.asarray(r.randn(12, 4, 128).astype(np.float32))

    def f(x):
        return jnp.sum(B._im2col_packed(x) * t)

    g_auto = jax.grad(f)(x)
    g_manual = B._col2im_packed(t, 8)
    np.testing.assert_allclose(np.asarray(g_manual), np.asarray(g_auto), atol=1e-5)


def test_shape_validation(weights):
    k1, b1, k2, b2 = weights
    with pytest.raises(ValueError, match="even"):
        B.block1_packed(jnp.zeros((1, 15, 16, 3)), k1, b1, k2, b2)


def test_w_chunked_taps_bit_identical(weights, monkeypatch):
    """Above effective width 2048 (the 4096px scale) the kernel computes
    its fp32 tap sums and conv1_1 matmuls in W-chunks to fit scoped VMEM.
    Chunking must be BIT-identical — same per-element sums, same order —
    values and image gradient."""
    k1, b1, k2, b2 = weights
    r = np.random.RandomState(9)
    x = jnp.asarray(r.randn(1, 8, 16, 3).astype(np.float32) * 0.3)

    def loss(x):
        p, g = B.block1_packed(x, k1, b1, k2, b2)
        return jnp.sum(p * p) + 100.0 * jnp.sum(g * g)

    results = {}
    for n in (1, 2):
        monkeypatch.setattr(B, "_w_chunks", lambda w, c, _n=n: _n)
        results[n] = jax.value_and_grad(loss)(x)
    (v1, g1), (v2, g2) = results[1], results[2]
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(g1), np.asarray(g2))
