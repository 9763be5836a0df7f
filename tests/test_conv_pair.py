"""The generalized fused conv-pair kernels (ops/pallas/conv_pair.py) must
reproduce the oracle compositions — values and input gradients — for both
epilogue configurations, including the two-pair chain that covers VGG-19's
4-conv block 3. Interpret mode on CPU; seeds keep pre-activations away
from ReLU knife edges (see tests/test_block2.py for why).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models import vgg as V
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import conv_pair as CP


def _w(r, cin, cout, scale=0.05):
    return (
        jnp.asarray(r.randn(3, 3, cin, cout).astype(np.float32) * scale),
        jnp.asarray(r.randn(cout).astype(np.float32) * 0.1),
    )


def test_pair_gram_matches_oracle():
    r = np.random.RandomState(5)
    k1, b1 = _w(r, 128, 256)
    k2, b2 = _w(r, 256, 256)
    x = jnp.asarray(r.randn(1, 10, 14, 128).astype(np.float32) * 0.3)
    y1 = jax.nn.relu(V._conv(x, k1, b1))
    y2_ref = jax.nn.relu(V._conv(y1, k2, b2))
    g_ref = L.gram_matrix(y1)
    (y2_k, g_k) = jax.jit(lambda x: CP.pair_gram(x, k1, b1, k2, b2))(x)
    assert y2_k.shape == y2_ref.shape
    np.testing.assert_allclose(np.asarray(y2_k), np.asarray(y2_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_pair_pool_matches_oracle():
    r = np.random.RandomState(6)
    k1, b1 = _w(r, 256, 256)
    k2, b2 = _w(r, 256, 256)
    x = jnp.asarray(r.randn(1, 12, 8, 256).astype(np.float32) * 0.3)
    y1 = jax.nn.relu(V._conv(x, k1, b1))
    p_ref = V._pool(jax.nn.relu(V._conv(y1, k2, b2)), "average", None)
    p_k = jax.jit(lambda x: CP.pair_pool(x, k1, b1, k2, b2))(x)
    assert p_k.shape == p_ref.shape == (1, 6, 4, 256)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref), atol=1e-4)


def test_block3_chain_gradient_matches_oracle():
    """pair_gram -> pair_pool == VGG-19 block 3 (4 convs + pool + conv3_1
    Gram): values and the input gradient."""
    r = np.random.RandomState(14)
    k1, b1 = _w(r, 64, 128)   # stand-in widths (same structure, smaller)
    k2, b2 = _w(r, 128, 128)
    k3, b3 = _w(r, 128, 128)
    k4, b4 = _w(r, 128, 128)
    x = jnp.asarray(r.randn(1, 12, 16, 64).astype(np.float32) * 0.3)

    def loss_oracle(x):
        y1 = jax.nn.relu(V._conv(x, k1, b1))
        y2 = jax.nn.relu(V._conv(y1, k2, b2))
        y3 = jax.nn.relu(V._conv(y2, k3, b3))
        y4 = jax.nn.relu(V._conv(y3, k4, b4))
        p = V._pool(y4, "average", None)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(L.gram_matrix(y1) ** 2)

    def loss_k(x):
        y2, g = CP.pair_gram(x, k1, b1, k2, b2)
        p = CP.pair_pool(y2, k3, b3, k4, b4)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    # knife-edge precondition (see tests/test_block2.py)
    y1 = jax.nn.relu(V._conv(x, k1, b1))
    y2 = jax.nn.relu(V._conv(y1, k2, b2))
    y3 = jax.nn.relu(V._conv(y2, k3, b3))
    pres = [V._conv(x, k1, b1), V._conv(y1, k2, b2), V._conv(y2, k3, b3),
            V._conv(y3, k4, b4)]
    margin = min(float(jnp.min(jnp.abs(p))) for p in pres)
    assert margin > 2e-6, f"pick another seed (margin {margin:.1e})"

    v1, g1 = jax.jit(jax.value_and_grad(loss_oracle))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_k))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-5 * max(1.0, scale))


def test_pair_pool_gram_matches_block2_kernel():
    """The generalized pair with pool+gram reproduces the dedicated block-2
    kernel (same structure, shared tile tables)."""
    from style_transfer_tpu.ops.pallas import block2 as B2

    r = np.random.RandomState(7)
    k1, b1 = _w(r, 64, 128)
    k2, b2 = _w(r, 128, 128)
    x = jnp.asarray(r.randn(1, 8, 12, 64).astype(np.float32) * 0.3)
    pair = CP.make_conv_pair(pool=True, gram=True)
    (p_a, g_a) = jax.jit(lambda x: pair(x, k1, b1, k2, b2))(x)
    (p_b, g_b) = jax.jit(lambda x: B2.block2_fused(x, k1, b1, k2, b2))(x)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), rtol=1e-6, atol=1e-6)


def test_shape_validation():
    r = np.random.RandomState(8)
    k1, b1 = _w(r, 64, 128)
    k2, b2 = _w(r, 128, 128)
    with pytest.raises(ValueError, match="even"):
        CP.pair_pool(jnp.zeros((1, 15, 16, 256)), *_w(r, 256, 256), *_w(r, 256, 256))


def test_block4_chain_gradient_matches_oracle():
    """pair_gram -> pair_pool at the REAL block-4 channel widths
    (256->512, 512->512): values and the input gradient. Small spatial
    extents keep interpret mode fast; the channel widths are what block 4
    dispatches in production (api.py's packed_block4 chain)."""
    r = np.random.RandomState(21)
    k1, b1 = _w(r, 256, 512)
    k2, b2 = _w(r, 512, 512)
    k3, b3 = _w(r, 512, 512)
    k4, b4 = _w(r, 512, 512)
    x = jnp.asarray(r.randn(1, 6, 8, 256).astype(np.float32) * 0.3)

    def loss_oracle(x):
        y1 = jax.nn.relu(V._conv(x, k1, b1))
        y2 = jax.nn.relu(V._conv(y1, k2, b2))
        y3 = jax.nn.relu(V._conv(y2, k3, b3))
        y4 = jax.nn.relu(V._conv(y3, k4, b4))
        p = V._pool(y4, "average", None)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(L.gram_matrix(y1) ** 2)

    def loss_k(x):
        y2, g = CP.pair_gram(x, k1, b1, k2, b2)
        p = CP.pair_pool(y2, k3, b3, k4, b4)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    y1 = jax.nn.relu(V._conv(x, k1, b1))
    y2 = jax.nn.relu(V._conv(y1, k2, b2))
    y3 = jax.nn.relu(V._conv(y2, k3, b3))
    pres = [V._conv(x, k1, b1), V._conv(y1, k2, b2), V._conv(y2, k3, b3),
            V._conv(y3, k4, b4)]
    margin = min(float(jnp.min(jnp.abs(p))) for p in pres)
    assert margin > 2e-6, f"pick another seed (margin {margin:.1e})"

    v1, g1 = jax.jit(jax.value_and_grad(loss_oracle))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_k))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-5 * max(1.0, scale))


@pytest.mark.parametrize("pool,gram", [(True, True), (True, False),
                                       (False, True), (False, False)])
def test_w_chunked_taps_bit_identical(pool, gram):
    """Above effective width 2048 the kernels compute their fp32 tap sums
    in W-chunks to fit scoped VMEM (the 4096px scale). Chunking must be
    BIT-identical to the unchunked computation — the same per-element sum
    in the same order — values and input gradients."""
    r = np.random.RandomState(21)
    k1, b1 = _w(r, 64, 128)
    k2, b2 = _w(r, 128, 128)
    x = jnp.asarray(r.randn(1, 8, 16, 64).astype(np.float32) * 0.3)

    def loss_fn(pair):
        def f(x):
            out = pair(x, k1, b1, k2, b2)
            if gram:
                y, g = out
                return jnp.sum(y * y) + 100.0 * jnp.sum(g * g)
            return jnp.sum(out * out)
        return f

    v1, g1 = jax.value_and_grad(
        loss_fn(CP.make_conv_pair(pool=pool, gram=gram, w_chunks=1))
    )(x)
    v2, g2 = jax.value_and_grad(
        loss_fn(CP.make_conv_pair(pool=pool, gram=gram, w_chunks=2))
    )(x)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(g1), np.asarray(g2))


def test_w_chunks_auto():
    """Auto chunk count: engages above effective width 2048 (CEIL — widths
    strictly between 2048 and 4096 must chunk too), keeps chunk widths
    divisible, degrades to 1 when the width cannot split."""
    from style_transfer_tpu.ops.pallas.block1_packed import fits_scoped_vmem

    # two-conv validated envelope (no chunking needed)
    assert CP._w_chunks(1024, 128) == 1   # block 2 at 2048px
    assert CP._w_chunks(512, 256) == 1    # block 3 at 2048px
    # the 4096px scale (the singles' fp32 accumulators chunk here)
    assert CP._w_chunks(2048, 128) == 2   # block 2
    assert CP._w_chunks(1024, 256) == 2   # block 3
    assert CP._w_chunks(512, 512) == 2    # block 4
    # UHD (3840): eff 3840 is over the unchunked budget — ceil gives 2
    assert CP._w_chunks(1920, 128) == 2   # block 1/2 at 3840px
    # indivisible width cannot chunk
    assert CP._w_chunks(2047, 128) == 1   # 4094px: half-width has no factor
    # the deprecated round-3 gate now returns the hardware-validated
    # two-conv envelope (eff <= 2048) — NOT the chunked-accumulator
    # heuristic that passed shapes which don't compile (vmem.py)
    assert fits_scoped_vmem(1024, 128)    # eff 2048: validated both ways
    assert not fits_scoped_vmem(1920, 128)  # eff 3840: beyond the envelope
    assert not fits_scoped_vmem(2048, 128)  # eff 4096: measured overflow


def test_taps_w_rejects_indivisible_chunks():
    """A partial last chunk would silently leave ref columns unwritten;
    _taps_w must refuse instead."""
    from style_transfer_tpu.ops.pallas.block1_packed import _taps_w

    xh = jnp.zeros((4, 6, 64), jnp.float32)
    k = jnp.zeros((3, 3, 64, 64), jnp.float32)
    with pytest.raises(ValueError, match="does not split"):
        _taps_w(xh, k, flip=False, contract_out=False, nchunks=4,
                post=lambda a, c0, c1: a)


def test_pool_pair_rejects_odd_chunk_width():
    """Pooling pairs W-columns inside each chunk; an odd chunk width must
    be refused at trace time, not crash in the kernel."""
    r = np.random.RandomState(3)
    k1, b1 = _w(r, 64, 64)
    k2, b2 = _w(r, 64, 64)
    x = jnp.asarray(r.rand(1, 8, 6, 64).astype(np.float32))
    pair = CP.make_conv_pair(pool=True, gram=False, w_chunks=3)  # cw = 2 ok
    pair(x, k1, b1, k2, b2)
    bad = CP.make_conv_pair(pool=True, gram=False, w_chunks=2)  # cw = 3 odd
    with pytest.raises(ValueError, match="even W-chunks"):
        bad(x, k1, b1, k2, b2)
