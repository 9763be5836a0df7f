"""The fused single-conv kernels (ops/pallas/conv_single.py) must
reproduce the oracle compositions — values and input gradients — for
every epilogue configuration, and a chain of singles must match the pair
kernel it decomposes (the 4096px-scale VMEM fallback path). Interpret
mode on CPU; seeds keep pre-activations away from ReLU knife edges (see
tests/test_block2.py for why).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models import vgg as V
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import conv_pair as CP
from style_transfer_tpu.ops.pallas import conv_single as CS


def _w(r, cin, cout, scale=0.05):
    return (
        jnp.asarray(r.randn(3, 3, cin, cout).astype(np.float32) * scale),
        jnp.asarray(r.randn(cout).astype(np.float32) * 0.1),
    )


def test_single_plain_matches_oracle():
    r = np.random.RandomState(5)
    k, b = _w(r, 128, 256)
    x = jnp.asarray(r.randn(1, 10, 14, 128).astype(np.float32) * 0.3)
    y_ref = jax.nn.relu(V._conv(x, k, b))
    y_k = jax.jit(lambda x: CS.single_plain(x, k, b))(x)
    assert y_k.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-4)


def test_single_gram_matches_oracle():
    r = np.random.RandomState(6)
    k, b = _w(r, 64, 128)
    x = jnp.asarray(r.randn(1, 12, 8, 64).astype(np.float32) * 0.3)
    y_ref = jax.nn.relu(V._conv(x, k, b))
    g_ref = L.gram_matrix(y_ref)
    y_k, g_k = jax.jit(lambda x: CS.single_gram(x, k, b))(x)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_single_pool_matches_oracle():
    r = np.random.RandomState(7)
    k, b = _w(r, 256, 256)
    x = jnp.asarray(r.randn(1, 12, 8, 256).astype(np.float32) * 0.3)
    p_ref = V._pool(jax.nn.relu(V._conv(x, k, b)), "average", None)
    p_k = jax.jit(lambda x: CS.single_pool(x, k, b))(x)
    assert p_k.shape == p_ref.shape == (1, 6, 4, 256)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref), atol=1e-4)


def _margin_ok(x, weights):
    """Knife-edge precondition (see tests/test_block2.py)."""
    y = x
    margin = np.inf
    for k, b in weights:
        pre = V._conv(y, k, b)
        margin = min(margin, float(jnp.min(jnp.abs(pre))))
        y = jax.nn.relu(pre)
    return margin


def test_singles_chain_matches_pair_and_oracle():
    """gram-single -> plain-single -> plain-single -> pool-single == the
    two-pair chain == the XLA oracle for a 4-conv block (values + input
    gradient). This chain is exactly how the api decomposes a block when
    the pair kernels' VMEM envelope doesn't fit (ops/pallas/vmem.py)."""
    r = np.random.RandomState(14)
    ws = [_w(r, 64, 128), _w(r, 128, 128), _w(r, 128, 128), _w(r, 128, 128)]
    (k1, b1), (k2, b2), (k3, b3), (k4, b4) = ws
    x = jnp.asarray(r.randn(1, 12, 16, 64).astype(np.float32) * 0.3)
    assert _margin_ok(x, ws) > 2e-6, "pick another seed"

    def loss_oracle(x):
        y1 = jax.nn.relu(V._conv(x, k1, b1))
        y2 = jax.nn.relu(V._conv(y1, k2, b2))
        y3 = jax.nn.relu(V._conv(y2, k3, b3))
        y4 = jax.nn.relu(V._conv(y3, k4, b4))
        p = V._pool(y4, "average", None)
        return (jnp.sum(p.astype(jnp.float32) ** 2)
                + 10.0 * jnp.sum(L.gram_matrix(y1) ** 2))

    def loss_pairs(x):
        y2, g = CP.pair_gram(x, k1, b1, k2, b2)
        p = CP.pair_pool(y2, k3, b3, k4, b4)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    def loss_singles(x):
        y1, g = CS.single_gram(x, k1, b1)
        y2 = CS.single_plain(y1, k2, b2)
        y3 = CS.single_plain(y2, k3, b3)
        p = CS.single_pool(y3, k4, b4)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    v0, g0 = jax.jit(jax.value_and_grad(loss_oracle))(x)
    v1, g1 = jax.jit(jax.value_and_grad(loss_pairs))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_singles))(x)
    scale = float(jnp.max(jnp.abs(g0)))
    np.testing.assert_allclose(float(v2), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g0),
                               atol=2e-5 * max(1.0, scale))
    # singles vs pairs agree even tighter (same tap order per conv)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=1e-6 * max(1.0, scale))


def test_single_gram_gradient_matches_oracle():
    """The Gram cotangent path through the single (y @ S inside the ReLU
    gate) against jax.grad of the unfused objective."""
    r = np.random.RandomState(9)
    k, b = _w(r, 64, 128)
    x = jnp.asarray(r.randn(1, 8, 12, 64).astype(np.float32) * 0.3)
    assert _margin_ok(x, [(k, b)]) > 2e-6

    def loss_oracle(x):
        y = jax.nn.relu(V._conv(x, k, b))
        return jnp.sum(y.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(
            L.gram_matrix(y) ** 2
        )

    def loss_k(x):
        y, g = CS.single_gram(x, k, b)
        return jnp.sum(y.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    v1, g1 = jax.jit(jax.value_and_grad(loss_oracle))(x)
    v2, g2 = jax.jit(jax.value_and_grad(loss_k))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=2e-5 * max(1.0, scale))


@pytest.mark.parametrize("pool,gram", [(True, False), (False, True),
                                       (False, False)])
def test_single_w_chunked_bit_identical(pool, gram):
    """W-chunked tap sums must be BIT-identical to unchunked — the same
    per-element sum in the same order — values and input gradients
    (same contract as the pair kernels)."""
    r = np.random.RandomState(21)
    k, b = _w(r, 64, 128)
    x = jnp.asarray(r.randn(1, 8, 16, 64).astype(np.float32) * 0.3)

    def loss_fn(single):
        def f(x):
            out = single(x, k, b)
            if gram:
                y, g = out
                return jnp.sum(y * y) + 100.0 * jnp.sum(g * g)
            return jnp.sum(out * out)
        return f

    v1, g1 = jax.value_and_grad(
        loss_fn(CS.make_conv_single(pool=pool, gram=gram, w_chunks=1))
    )(x)
    v2, g2 = jax.value_and_grad(
        loss_fn(CS.make_conv_single(pool=pool, gram=gram, w_chunks=2))
    )(x)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(g1), np.asarray(g2))


def test_single_shape_validation():
    r = np.random.RandomState(8)
    k, b = _w(r, 256, 256)
    with pytest.raises(ValueError, match="even"):
        CS.single_pool(jnp.zeros((1, 15, 16, 256)), k, b)
    bad = CS.make_conv_single(pool=True, gram=False, w_chunks=2)  # cw=3 odd
    with pytest.raises(ValueError, match="even W-chunks"):
        bad(jnp.zeros((1, 8, 6, 256)), k, b)


# ---------------------------------------------------- singles on the mesh

from style_transfer_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 fake CPU devices"
    return mesh_mod.make_mesh()


@pytest.mark.parametrize(
    "pool,gram,cin,cout",
    [(False, True, 64, 128), (False, False, 128, 128), (True, False, 128, 128)],
)
def test_sharded_single_matches_unsharded(mesh8, pool, gram, cin, cout):
    """The single kernels carried onto the mesh via shard_map (2-row
    ppermute input halos, owned-rows Gram + psum, 1-row cotangent halo in
    the backward) must reproduce the unsharded single's outputs AND input
    gradient — including at the minimum per-shard height (h_l = 2 = the
    halo depth)."""
    r = np.random.RandomState(5)
    k = jnp.asarray(
        r.randn(3, 3, cin, cout).astype(np.float32) * (1.5 / np.sqrt(9 * cin))
    )
    b = jnp.asarray(r.randn(cout).astype(np.float32) * 0.1)
    ref = CS.make_conv_single(pool=pool, gram=gram)
    sh = CS.make_sharded_single(mesh8, mesh_mod.SPATIAL_AXIS, pool=pool, gram=gram)

    def loss(f, x):
        o = f(x, k, b)
        if gram:
            y, g = o
            return jnp.sum(y.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    for hw in [(64, 48), (16, 24)]:  # h_l = 8, and the minimum h_l = 2
        x = jnp.asarray(r.rand(1, *hw, cin).astype(np.float32))
        xs = mesh_mod.shard_image(x, mesh8)
        o1 = jax.jit(lambda x: ref(x, k, b))(x)
        o2 = jax.jit(lambda x: sh(x, k, b))(xs)
        if gram:
            np.testing.assert_allclose(np.asarray(o2[0]), np.asarray(o1[0]), atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(o2[1]), np.asarray(o1[1]), rtol=1e-5, atol=1e-6
            )
        else:
            np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)

        v1, d1 = jax.jit(jax.value_and_grad(lambda x: loss(ref, x)))(x)
        v2, d2 = jax.jit(jax.value_and_grad(lambda x: loss(sh, x)))(xs)
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
        scale = float(np.abs(np.asarray(d1)).max())
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(d1), atol=3e-5 * max(scale, 1.0)
        )
        # the input cotangent comes back sharded along H
        heights = {s.data.shape[1] for s in d2.addressable_shards}
        assert heights == {hw[0] // 8}


def test_sharded_pair_of_singles_matches_unsharded_pair(mesh8):
    """The sharded singles composition (the api's wide-shape segment
    implementation) against the unsharded PAIR kernel it replaces —
    values and input gradient through a pool+gram block segment."""
    r = np.random.RandomState(11)
    k1, b1 = _w(r, 64, 128)
    k2, b2 = _w(r, 128, 128)
    ref = CP.make_conv_pair(pool=True, gram=True)
    sh = CS.make_pair_of_singles(
        pool=True, gram=True, mesh=mesh8, axis=mesh_mod.SPATIAL_AXIS
    )

    def loss(f, x):
        y, g = f(x, k1, b1, k2, b2)
        return jnp.sum(y.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    x = jnp.asarray(r.rand(1, 32, 24, 64).astype(np.float32))
    xs = mesh_mod.shard_image(x, mesh8)
    y1, g1 = jax.jit(lambda x: ref(x, k1, b1, k2, b2))(x)
    y2, g2 = jax.jit(lambda x: sh(x, k1, b1, k2, b2))(xs)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)
    v1, d1 = jax.jit(jax.value_and_grad(lambda x: loss(ref, x)))(x)
    v2, d2 = jax.jit(jax.value_and_grad(lambda x: loss(sh, x)))(xs)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(np.abs(np.asarray(d1)).max())
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d1), atol=3e-5 * max(scale, 1.0)
    )


def test_sharded_single_shape_gate(mesh8):
    """Shapes the halo exchange cannot carry are rejected loudly — the
    api dispatch keeps such shapes on the XLA path instead."""
    fn = CS.make_sharded_single(mesh8, mesh_mod.SPATIAL_AXIS, pool=False, gram=False)
    k = jnp.zeros((3, 3, 64, 128))
    b = jnp.zeros((128,))
    with pytest.raises(ValueError, match="sharded conv single"):
        fn(jnp.zeros((1, 24, 16, 64)), k, b)  # h_l = 3: odd
    with pytest.raises(ValueError, match="sharded conv single"):
        fn(jnp.zeros((1, 8, 16, 64)), k, b)  # h_l = 1 < halo


def test_gram_tail_matches_conv_gram_and_oracle():
    """conv_single.gram_tail is the W-chunked replacement for conv_gram
    beyond its envelope (an 8192px run's conv5_1): same Gram, same input
    gradient, zero weight cotangents."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from style_transfer_tpu.models import vgg as V
    from style_transfer_tpu.ops import losses as L
    from style_transfer_tpu.ops.pallas import conv_gram as CG
    from style_transfer_tpu.ops.pallas import conv_single as CS

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1, 12, 16, 32).astype(np.float32) * 0.3)
    k = jnp.asarray(r.randn(3, 3, 32, 64).astype(np.float32) * 0.05)
    b = jnp.asarray(r.randn(64).astype(np.float32) * 0.1)

    def loss(f):
        return lambda x: jnp.sum(f(x, k, b) ** 2)

    def oracle(x, k, b):
        return L.gram_matrix(jax.nn.relu(V._conv(x, k, b)))

    v_t, d_t = jax.value_and_grad(loss(CS.gram_tail))(x)
    v_c, d_c = jax.value_and_grad(loss(CG.conv_gram))(x)
    v_o, d_o = jax.value_and_grad(loss(oracle))(x)
    np.testing.assert_allclose(float(v_t), float(v_o), rtol=1e-5)
    np.testing.assert_allclose(float(v_t), float(v_c), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_o),
                               rtol=1e-4, atol=1e-6)


def test_gram_tail_impl_gate():
    """vmem.gram_tail_impl: conv_gram inside its envelope, the W-chunked
    single beyond it (8192px conv5_1: w=512, eff 4096), XLA past both."""
    from style_transfer_tpu.ops.pallas import vmem as VM

    assert VM.gram_tail_impl(256, 512, tpu=True) == "conv_gram"  # 4096px
    assert VM.gram_tail_impl(512, 512, tpu=True) == "single"     # 8192px
    assert VM.gram_tail_impl(1024, 512, tpu=True) is None        # 16384px
    assert VM.gram_tail_impl(250, 512, tpu=True) is None         # off-grid
    assert VM.gram_tail_impl(250, 512, tpu=False) == "conv_gram" # interpret


# --------------------------------------------------- W-tiled (wide) singles


@pytest.mark.parametrize("pool,gram", [(False, True), (False, False),
                                       (True, False)])
def test_wide_single_matches_oracle(pool, gram):
    """make_wide_single (forced 2 slices) == the XLA oracle — values,
    Gram, and input gradient. The wide path is the eff > 4096 dispatch
    (8192px-scale block shapes); forcing the slice count exercises the
    halo/ownership machinery at test sizes."""
    r = np.random.RandomState(31)
    k, b = _w(r, 64, 128)
    x = jnp.asarray(r.randn(1, 8, 64, 64).astype(np.float32) * 0.3)
    assert _margin_ok(x, [(k, b)]) > 2e-6
    wide = CS.make_wide_single(pool=pool, gram=gram, slices=2)

    def oracle(x):
        y = jax.nn.relu(V._conv(x, k, b))
        if pool:
            y = V._pool(y, "average", None)
        if gram:
            return y, L.gram_matrix(jax.nn.relu(V._conv(x, k, b)))
        return y

    def loss(f):
        def inner(x):
            out = f(x)
            if gram:
                y, g = out
                return jnp.sum(y.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(
                    g.astype(jnp.float32) ** 2
                )
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return inner

    o_ref = oracle(x)
    o_k = jax.jit(lambda x: wide(x, k, b))(x)
    if gram:
        np.testing.assert_allclose(np.asarray(o_k[0]), np.asarray(o_ref[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(o_k[1]), np.asarray(o_ref[1]),
                                   rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_ref),
                                   atol=1e-4)
    v1, g1 = jax.jit(jax.value_and_grad(loss(oracle)))(x)
    v2, g2 = jax.jit(jax.value_and_grad(
        loss(lambda x: wide(x, k, b))
    ))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=2e-5 * max(1.0, scale))


def test_wide_single_uneven_tail():
    """A width that does not divide by the slice count: W=80 over 3
    slices -> owned 32/32/16 with a zero-padded, Gram-masked surplus on
    the tail slice. Values, Gram, and gradient must still match."""
    r = np.random.RandomState(34)  # 33 is a CPU-backend ReLU knife edge
    k, b = _w(r, 32, 64)
    x = jnp.asarray(r.randn(1, 6, 80, 32).astype(np.float32) * 0.3)
    assert _margin_ok(x, [(k, b)]) > 2e-6
    wide = CS.make_wide_single(pool=False, gram=True, slices=3)
    y_ref = jax.nn.relu(V._conv(x, k, b))
    g_ref = L.gram_matrix(y_ref)

    def loss(f):
        def inner(x):
            y, g = f(x)
            return jnp.sum(y.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)
        return inner

    y_k, g_k = jax.jit(lambda x: wide(x, k, b))(x)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
    v1, d1 = jax.jit(jax.value_and_grad(loss(
        lambda x: (jax.nn.relu(V._conv(x, k, b)),
                   L.gram_matrix(jax.nn.relu(V._conv(x, k, b))))
    )))(x)
    v2, d2 = jax.jit(jax.value_and_grad(loss(lambda x: wide(x, k, b))))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(d1)))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               atol=2e-5 * max(1.0, scale))


def test_wide_single_degenerates_unsliced():
    """slices=1 (or a gate-covered shape with slices=None) must be the
    plain single bit-for-bit."""
    r = np.random.RandomState(34)
    k, b = _w(r, 64, 128)
    x = jnp.asarray(r.randn(1, 8, 16, 64).astype(np.float32) * 0.3)
    y1, g1 = CS.make_wide_single(pool=False, gram=True, slices=1)(x, k, b)
    y0, g0 = CS.single_gram(x, k, b)
    assert np.array_equal(np.asarray(y1), np.asarray(y0))
    assert np.array_equal(np.asarray(g1), np.asarray(g0))
    y2, g2 = CS.make_wide_single(pool=False, gram=True)(x, k, b)
    assert np.array_equal(np.asarray(y2), np.asarray(y0))


def test_wide_pair_of_singles_matches_pair():
    """The 'wide' segment arm == the fused pair (values, Gram, input
    gradient) — the dispatch equivalence the 8192px ladder rides."""
    r = np.random.RandomState(38)  # 35-37 are CPU-backend ReLU knife edges
    (k1, b1), (k2, b2) = _w(r, 64, 128), _w(r, 128, 128)
    x = jnp.asarray(r.randn(1, 8, 64, 64).astype(np.float32) * 0.3)
    assert _margin_ok(x, [(k1, b1), (k2, b2)]) > 2e-6
    wide = CS.make_wide_pair_of_singles(pool=True, gram=True, slices=2)

    def loss(f):
        def inner(x):
            out, g = f(x, k1, b1, k2, b2)
            return jnp.sum(out.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(
                g.astype(jnp.float32) ** 2
            )
        return inner

    from style_transfer_tpu.ops.pallas import block2 as B2

    # block2_fused is the pooled+gram pair form (CP.pair_gram is unpooled)
    (o1, gr1) = B2.block2_fused(x, k1, b1, k2, b2)
    (o2, gr2) = jax.jit(lambda x: wide(x, k1, b1, k2, b2))(x)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr2), np.asarray(gr1),
                               rtol=1e-5, atol=1e-5)
    v1, d1 = jax.jit(jax.value_and_grad(loss(B2.block2_fused)))(x)
    v2, d2 = jax.jit(jax.value_and_grad(loss(wide)))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(d1)))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               atol=2e-5 * max(1.0, scale))


def test_sharded_wide_single_matches_unsharded(mesh8):
    """W tiling composes with the H mesh (different axes): the sharded
    wide single == the unsharded wide single == the oracle."""
    r = np.random.RandomState(37)  # 36 is a CPU-backend ReLU knife edge
    k, b = _w(r, 64, 128)
    x = jnp.asarray(r.randn(1, 16, 64, 64).astype(np.float32) * 0.3)
    assert _margin_ok(x, [(k, b)]) > 2e-6
    wide_u = CS.make_wide_single(pool=False, gram=True, slices=2)
    wide_s = CS.make_wide_single(pool=False, gram=True, slices=2,
                                 mesh=mesh8, axis=mesh_mod.SPATIAL_AXIS)

    def loss(f):
        def inner(x):
            y, g = f(x, k, b)
            return jnp.sum(y.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)
        return inner

    yu, gu = jax.jit(lambda x: wide_u(x, k, b))(x)
    ys, gs = jax.jit(lambda x: wide_s(x, k, b))(x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gu),
                               rtol=1e-5, atol=1e-5)
    v1, d1 = jax.jit(jax.value_and_grad(loss(wide_u)))(x)
    v2, d2 = jax.jit(jax.value_and_grad(loss(wide_s)))(x)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(d1)))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               atol=2e-5 * max(1.0, scale))
