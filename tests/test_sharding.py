"""Spatial-sharding tests on the forced 8-device CPU mesh (SURVEY.md section 4):
the sharded objective/optimization must equal the single-device one.

This is the TPU build's replacement for the reference's multi-process
layer-split parallelism (SURVEY.md section 2 rows 10-11): image and
activations sharded along H over a 1-D mesh, weights replicated, XLA SPMD
inserting conv halo exchanges and Gram/gradient psums.
"""

import jax
import numpy as np
import pytest

from style_transfer_tpu.api import StyleTransfer, StylizeConfig
from style_transfer_tpu.optim import OptimizerSpec
from style_transfer_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 fake CPU devices"
    return mesh_mod.make_mesh()


@pytest.fixture(scope="module")
def images():
    r = np.random.RandomState(7)
    # H=64 divides 8 exactly; W=48 arbitrary
    return r.rand(64, 48, 3).astype(np.float32), r.rand(48, 64, 3).astype(np.float32)


def _cfg(**kw):
    base = dict(
        size=64,
        min_scale=64,
        iterations=(4,),
        chunk_size=2,
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1"),
        use_fused=False,
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
    )
    base.update(kw)
    return StylizeConfig(**base)


def test_mesh_helpers(mesh8):
    assert mesh8.devices.shape == (8,)
    spec = mesh_mod.image_spec()
    assert spec == jax.sharding.PartitionSpec(None, "space", None, None)
    img = np.zeros((1, 64, 48, 3), np.float32)
    sharded = mesh_mod.shard_image(img, mesh8)
    # each device holds an H-slice of 8 rows
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(1, 8, 48, 3)}
    rep = mesh_mod.replicate({"g": np.ones((4, 4), np.float32)}, mesh8)
    assert rep["g"].sharding.is_fully_replicated


def test_make_mesh_subsets(mesh8):
    m2 = mesh_mod.make_mesh(2)
    assert m2.devices.shape == (2,)
    with pytest.raises(ValueError, match="devices"):
        mesh_mod.make_mesh(99)


def test_sharded_equals_unsharded_stylization(mesh8, images):
    """The graded exactness property (SURVEY.md section 7 phase 4): identical
    losses and final image, sharded vs single device."""
    content, style = images
    cfg = _cfg()

    ev_single, ev_shard = [], []
    out_single = StyleTransfer().stylize(content, style, cfg, callback=ev_single.append)
    out_shard = StyleTransfer(mesh=mesh8).stylize(
        content, style, cfg, callback=ev_shard.append
    )

    loss_single = np.concatenate([e.losses["loss"] for e in ev_single])
    loss_shard = np.concatenate([e.losses["loss"] for e in ev_shard])
    # Loss trajectories must track tightly. The final images are compared
    # loosely on purpose: the partitioned program reassociates fp32 pooling
    # reductions (~1e-6 forward drift), and Adam's sign-like update amplifies
    # that to O(lr) on near-zero-gradient pixels within a few iterations.
    # The meaningful exactness property (sharded objective/gradient equals
    # unsharded per evaluation) is asserted in test_sharded_gradient_exact.
    np.testing.assert_allclose(loss_shard, loss_single, rtol=3e-4)
    diff = np.abs(out_shard - out_single)
    assert float(np.mean(diff)) < 1e-3, f"mean image drift {np.mean(diff):.2e}"
    assert float(diff.max()) < 0.05, f"max image drift {diff.max():.2e}"


@pytest.mark.parametrize("pooling", ["average", "max"])
def test_sharded_gradient_exact(mesh8, images, pooling):
    """Single-evaluation SPMD exactness: the sharded objective value and
    image gradient equal the unsharded ones to float tolerance — including
    through all 5 pool stages at extents far below the mesh size, which
    regression-guards the XLA SPMD conv+reshape-pool backward miscompile
    that `_pool`'s slice fallback works around (models/vgg.py). Max pooling
    has its own backward lowering, so both modes are covered."""
    import jax.numpy as jnp

    from style_transfer_tpu.models import vgg as vgg_mod
    from style_transfer_tpu.models.weights import random_fixture
    from style_transfer_tpu.ops import losses as L

    params, mean, std = random_fixture(0)
    layers = ("conv1_1", "conv3_1", "conv5_1")

    def make_obj(msh):
        div = msh.devices.size if msh is not None else None

        def obj(p, x):
            x = mesh_mod.constrain_spatial(x, msh)
            feats = vgg_mod.extract_features(
                p, x, layers, pooling=pooling, shard_divisor=div
            )
            return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in feats.values())

        return jax.jit(jax.value_and_grad(obj, argnums=1))

    r = np.random.RandomState(3)
    for hw in [(64, 48), (32, 24)]:
        x = r.rand(1, *hw, 3).astype(np.float32)
        v1, g1 = make_obj(None)(params, x)
        xs = mesh_mod.shard_image(jnp.asarray(x), mesh8)
        v2, g2 = make_obj(mesh8)(params, xs)
        # fp32 reassociation allows ~4e-6 relative drift; the guarded
        # miscompile produced relative errors of O(1).
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
        scale = np.abs(np.asarray(g1)).max()
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g1), atol=2e-5 * max(scale, 1.0)
        )


def test_sharded_multiscale_deep_layers(mesh8, images):
    """Multi-scale + conv5_1 (5 pool stages) over the mesh: exercises uneven
    per-device extents after repeated halving."""
    content, style = images
    cfg = _cfg(
        size=64,
        min_scale=32,
        iterations=(2, 2),
        style_layers=("conv1_1", "conv3_1", "conv5_1"),
    )
    out = StyleTransfer(mesh=mesh8).stylize(content, style, cfg)
    assert np.isfinite(out).all()

    out_single = StyleTransfer().stylize(content, style, cfg)
    np.testing.assert_allclose(out, out_single, atol=5e-5)


def test_sharded_lbfgs(mesh8, images):
    content, style = images
    cfg = _cfg(optimizer=OptimizerSpec("lbfgs", memory_size=4), iterations=(3,))
    out = StyleTransfer(mesh=mesh8).stylize(content, style, cfg)
    out_single = StyleTransfer().stylize(content, style, cfg)
    np.testing.assert_allclose(out, out_single, atol=1e-4)


def test_sharded_gradient_exact_with_remat(mesh8, images):
    """Blockwise remat changes the backward structure; verify the sharded
    gradient still equals the unsharded one (guards remat x SPMD interplay
    on top of the reshape-pool miscompile workaround)."""
    import jax.numpy as jnp

    from style_transfer_tpu.models import vgg as vgg_mod
    from style_transfer_tpu.models.weights import random_fixture

    params, mean, std = random_fixture(0)
    layers = ("conv1_1", "conv3_1", "conv5_1")

    def make_obj(msh):
        div = msh.devices.size if msh is not None else None

        def obj(p, x):
            x = mesh_mod.constrain_spatial(x, msh)
            feats = vgg_mod.extract_features(
                p, x, layers, pooling="average", shard_divisor=div, remat=True
            )
            return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in feats.values())

        return jax.jit(jax.value_and_grad(obj, argnums=1))

    r = np.random.RandomState(4)
    x = r.rand(1, 32, 24, 3).astype(np.float32)
    v1, g1 = make_obj(None)(params, x)
    xs = mesh_mod.shard_image(jnp.asarray(x), mesh8)
    v2, g2 = make_obj(mesh8)(params, xs)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = np.abs(np.asarray(g1)).max()
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(g1), atol=2e-5 * max(scale, 1.0)
    )


def test_sharded_gradient_exact_submesh(mesh8, images):
    """A 2-device submesh (not the full 8) must also match unsharded — the
    shard_divisor plumbing has to follow the actual mesh size."""
    import jax.numpy as jnp

    from style_transfer_tpu.models import vgg as vgg_mod
    from style_transfer_tpu.models.weights import random_fixture

    params, mean, std = random_fixture(0)
    mesh2 = mesh_mod.make_mesh(2)
    layers = ("conv1_1", "conv3_1", "conv5_1")

    def make_obj(msh):
        div = msh.devices.size if msh is not None else None

        def obj(p, x):
            x = mesh_mod.constrain_spatial(x, msh)
            feats = vgg_mod.extract_features(
                p, x, layers, pooling="average", shard_divisor=div
            )
            return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in feats.values())

        return jax.jit(jax.value_and_grad(obj, argnums=1))

    r = np.random.RandomState(5)
    x = r.rand(1, 32, 24, 3).astype(np.float32)
    v1, g1 = make_obj(None)(params, x)
    xs = jax.device_put(
        jnp.asarray(x), jax.NamedSharding(mesh2, mesh_mod.image_spec())
    )
    v2, g2 = make_obj(mesh2)(params, xs)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = np.abs(np.asarray(g1)).max()
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(g1), atol=2e-5 * max(scale, 1.0)
    )


def test_sharded_fused_tv_matches_oracle(mesh8):
    """The shard_map-wrapped Pallas TV kernel (round-2 verdict item 2):
    value AND gradient must match the unsharded oracle on the 8-device mesh
    (per-device kernel, one-row ppermute halos, psum'd loss)."""
    import jax.numpy as jnp

    from style_transfer_tpu.ops import losses as L
    from style_transfer_tpu.ops.pallas import epilogue as E

    r = np.random.RandomState(3)
    img = jnp.asarray(r.rand(1, 64, 48, 3).astype(np.float32))
    img_sh = mesh_mod.shard_image(img, mesh8)
    tv_sharded = E.make_sharded_tv_loss(mesh8, mesh_mod.SPATIAL_AXIS)

    val = jax.jit(tv_sharded)(img_sh)
    ref = L.tv_loss(img)
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-6)

    g = jax.jit(jax.grad(lambda im: 3.5 * tv_sharded(im)))(img_sh)
    g_ref = jax.grad(lambda im: 3.5 * L.tv_loss(im))(img)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-7)
    # the gradient comes back sharded along H
    heights = {s.data.shape[1] for s in g.addressable_shards}
    assert heights == {8}


def test_sharded_fused_tv_end_to_end_dispatch(mesh8, images, monkeypatch):
    """use_fused no longer silently no-ops under a mesh: with the backend
    reported as TPU (kernels forced to interpreter mode on CPU), a sharded
    stylize routes TV through the shard_map kernel and reproduces the
    oracle run."""
    from style_transfer_tpu import api
    from style_transfer_tpu.ops.pallas import epilogue as E

    import jax.numpy as jnp

    content, style = images
    st = StyleTransfer(mesh=mesh8)
    # W=128 so the flattened lane width (W*C=384) passes the 128-alignment
    # gate and the shard_map kernel actually carries the TV term.
    # packed_block1 pinned off: this test fakes the TPU backend to exercise
    # the TV dispatch alone, and must not also drag the sharded packed
    # block-1 kernel in (it has its own end-to-end dispatch test).
    cfg_kw = dict(size=(64, 128), iterations=(3,), tv_weight=5.0, packed_block1=False)
    out_oracle = st.stylize(content, style, _cfg(use_fused=False, **cfg_kw))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(E, "_interpret", lambda: True)
    calls = []
    real_make = E.make_sharded_tv_loss

    def spy(mesh, axis):
        calls.append(axis)
        return real_make(mesh, axis)

    monkeypatch.setattr(E, "make_sharded_tv_loss", spy)
    # compute_dtype pinned: the fake "tpu" backend would otherwise flip the
    # new instance to bfloat16 and the comparison would measure dtype, not
    # the TV dispatch.
    st2 = StyleTransfer(mesh=mesh8, compute_dtype=jnp.float32)
    out_fused = st2.stylize(content, style, _cfg(use_fused=True, **cfg_kw))
    assert calls, "sharded fused dispatch did not build the shard_map TV kernel"
    # fp reassociation (psum ordering) shifts the TV term by ~1 ulp, which
    # three Adam steps amplify slightly; the direct-kernel test above checks
    # value/grad at tight tolerance.
    np.testing.assert_allclose(out_fused, out_oracle, rtol=1e-3, atol=5e-4)


def test_sharded_packed_block1_matches_unsharded(mesh8):
    """Round-3: the W-pair-packed fused block-1 kernel carried onto the
    mesh via shard_map (4-row ppermute image halos, per-shard-rows Gram +
    psum, one-pooled-row halo in the backward) must reproduce the
    unsharded kernel's pool1/Gram values AND image gradient — including at
    the minimum per-shard height (h_l = 4 = the halo depth)."""
    import jax.numpy as jnp

    from style_transfer_tpu.ops.pallas import block1_packed as B1P

    r = np.random.RandomState(11)
    k1 = jnp.asarray(r.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b1 = jnp.asarray(r.randn(64).astype(np.float32) * 0.1)
    k2 = jnp.asarray(r.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(r.randn(64).astype(np.float32) * 0.1)
    fn = B1P.make_sharded_block1(mesh8, mesh_mod.SPATIAL_AXIS)

    def loss(f, x):
        p, g = f(x, k1, b1, k2, b2)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    for hw in [(64, 48), (32, 24)]:  # h_l = 8, and the minimum h_l = 4
        x = jnp.asarray(r.rand(1, *hw, 3).astype(np.float32))
        xs = mesh_mod.shard_image(x, mesh8)
        p_ref, g_ref = jax.jit(
            lambda x: B1P.block1_packed(x, k1, b1, k2, b2)
        )(x)
        p_sh, g_sh = jax.jit(lambda x: fn(x, k1, b1, k2, b2))(xs)
        np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=3e-6)
        np.testing.assert_allclose(
            np.asarray(g_sh), np.asarray(g_ref), rtol=1e-5, atol=1e-6
        )

        v1, d1 = jax.jit(jax.value_and_grad(lambda x: loss(B1P.block1_packed, x)))(x)
        v2, d2 = jax.jit(jax.value_and_grad(lambda x: loss(fn, x)))(xs)
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
        scale = float(np.abs(np.asarray(d1)).max())
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(d1), atol=2e-5 * max(scale, 1.0)
        )
        # the image cotangent comes back sharded along H
        heights = {s.data.shape[1] for s in d2.addressable_shards}
        assert heights == {hw[0] // 8}


def test_sharded_packed_block1_shape_gate(mesh8):
    """Shapes the halo exchange cannot carry (per-shard rows odd or below
    the 4-row halo) are rejected loudly — the API's dispatch gate keeps
    such shapes on the XLA path instead."""
    import jax.numpy as jnp

    from style_transfer_tpu.ops.pallas import block1_packed as B1P

    fn = B1P.make_sharded_block1(mesh8, mesh_mod.SPATIAL_AXIS)
    k1 = jnp.zeros((3, 3, 3, 64))
    b1 = jnp.zeros((64,))
    k2 = jnp.zeros((3, 3, 64, 64))
    b2 = jnp.zeros((64,))
    with pytest.raises(ValueError, match="sharded block1_packed"):
        fn(jnp.zeros((1, 24, 16, 3)), k1, b1, k2, b2)  # h_l = 3: odd
    with pytest.raises(ValueError, match="sharded block1_packed"):
        fn(jnp.zeros((1, 16, 16, 3)), k1, b1, k2, b2)  # h_l = 2 < halo


def test_sharded_packed_block1_end_to_end_dispatch(mesh8, images, monkeypatch):
    """A sharded stylize with the packed kernel forced on (packed_block1 =
    True overrides the TPU-backend gate; interpret mode engages on CPU
    automatically) routes block 1 through the shard_map wrapper and
    reproduces the oracle run."""
    from style_transfer_tpu.ops.pallas import block1_packed as B1P

    content, style = images
    cfg_kw = dict(size=64, iterations=(3,))
    st = StyleTransfer(mesh=mesh8)
    out_oracle = st.stylize(content, style, _cfg(use_fused=False, **cfg_kw))

    calls = []
    real_make = B1P.make_sharded_block1

    def spy(mesh, axis):
        calls.append(axis)
        return real_make(mesh, axis)

    monkeypatch.setattr(B1P, "make_sharded_block1", spy)
    st2 = StyleTransfer(mesh=mesh8)
    out_fused = st2.stylize(
        content, style, _cfg(use_fused=True, packed_block1=True, **cfg_kw)
    )
    assert calls, "sharded packed block-1 dispatch did not build the wrapper"
    # accumulation-order drift (kernel fp32 Gram, psum ordering) amplified
    # by three Adam steps; the direct-kernel test holds tight tolerance.
    np.testing.assert_allclose(out_fused, out_oracle, rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize(
    "pool,gram,cin,cmid",
    [(True, True, 64, 128), (False, True, 128, 256), (True, False, 256, 256)],
    ids=["block2", "pair_gram", "pair_pool"],
)
def test_sharded_conv_pair_matches_unsharded(mesh8, pool, gram, cin, cmid):
    """Round-3: the generalized fused conv-pair kernels carried onto the
    mesh via shard_map (4-row ppermute input halos, owned-rows Gram +
    psum, 1-pooled-row / 2-row cotangent halo in the backward) must
    reproduce the unsharded pair's outputs AND input gradient — including
    at the minimum per-shard height (h_l = 4 = the halo depth)."""
    import jax.numpy as jnp

    from style_transfer_tpu.ops.pallas import conv_pair as CP

    r = np.random.RandomState(5)
    k1 = jnp.asarray(r.randn(3, 3, cin, cmid).astype(np.float32) * (1.5 / np.sqrt(9 * cin)))
    b1 = jnp.asarray(r.randn(cmid).astype(np.float32) * 0.1)
    k2 = jnp.asarray(r.randn(3, 3, cmid, cmid).astype(np.float32) * (1.5 / np.sqrt(9 * cmid)))
    b2 = jnp.asarray(r.randn(cmid).astype(np.float32) * 0.1)
    ref_pair = CP.make_conv_pair(pool=pool, gram=gram)
    sh_pair = CP.make_sharded_pair(mesh8, mesh_mod.SPATIAL_AXIS, pool=pool, gram=gram)

    def loss(f, x):
        o = f(x, k1, b1, k2, b2)
        if gram:
            p, g = o
            return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    for hw in [(64, 48), (32, 24)]:  # h_l = 8, and the minimum h_l = 4
        x = jnp.asarray(r.rand(1, *hw, cin).astype(np.float32))
        xs = mesh_mod.shard_image(x, mesh8)
        o1 = jax.jit(lambda x: ref_pair(x, k1, b1, k2, b2))(x)
        o2 = jax.jit(lambda x: sh_pair(x, k1, b1, k2, b2))(xs)
        if gram:
            np.testing.assert_allclose(np.asarray(o2[0]), np.asarray(o1[0]), atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(o2[1]), np.asarray(o1[1]), rtol=1e-5, atol=1e-6
            )
        else:
            np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=2e-5)

        v1, d1 = jax.jit(jax.value_and_grad(lambda x: loss(ref_pair, x)))(x)
        v2, d2 = jax.jit(jax.value_and_grad(lambda x: loss(sh_pair, x)))(xs)
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
        scale = float(np.abs(np.asarray(d1)).max())
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(d1), atol=3e-5 * max(scale, 1.0)
        )
        # the input cotangent comes back sharded along H
        heights = {s.data.shape[1] for s in d2.addressable_shards}
        assert heights == {hw[0] // 8}


def test_sharded_conv_pair_shape_gate(mesh8):
    """Shapes the halo exchange cannot carry (per-shard rows odd or below
    the 4-row halo) are rejected loudly — the API's dispatch gate keeps
    such shapes on the XLA path instead."""
    import jax.numpy as jnp

    from style_transfer_tpu.ops.pallas import conv_pair as CP

    fn = CP.make_sharded_pair(mesh8, mesh_mod.SPATIAL_AXIS, pool=True, gram=True)
    k1 = jnp.zeros((3, 3, 64, 128))
    b1 = jnp.zeros((128,))
    k2 = jnp.zeros((3, 3, 128, 128))
    b2 = jnp.zeros((128,))
    with pytest.raises(ValueError, match="sharded conv pair"):
        fn(jnp.zeros((1, 24, 16, 64)), k1, b1, k2, b2)  # h_l = 3: odd
    with pytest.raises(ValueError, match="sharded conv pair"):
        fn(jnp.zeros((1, 16, 16, 64)), k1, b1, k2, b2)  # h_l = 2 < halo


def test_sharded_packed_chain_end_to_end_dispatch(mesh8, images, monkeypatch):
    """A sharded stylize with the whole fused front end forced on routes
    blocks 1-3 through their shard_map wrappers (size 256 keeps pool2's
    per-shard rows even and >= the halo at every level) and reproduces the
    oracle run."""
    from style_transfer_tpu.ops.pallas import conv_pair as CP

    content, style = images
    cfg_kw = dict(
        size=(256, 64), min_scale=256, iterations=(2,),
        packed_block1=True, packed_block2=True, packed_block3=True,
    )
    st = StyleTransfer(mesh=mesh8)
    out_oracle = st.stylize(content, style, _cfg(use_fused=False, **cfg_kw))

    made = []
    real_make = CP.make_sharded_pair

    def spy(mesh, axis, *, pool, gram):
        made.append((pool, gram))
        return real_make(mesh, axis, pool=pool, gram=gram)

    monkeypatch.setattr(CP, "make_sharded_pair", spy)
    st2 = StyleTransfer(mesh=mesh8)
    out_fused = st2.stylize(content, style, _cfg(use_fused=True, **cfg_kw))
    # block 2 (pool+gram), block-3 front (gram), block-3 tail (pool)
    assert set(made) == {(True, True), (False, True), (True, False)}
    # accumulation-order drift (kernel fp32 Grams, psum ordering) amplified
    # by the Adam steps, plus the ReLU knife-edge: a 1-ulp pre-activation
    # difference can flip a mask bit for ~1 in 100k elements (ARCHITECTURE
    # .md), so a handful of isolated pixels may drift by O(lr) — bound the
    # bulk tightly and the outliers loosely.
    diff = np.abs(out_fused - out_oracle)
    assert float(np.mean(diff)) < 1e-5, f"mean drift {np.mean(diff):.2e}"
    assert (diff > 5e-4).mean() < 1e-4, f"outlier fraction {(diff > 5e-4).mean():.2e}"
    assert float(diff.max()) < 0.02, f"max drift {diff.max():.2e}"


def test_sharded_packed_chain_block4_end_to_end_dispatch(mesh8, images, monkeypatch):
    """The full chain through block 4 on the mesh: size 256 keeps pool3's
    per-shard rows (32/8 = 4) at the halo minimum, so both block-4 pairs
    ride their shard_map wrappers and conv5_1 resumes in XLA at
    start_block=5. Reproduces the oracle run."""
    from style_transfer_tpu.ops.pallas import conv_pair as CP

    content, style = images
    # small lr: Adam's update magnitude is ~lr regardless of gradient
    # scale, so any sign flip at a near-zero-gradient pixel (psum ordering
    # noise on random-noise test images) drifts by ~2*lr*iters — shrinking
    # lr shrinks the amplifier without weakening the equivalence check
    cfg_kw = dict(
        size=(256, 64), min_scale=256, iterations=(2,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
        packed_block1=True, packed_block2=True, packed_block3=True,
        packed_block4=True,
        optimizer=OptimizerSpec("adam", learning_rate=0.002),
    )
    # Baseline: the UNSHARDED fused run — this test isolates the sharding
    # (halo exchange, psum Gram, global-row masks); fused-vs-oracle parity
    # for the block-4 chain lives in test_api (unsharded, where Adam does
    # not additionally amplify the kernel-vs-oracle content-activation
    # residue across 256x64 pixels).
    st = StyleTransfer()
    out_unsharded = st.stylize(content, style, _cfg(use_fused=True, **cfg_kw))

    made = []
    real_make = CP.make_sharded_pair

    def spy(mesh, axis, *, pool, gram):
        made.append((pool, gram))
        return real_make(mesh, axis, pool=pool, gram=gram)

    monkeypatch.setattr(CP, "make_sharded_pair", spy)
    st2 = StyleTransfer(mesh=mesh8)
    out_fused = st2.stylize(content, style, _cfg(use_fused=True, **cfg_kw))
    # block 2 (pool+gram), front pairs (gram) for blocks 3+4, tail pairs
    # (pool) for blocks 3+4 — the wrapper factory is built once per kind
    assert set(made) == {(True, True), (False, True), (True, False)}
    diff = np.abs(out_fused - out_unsharded)
    # residual drift = psum accumulation ordering, Adam-amplified at
    # isolated pixels up to the ~2*lr*iters sign-flip ceiling (0.008 here)
    assert float(np.mean(diff)) < 1e-5, f"mean drift {np.mean(diff):.2e}"
    assert (diff > 5e-4).mean() < 1e-2, f"outlier fraction {(diff > 5e-4).mean():.2e}"
    assert float(diff.max()) < 0.01, f"max drift {diff.max():.2e}"


def test_sharded_pair_w_chunked_matches_unsharded(mesh8, monkeypatch):
    """shard_map + W-chunked tap sums compose: with the chunk count forced
    to 2 (the 4096px-scale regime), the sharded pair must still match the
    unsharded pair — and the unsharded chunked pair is bit-identical to
    its unchunked self, so this pins the whole composition."""
    import jax.numpy as jnp

    from style_transfer_tpu.ops.pallas import conv_pair as CP

    monkeypatch.setattr(CP, "_w_chunks", lambda w, c: 2)
    r = np.random.RandomState(7)
    cin = cmid = 64
    k1 = jnp.asarray(r.randn(3, 3, cin, cmid).astype(np.float32) * 0.06)
    b1 = jnp.asarray(r.randn(cmid).astype(np.float32) * 0.1)
    k2 = jnp.asarray(r.randn(3, 3, cmid, cmid).astype(np.float32) * 0.06)
    b2 = jnp.asarray(r.randn(cmid).astype(np.float32) * 0.1)
    ref_pair = CP.make_conv_pair(pool=True, gram=True)
    sh_pair = CP.make_sharded_pair(
        mesh8, mesh_mod.SPATIAL_AXIS, pool=True, gram=True
    )

    def loss(f, x):
        p, g = f(x, k1, b1, k2, b2)
        return jnp.sum(p.astype(jnp.float32) ** 2) + 10.0 * jnp.sum(g**2)

    x = jnp.asarray(r.rand(1, 32, 16, cin).astype(np.float32))
    xs = mesh_mod.shard_image(x, mesh8)
    v1, d1 = jax.jit(jax.value_and_grad(lambda x: loss(ref_pair, x)))(x)
    v2, d2 = jax.jit(jax.value_and_grad(lambda x: loss(sh_pair, x)))(xs)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    scale = float(np.abs(np.asarray(d1)).max())
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d1), atol=3e-5 * max(scale, 1.0)
    )
