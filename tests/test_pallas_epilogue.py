"""Fused objective-epilogue kernels vs the fp32 oracle (values AND grads).

Each kernel in ``ops/pallas/epilogue.py`` produces its loss term and the
top-gradient in one pass; here both are checked against ``ops/losses.py``
through ``jax.grad`` (interpreter mode off-TPU), including the composed
whole-objective path and the property tests the oracle carries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import epilogue as E


def _rand(shape, seed, dtype=jnp.float32):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.randn(*shape).astype(np.float32)).astype(dtype)


@pytest.mark.parametrize("shape,dtype", [
    ((1, 13, 11, 64), jnp.float32),
    ((1, 16, 16, 128), jnp.bfloat16),
    ((1, 7, 9, 256), jnp.float32),
])
def test_content_matches_oracle(shape, dtype):
    f = _rand(shape, 0, dtype)
    t = _rand(shape, 1, dtype)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5

    got = E.content_loss(f, t)
    want = L.content_loss(f, t)
    np.testing.assert_allclose(got, want, rtol=tol)

    g_got = jax.grad(lambda x: E.content_loss(x, t))(f)
    g_want = jax.grad(lambda x: L.content_loss(x, t))(f)
    np.testing.assert_allclose(
        np.asarray(g_got, np.float32), np.asarray(g_want, np.float32),
        rtol=tol, atol=tol * 1e-2,
    )


@pytest.mark.parametrize("c", [64, 128, 512])
def test_style_matches_oracle(c):
    g = _rand((c, c), 2)
    t = _rand((c, c), 3)
    np.testing.assert_allclose(E.style_loss(g, t), L.style_loss(g, t), rtol=1e-5)
    gg = jax.grad(lambda x: E.style_loss(x, t))(g)
    gw = jax.grad(lambda x: L.style_loss(x, t))(g)
    np.testing.assert_allclose(gg, gw, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("hw", [(8, 8), (13, 11), (64, 48), (33, 7)])
def test_tv_matches_oracle(hw):
    h, w = hw
    x = _rand((1, h, w, 3), 4)
    np.testing.assert_allclose(E.tv_loss(x), L.tv_loss(x), rtol=1e-5)
    gg = jax.grad(E.tv_loss)(x)
    gw = jax.grad(L.tv_loss)(x)
    np.testing.assert_allclose(gg, gw, rtol=1e-4, atol=1e-7)


def test_tv_gradient_zero_at_constant():
    x = jnp.full((1, 16, 16, 3), 0.37, jnp.float32)
    assert float(E.tv_loss(x)) == 0.0
    g = jax.grad(E.tv_loss)(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_tv_multirow_tiling():
    """Force multiple grid tiles (rows < H) so halo rows are exercised."""
    import style_transfer_tpu.ops.pallas.epilogue as ep
    old = ep._TILE_BYTES
    ep._TILE_BYTES = 8 * 48 * 3 * 4  # 8 rows per tile at W=48
    try:
        x = _rand((1, 40, 48, 3), 5)
        np.testing.assert_allclose(ep.tv_loss(x), L.tv_loss(x), rtol=1e-5)
        gg = jax.grad(ep.tv_loss)(x)
        gw = jax.grad(L.tv_loss)(x)
        np.testing.assert_allclose(gg, gw, rtol=1e-4, atol=1e-7)
    finally:
        ep._TILE_BYTES = old


def test_composed_objective_matches_oracle():
    """Full objective (content + style + TV) with the fused epilogue equals
    the oracle objective, value and image-gradient."""
    f = _rand((1, 12, 10, 64), 6, jnp.bfloat16)
    img = jnp.asarray(np.random.RandomState(7).rand(1, 24, 20, 3), jnp.float32)
    t_feat = _rand((1, 12, 10, 64), 8, jnp.bfloat16)
    t_gram = _rand((64, 64), 9)

    def obj(image, feat, fused):
        C = E.content_loss if fused else L.content_loss
        S = E.style_loss if fused else L.style_loss
        T = E.tv_loss if fused else L.tv_loss
        g = L.gram_matrix(feat)
        return C(feat, t_feat) + 256.0 * S(g, t_gram) + 2.0 * T(image)

    v_f = obj(img, f, True)
    v_o = obj(img, f, False)
    np.testing.assert_allclose(v_f, v_o, rtol=2e-2)

    gi_f, gf_f = jax.grad(obj, argnums=(0, 1))(img, f, True)
    gi_o, gf_o = jax.grad(obj, argnums=(0, 1))(img, f, False)
    np.testing.assert_allclose(gi_f, gi_o, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(gf_f, np.float32), np.asarray(gf_o, np.float32),
        rtol=2e-2, atol=1e-4,
    )


def test_tv_dispatch_alignment_gate(monkeypatch):
    """api._loss_fns routes the fused TV kernel only for 128-aligned
    flattened widths (W*C); unaligned shapes fall back to the oracle
    (the Mosaic toolchain was only hardware-validated on aligned lanes)."""
    import jax as jax_mod

    from style_transfer_tpu import api
    from style_transfer_tpu.ops.pallas import epilogue as ep_mod

    st = api.StyleTransfer()
    monkeypatch.setattr(api.jax, "default_backend", lambda: "tpu")
    fns = st._loss_fns(api.StylizeConfig(use_fused=True))
    tv = fns["tv_loss_fn"]
    monkeypatch.setattr(ep_mod, "tv_loss", lambda img: "fused")
    monkeypatch.setattr(api.L, "tv_loss", lambda img: "oracle")
    aligned = jnp.zeros((1, 8, 128, 3))  # W*C = 384, 128-aligned
    unaligned = jnp.zeros((1, 8, 100, 3))  # W*C = 300
    assert tv(aligned) == "fused"
    assert tv(unaligned) == "oracle"
    # unfused config exposes no override at all
    assert st._loss_fns(api.StylizeConfig(use_fused=False)) == {}
