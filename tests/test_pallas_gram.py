"""Fused Pallas Gram kernel vs the jnp oracle (SURVEY.md section 7 phase 3).

Off-TPU these run the same kernel in interpreter mode, so the block/grid
logic is exercised on CPU CI too. ``pallas_gram`` is the always-kernel
entry; ``gram_matrix`` is the shape-dispatched production path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.ops.pallas import gram as pgram


def test_gram_matches_oracle_small(rng):
    feat = jnp.asarray(rng.randn(1, 12, 10, 16).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pgram.pallas_gram(feat)),
        np.asarray(L.gram_matrix(feat)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_gram_matches_oracle_nondivisible_rows(rng):
    # M = 17*13 = 221, far from a TILE_M multiple — exercises zero padding
    feat = jnp.asarray(rng.randn(1, 17, 13, 8).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pgram.pallas_gram(feat)),
        np.asarray(L.gram_matrix(feat)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_gram_matches_oracle_multi_tile(rng):
    # M = 40*32 = 1280 > 2*TILE_M — exercises multi-step accumulation
    feat = jnp.asarray(rng.randn(1, 40, 32, 4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pgram.pallas_gram(feat)),
        np.asarray(L.gram_matrix(feat)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_gram_bf16_input_fp32_output(rng):
    feat = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32)).astype(jnp.bfloat16)
    out = pgram.pallas_gram(feat)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(L.gram_matrix(feat)), rtol=2e-2, atol=1e-3
    )


def test_gram_gradient_matches_oracle(rng):
    feat = jnp.asarray(rng.randn(1, 9, 7, 6).astype(np.float32))
    tgt = jnp.asarray(rng.randn(6, 6).astype(np.float32))

    def loss_fused(f):
        return L.style_loss(pgram.pallas_gram(f), tgt)

    def loss_oracle(f):
        return L.style_loss(L.gram_matrix(f), tgt)

    g_fused = jax.grad(loss_fused)(feat)
    g_oracle = jax.grad(loss_oracle)(feat)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_oracle), rtol=1e-4, atol=1e-6)


def test_gram_under_jit(rng):
    feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    jitted = jax.jit(pgram.pallas_gram)
    np.testing.assert_allclose(
        np.asarray(jitted(feat)), np.asarray(L.gram_matrix(feat)), rtol=1e-5, atol=1e-6
    )


def test_gram_dispatch(rng):
    """gram_matrix (dispatch, einsum by default) and pallas_gram (always
    kernel) both match the oracle at kernel-eligible and ineligible widths."""
    f128 = jnp.asarray(rng.randn(1, 9, 9, 128).astype(np.float32))
    f64 = jnp.asarray(rng.randn(1, 9, 9, 64).astype(np.float32))
    for feat in (f128, f64):
        np.testing.assert_allclose(
            np.asarray(pgram.gram_matrix(feat)),
            np.asarray(L.gram_matrix(feat)),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pgram.pallas_gram(feat)),
            np.asarray(L.gram_matrix(feat)),
            rtol=1e-5,
            atol=1e-6,
        )
