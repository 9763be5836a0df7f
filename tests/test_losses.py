"""Unit + property tests for the jnp loss oracle (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.ops import losses as L


def test_gram_matches_numpy_oracle(rng):
    feat = rng.randn(1, 7, 5, 16).astype(np.float32)
    g = np.asarray(L.gram_matrix(jnp.asarray(feat)))
    f = feat.reshape(-1, 16)
    expected = f.T @ f / f.shape[0]
    np.testing.assert_allclose(g, expected, rtol=1e-5, atol=1e-6)


def test_gram_spatial_permutation_invariance(rng):
    feat = rng.randn(1, 6, 6, 8).astype(np.float32)
    g1 = np.asarray(L.gram_matrix(jnp.asarray(feat)))
    flat = feat.reshape(36, 8)
    perm = rng.permutation(36)
    g2 = np.asarray(L.gram_matrix(jnp.asarray(flat[perm].reshape(1, 6, 6, 8))))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_gram_fp32_accumulation_for_bf16():
    feat = jnp.ones((1, 8, 8, 4), jnp.bfloat16)
    g = L.gram_matrix(feat)
    assert g.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g), np.ones((4, 4)), rtol=1e-6)


def test_content_loss_zero_at_target(rng):
    f = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    assert float(L.content_loss(f, f)) == 0.0
    assert float(L.content_loss(f, f + 1.0)) == pytest.approx(1.0, rel=1e-6)


def test_losses_nonnegative(rng):
    a = jnp.asarray(rng.randn(1, 5, 5, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 5, 5, 4).astype(np.float32))
    assert float(L.content_loss(a, b)) >= 0
    assert float(L.style_loss(L.gram_matrix(a), L.gram_matrix(b))) >= 0
    assert float(L.tv_loss(a)) >= 0


def test_tv_gradient_zero_at_constant_image():
    img = jnp.full((1, 9, 7, 3), 0.37, jnp.float32)
    g = jax.grad(L.tv_loss)(img)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)
    assert float(L.tv_loss(img)) == 0.0


def test_blend_grams_normalizes_weights(rng):
    g1 = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    g2 = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    # weights [2, 2] == weights [1, 1] == plain mean
    b = np.asarray(L.blend_grams([g1, g2], [2.0, 2.0]))
    np.testing.assert_allclose(b, np.asarray((g1 + g2) / 2), rtol=1e-6)
    # single style with any weight is identity
    np.testing.assert_allclose(
        np.asarray(L.blend_grams([g1], [123.0])), np.asarray(g1), rtol=1e-6
    )


def test_normalize_layer_weights():
    w = L.normalize_layer_weights(["a", "b"], [3.0, 1.0])
    assert w == {"a": 0.75, "b": 0.25}
    w = L.normalize_layer_weights(["a", "b"])
    assert w == {"a": 0.5, "b": 0.5}
    with pytest.raises(ValueError):
        L.normalize_layer_weights(["a"], [1.0, 2.0])


def test_objective_terms_weighting(rng):
    feat = {"conv1_1": jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))}
    img = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    c_t = {"conv1_1": feat["conv1_1"] + 1.0}
    s_t = {"conv1_1": L.gram_matrix(feat["conv1_1"]) + 2.0}
    terms = L.objective_terms(
        feat,
        content_targets=c_t,
        style_targets=s_t,
        content_layer_weights={"conv1_1": 1.0},
        style_layer_weights={"conv1_1": 1.0},
        image=img,
        content_weight=2.0,
        style_weight=3.0,
        tv_weight=5.0,
    )
    expected = 2.0 * terms["content"] + 3.0 * terms["style"] + 5.0 * terms["tv"]
    np.testing.assert_allclose(float(terms["loss"]), float(expected), rtol=1e-6)
    np.testing.assert_allclose(float(terms["content"]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(terms["style"]), 4.0, rtol=1e-5)


def test_gram_chunked_matches_unchunked(rng, monkeypatch):
    """Above losses.FLAT_PAD_LIMIT the Gram splits its contraction into
    H-chunks (the XLA:TPU flat-operand compile ceiling, round 5 — see the
    gram_matrix docstring); the chunked form must be numerically identical
    in value AND gradient, including a non-divisible H (uneven last chunk)."""
    feat = jnp.asarray(rng.randn(2, 13, 7, 5).astype(np.float32))
    ref = L.gram_matrix(feat)
    ref_g = jax.grad(lambda f: L.gram_matrix(f).sum())(feat)
    # Force chunking: per-chunk padded budget of 3 rows' worth of lanes.
    monkeypatch.setattr(L, "FLAT_PAD_LIMIT", 7 * 128 * 2 * 3)
    chunked = L.gram_matrix(feat)
    chunked_g = jax.grad(lambda f: L.gram_matrix(f).sum())(feat)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(chunked_g), np.asarray(ref_g),
                               rtol=2e-6, atol=1e-6)


def test_gram_chunk_count_caps_at_rows(monkeypatch):
    """A single row wider than the limit must not hang the chunk search
    (k caps at H and the widest chunk is one row)."""
    monkeypatch.setattr(L, "FLAT_PAD_LIMIT", 1)
    feat = jnp.ones((1, 3, 4, 2), jnp.float32)
    g = L.gram_matrix(feat)
    np.testing.assert_allclose(
        np.asarray(g), np.full((2, 2), 1.0), rtol=1e-6
    )
