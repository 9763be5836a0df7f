"""Objective math: Gram matrices, content/style losses, TV regularizer.

Plain-jnp implementations — this module is the permanent numerical oracle that
the fused Pallas kernels (``style_transfer_tpu.ops.pallas``) are unit-checked
against (SURVEY.md section 7 phase 1 step 3). Everything accumulates in
float32 regardless of the activation compute dtype.

Normalization conventions (fixed, documented, and scale-invariant so loss
weights keep their meaning across the multi-scale pyramid):

- Gram: ``G = F^T F / (H*W)`` with ``F`` the (H*W, C) feature matrix — entries
  are channel co-activations, independent of resolution.
- style layer loss: ``mean((G - G_target)^2)`` over the (C, C) entries.
- content layer loss: ``mean((F - F_target)^2)`` over all elements.
- TV: mean squared forward difference (isotropic L2 total variation).

The reference computes the same family of quantities on Caffe blobs with
NumPy on the host (SURVEY.md section 2 rows 6/7/9, reconstructed).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp


#: XLA:TPU compile ceiling for one flattened 2-D (S, C) operand: its
#: lane-padded element count S * max(C, 128) must stay <= 2**31, or the
#: compiler crashes before buffer assignment. Empirically bisected on v5e
#: (round 5): style capture at 4096px — conv1_1's (16.78M, 64) flat operand,
#: 16.78M * 128 = 2**31 EXACTLY — compiles and is driver-validated, while
#: 5632px (31.7M * 128 = 1.89 * 2**31) crashes the compile helper, with the
#: Pallas tier force-disabled too (the same program's 4-D NHWC conv
#: activations compile fine at those sizes, so the limit is specific to the
#: flat form). :func:`gram_matrix` chunks its contraction below this bound.
FLAT_PAD_LIMIT = 2 ** 31


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) activations -> (C, C) float32 Gram, normalized by H*W*N.

    The contraction lowers to a single MXU dot with the (huge) flattened
    spatial axis as the contracting dimension; ``preferred_element_type``
    forces fp32 accumulation even for bfloat16 activations.

    Lowering note (measured on v5e, 2026-08): expressing this as one einsum
    over the unflattened activations (``nhwc,nhwd->cd``) — or even as a 2-D
    self-dot ``sc,sd->cd`` — makes XLA:TPU rewrite the syrk-style
    self-contraction into a *windowed convolution* (window = H, and
    pad=H-1 reversed for its transpose), whose layout preferences force
    ~3.7 GB of relayout copies per 1024px optimizer step (~31% of step
    time, the round-1 profile's single largest cost). Flattening to (S, C)
    and putting ``optimization_barrier`` (semantically the identity) on one
    operand makes the operands distinct, so the rewrite no longer matches
    and the Gram stays a plain MXU dot. Measured full-step effect:
    40.0 -> 36.3 ms/it at 1024px, 9.4 -> 8.4 ms/it at 512px.

    Beyond :data:`FLAT_PAD_LIMIT` (first crossed by conv1_1 above 4096px)
    the flat operand itself stops compiling on TPU, so the contraction is
    split into H-chunks — each chunk flattened and contracted in the same
    barrier form, partial (C, C) products summed in fp32. The chunk count
    is static and tiny (2 at 5632px, 4 at 8192px), so this unrolls into a
    few dots feeding one add tree; autodiff of the chunked form also keeps
    every backward intermediate under the same bound.
    """
    n, h, w, c = feat.shape
    s = n * h * w
    k = 1
    while k < h and -(-h // k) * n * w * max(c, 128) > FLAT_PAD_LIMIT:
        k += 1
    if k == 1:
        f = feat.reshape(s, c)
        fb = jax.lax.optimization_barrier(f)
        g = jnp.einsum("sc,sd->cd", f, fb, preferred_element_type=jnp.float32)
        return g / jnp.asarray(s, jnp.float32)
    hc = -(-h // k)
    g = jnp.zeros((c, c), jnp.float32)
    for i in range(k):
        chunk = jax.lax.slice_in_dim(feat, i * hc, min((i + 1) * hc, h), axis=1)
        f = chunk.reshape(-1, c)
        fb = jax.lax.optimization_barrier(f)
        g = g + jnp.einsum("sc,sd->cd", f, fb, preferred_element_type=jnp.float32)
    return g / jnp.asarray(s, jnp.float32)


def content_loss(feat: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between activations, fp32."""
    d = feat.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def style_loss(gram: jnp.ndarray, target_gram: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between (C, C) Grams, fp32."""
    d = gram.astype(jnp.float32) - target_gram.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def tv_loss(image: jnp.ndarray) -> jnp.ndarray:
    """Isotropic squared total variation of an NHWC image, mean-normalized.

    Gradient at a constant image is exactly zero (property-tested).
    """
    x = image.astype(jnp.float32)
    dh = x[:, 1:, :, :] - x[:, :-1, :, :]
    dw = x[:, :, 1:, :] - x[:, :, :-1, :]
    n = x.size
    return (jnp.sum(jnp.square(dh)) + jnp.sum(jnp.square(dw))) / n


def blend_grams(grams: Sequence[jnp.ndarray], weights: Sequence[float]) -> jnp.ndarray:
    """Weighted blend of per-style Gram targets (multi-style, SURVEY.md row 7).

    Weights are normalized to sum to 1 so adding a style never changes the
    overall style-loss magnitude.
    """
    w = jnp.asarray(weights, jnp.float32)
    w = w / jnp.sum(w)
    stacked = jnp.stack([g.astype(jnp.float32) for g in grams])
    return jnp.tensordot(w, stacked, axes=1)


def normalize_layer_weights(layers: Sequence[str], weights=None) -> Dict[str, float]:
    """Per-layer weight map, normalized to sum to 1 (uniform by default)."""
    if weights is None:
        weights = [1.0] * len(layers)
    if len(weights) != len(layers):
        raise ValueError(f"{len(layers)} layers but {len(weights)} weights")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("layer weights must sum to a positive value")
    return {l: float(w) / total for l, w in zip(layers, weights)}


def objective_terms(
    feats: Mapping[str, jnp.ndarray],
    *,
    content_targets: Mapping[str, jnp.ndarray],
    style_targets: Mapping[str, jnp.ndarray],
    content_layer_weights: Mapping[str, float],
    style_layer_weights: Mapping[str, float],
    image: jnp.ndarray,
    content_weight: float,
    style_weight: float,
    tv_weight: float,
    gram_fn=gram_matrix,
    content_loss_fn=None,
    style_loss_fn=None,
    tv_loss_fn=None,
    gram_overrides: Optional[Mapping[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """All loss terms from a feature dict. Returns fp32 scalars.

    ``gram_fn`` and the three ``*_loss_fn`` hooks are injectable so the
    fused Pallas kernels (``ops/pallas``) slot into the same objective —
    and the oracle path stays runnable via ``--unfused``.
    ``gram_overrides`` supplies already-computed Grams for layers whose
    activations never materialize (the fused block-1 kernel accumulates
    conv1_1's Gram in-pass); those layers need no entry in ``feats``.
    """
    content_loss_fn = content_loss_fn or content_loss
    style_loss_fn = style_loss_fn or style_loss
    tv_loss_fn = tv_loss_fn or tv_loss
    gram_overrides = gram_overrides or {}
    c_loss = jnp.asarray(0.0, jnp.float32)
    for layer, w in content_layer_weights.items():
        c_loss = c_loss + w * content_loss_fn(feats[layer], content_targets[layer])
    s_loss = jnp.asarray(0.0, jnp.float32)
    for layer, w in style_layer_weights.items():
        g = gram_overrides.get(layer)
        if g is None:
            g = gram_fn(feats[layer])
        s_loss = s_loss + w * style_loss_fn(g, style_targets[layer])
    t_loss = tv_loss_fn(image)
    total = content_weight * c_loss + style_weight * s_loss + tv_weight * t_loss
    return {
        "loss": total,
        "content": c_loss,
        "style": s_loss,
        "tv": t_loss,
    }
