"""VGG block 1 in space-to-depth form: the XLA-level attack on the conv1
relayout-copy ceiling.

The problem (ARCHITECTURE.md, "conv-copy ceiling"): ~28% of every optimizer
step is XLA:TPU-internal relayout/halo traffic around the block-1 convs —
``(H, 8, W/8+1, 64)``-family copies the compiler materializes to run
large-spatial, small-channel convolutions (3->64, 64->64 at full
resolution). Two Pallas kernels attacked this in round 2 and lost: a partial
island pays a layout-boundary tax, and a full-block kernel starves the MXU
at the VMEM-feasible tile (measured numbers in ARCHITECTURE.md).

This module removes the pathological *shapes* instead of fighting the
compiler's layouts: express block 1 on a 2x2 space-to-depth grid, where

- the image becomes ``(H/2+1, W/2+1, 12)`` blocks,
- conv1_1 becomes a 3x3 conv ``12 -> 256`` over blocks,
- conv1_2 becomes a 2x2 VALID conv ``256 -> 256`` over blocks,
- pool1 is a per-block channel-group reduction (no spatial window at all),
- conv1_1's Gram reads the blocked activation directly (Grams are
  permutation-invariant over pixels, so no un-blocking is ever needed).

Every operation is exact — the same multiply-adds, re-grouped — and all of
it is plain XLA (conv_general_dilated + reshapes), so it differentiates,
shards, and compiles at any size; the convs now carry >=128 channels on the
lane dimension at quarter spatial size, the bread-and-butter shape XLA:TPU
tiles well. The cost is arithmetic redundancy: the scattered block-space
kernels are zero-padded (conv1_1' does 4.2x the FLOPs of conv1_1, conv1_2'
1.78x of conv1_2), cheap next to ~10 ms/it of copies at 1024px.

The blocking is *shifted* so conv1_2' needs only a 2x2 block window:
block ``i`` of the conv1_1 output covers full-res rows ``2i-1, 2i`` —
exactly the natural 2x2 blocking of the zero-padded tensor conv1_2
consumes. The two dummy slots per axis (full-res rows -1 and H) land on
the padding positions and are zero-masked after the ReLU.

Reference equivalence: this computes the same conv1_1/conv1_2/pool1 the
reference's Caffe VGG-19 runs (SURVEY.md section 2 row 8, reconstructed);
it is a lowering choice, not a model change.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _scatter_k1(k1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, 64) conv1_1 kernel -> (3, 3, 12, 256) block-space kernel.

    Input block channels are ``(p, q, c)`` (row/col slot, image channel)
    flattened ``p*6 + q*3 + c``; output block channels are ``(u, v, o)``
    flattened ``u*128 + v*64 + o``. For output slot ``(u, v)`` and tap
    ``(a, b)``: full-res row ``2i-1+u+a`` lives in block ``i+di``, slot
    ``p``, with ``t = u+a-1``, ``di = t//2``, ``p = t%2`` (and likewise for
    columns) — so the tap scatters to block-tap ``(di+1, dj+1)``.
    """
    out = jnp.zeros((3, 3, 12, 256), k1.dtype)
    for u in range(2):
        for a in range(3):
            t = u + a - 1
            di, p = t // 2, t % 2
            for v in range(2):
                for b in range(3):
                    s = v + b - 1
                    dj, q = s // 2, s % 2
                    out = out.at[
                        di + 1, dj + 1, p * 6 + q * 3 : p * 6 + q * 3 + 3,
                        (u * 2 + v) * 64 : (u * 2 + v) * 64 + 64,
                    ].set(k1[a, b])
    return out


def _scatter_k2(k2: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 64, 64) conv1_2 kernel -> (2, 2, 256, 256) block-space kernel.

    The conv1_1 output blocks are the natural blocking of the zero-padded
    input of conv1_2 (that is what the shifted blocking buys): for output
    slot ``(u, v)`` and tap ``(a, b)``, padded row ``2i+u+a`` lives in
    block ``i+di``, slot ``p``, with ``di = (u+a)//2``, ``p = (u+a)%2``.
    """
    out = jnp.zeros((2, 2, 256, 256), k2.dtype)
    for u in range(2):
        for a in range(3):
            di, p = (u + a) // 2, (u + a) % 2
            for v in range(2):
                for b in range(3):
                    dj, q = (v + b) // 2, (v + b) % 2
                    out = out.at[
                        di, dj, (p * 2 + q) * 64 : (p * 2 + q) * 64 + 64,
                        (u * 2 + v) * 64 : (u * 2 + v) * 64 + 64,
                    ].set(k2[a, b])
    return out


def _conv_blocks(x, kernel, padding):
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def block1_s2d(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    pooling: str = "average",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run VGG block 1 in space-to-depth form.

    ``x`` is the preprocessed (1, H, W, 3) image (H, W even) in the compute
    dtype. Returns ``(pool1, y1_blocked)`` where ``pool1`` is the standard
    (1, H/2, W/2, 64) block output (feed to ``extract_features`` with
    ``start_block=2``) and ``y1_blocked`` is conv1_1's post-ReLU activation
    as (1, H/2+1, W/2+1, 256) shifted blocks with the dummy boundary slots
    zeroed — pass to :func:`gram_from_blocked` (never un-block it; that
    would re-materialize the full-res tensor this lowering exists to avoid).
    """
    n, h, w, c = x.shape
    if n != 1 or c != 3 or h % 2 or w % 2:
        raise ValueError(f"block1_s2d expects (1, even H, even W, 3), got {x.shape}")
    hb, wb = h // 2 + 1, w // 2 + 1

    # Shifted space-to-depth: pad by one so block i covers full-res rows
    # 2i-1, 2i; channels become (slot-row, slot-col, rgb).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xb = xp.reshape(1, hb, 2, wb, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(1, hb, wb, 12)

    # conv1_1' + bias + ReLU, then zero the two dummy slots per axis
    # (full-res rows/cols -1 and H/W — exactly conv1_2's zero padding).
    y1 = _conv_blocks(xb, _scatter_k1(k1), "SAME")
    y1 = jax.nn.relu(y1 + jnp.tile(b1.astype(y1.dtype), 4))
    row_mask = np.ones((hb, 2), np.float32)
    row_mask[0, 0] = 0.0
    row_mask[-1, 1] = 0.0
    col_mask = np.ones((wb, 2), np.float32)
    col_mask[0, 0] = 0.0
    col_mask[-1, 1] = 0.0
    mask = (
        row_mask[:, None, :, None, None] * col_mask[None, :, None, :, None]
    ).reshape(1, hb, wb, 4, 1)
    y1 = (y1.reshape(1, hb, wb, 4, 64) * mask.astype(y1.dtype)).reshape(1, hb, wb, 256)

    # conv1_2' (2x2 VALID over blocks) + bias + ReLU.
    y2 = _conv_blocks(y1, _scatter_k2(k2), "VALID")
    y2 = jax.nn.relu(y2 + jnp.tile(b2.astype(y2.dtype), 4))

    # pool1: the 2x2 window IS the block — a channel-group reduction.
    y2 = y2.reshape(1, h // 2, w // 2, 4, 64)
    if pooling == "average":
        pool1 = jnp.mean(y2, axis=3, dtype=y2.dtype)
    elif pooling == "max":
        pool1 = jnp.max(y2, axis=3)
    else:
        raise ValueError(f"unknown pooling mode {pooling!r}")
    return pool1, y1


def gram_from_blocked(y1_blocked: jnp.ndarray, true_hw: Tuple[int, int]) -> jnp.ndarray:
    """conv1_1's (64, 64) Gram from the blocked activation.

    Grams are permutation-invariant over pixels and the dummy slots are
    zero (zero rows contribute nothing), so the blocked tensor can be read
    as-is; only the normalizer must use the TRUE pixel count. Keeps the
    barrier formulation of :func:`ops.losses.gram_matrix` (defeats the
    XLA:TPU syrk-to-convolution rewrite — see that docstring).
    """
    f = y1_blocked.reshape(-1, 64)
    fb = jax.lax.optimization_barrier(f)
    g = jnp.einsum("sc,sd->cd", f, fb, preferred_element_type=jnp.float32)
    return g / jnp.asarray(true_hw[0] * true_hw[1], jnp.float32)
