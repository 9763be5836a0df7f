"""Fused VGG block 2: conv2_1 + ReLU + conv2_2 + ReLU + 2x2 average pool,
plus the conv2_1 Gram — one pass each way.

Why this kernel exists (measured, v5e, 1024px): after the packed block-1
kernel landed, the full-step profile's new leader was block 2 — ~10 ms/it
of ``T(2,128)``-layout (1, 512, 512, 128) conv fusions and unfused
ReLU/mask passes, the same small-spatial-tile disease one level up, for a
block whose ideal HBM traffic is ~0.5 ms. Block 2's channel widths are
lane-native (64 in, 128 through), so no W-packing is needed.

The implementation is the generalized fused conv pair
(:mod:`style_transfer_tpu.ops.pallas.conv_pair` — this block was its
prototype) instantiated with both epilogues: 2x2 average pool and the
first conv's Gram. This module keeps the block-2 name, its measured
history, and the stricter input validation; equivalence with the
generalized kernel is pinned in ``tests/test_conv_pair.py``, the oracle
checks live in ``tests/test_block2.py``.

The reference computes this block inside Caffe's cuDNN kernels with no
cross-layer fusion (SURVEY.md section 2 rows 8/15, reconstructed).
Dispatch is decided by in-context measurement in ``api.StyleTransfer``
(ARCHITECTURE.md: blocks 1+2 subgraph at 1024px 26.9 -> 8.1 ms/it vs XLA).
"""

from __future__ import annotations

import jax.numpy as jnp

from style_transfer_tpu.ops.pallas.conv_pair import make_conv_pair

CIN = 64
CMID = 128

_pair = make_conv_pair(pool=True, gram=True)


def block2_fused(pool1: jnp.ndarray, k1, b1, k2, b2):
    """Whole VGG block 2 fused.

    ``pool1``: (1, H2, W2, 64) block-1 pool output (H2, W2 even). Returns
    ``(pool2 (1, H2/2, W2/2, 128), gram (128, 128) fp32 / (H2*W2))``,
    matching the oracle composition (``models/vgg.py`` + ``ops/losses.py``)
    to accumulation tolerance. Differentiates w.r.t. ``pool1`` only.
    """
    n, h, w, c = pool1.shape
    if n != 1 or c != CIN or h % 2 or w % 2:
        raise ValueError("block2_fused expects (1, even H2, even W2, 64)")
    return _pair(pool1, k1, b1, k2, b2)
