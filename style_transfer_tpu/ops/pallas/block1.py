"""Fused VGG block-1 tail: conv1_2 + bias + ReLU + 2x2 avg-pool + conv1_1 Gram.

Why this kernel exists (measured, v5e, 1024px): after the Gram conv-rewrite
fix, conv1-level work is ~half the optimizer step — not because of FLOPs
(conv1_2 is 77 GF) but because XLA materializes W-tiled halo copies of the
1024x1024x64 activations, a channel-major transpose feeding the conv1_1
Gram dot, and pred-mask relayouts, roughly 7 ms/it of pure copies plus the
mask fusions. This kernel runs everything BETWEEN the conv1_1 activation
``r1`` and the block's pool output in one streaming pass:

    forward:  r1 -> [conv1_2 (9-tap MXU matmuls, fp32 acc) + bias + ReLU
                     -> 2x2 average pool] -> pool1
              and gram(r1) accumulated tile-by-tile in a (64, 64) fp32
              VMEM accumulator — r1 is read ONCE from HBM and only the
              4x-smaller pool1 is written.

    backward: gates the un-pooled cotangent by the ReLU mask the forward
              saved as packed int8 (recomputing the conv per tile instead
              was measured to blow the ~16 MiB VMEM budget at W=1024),
              applies the transposed 9-tap conv, and adds the Gram term
              ``r1 @ S`` — producing d_r1 in one pass; the only saved
              block-1 intermediate is the 1-byte mask.

HBM traffic per iteration at 1024px drops from ~500 MB of activations +
copies to: read r1 (134 MB) + write pool1 (33 MB) + mask (67 MB) forward,
and read r1 + mask + d_pool1 + write d_r1 backward.

The reference computes this block inside Caffe's cuDNN conv + pooling
kernels with no cross-layer fusion (SURVEY.md section 2 rows 8/15,
reconstructed). Checked against the jnp oracle (``models/vgg.py`` +
``ops/losses.py``) in ``tests/test_pallas_block1.py``; interpreter mode
off-TPU. Dispatch is decided by in-context measurement in
``api.StyleTransfer`` (ARCHITECTURE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_h(w: int, backward: bool) -> int:
    """Rows per grid step, sized so the fp32 conv accumulator + bf16 tiles
    stay inside the ~16 MiB VMEM budget (the backward holds more live
    temporaries, so it halves the tile)."""
    t = 8 if w <= 512 else (4 if w <= 2048 else 2)
    return max(2, t // 2) if backward else t


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _conv_taps(xh, k_ref, *, flip: bool, contract_out: bool):
    """9-tap 3x3 SAME conv over an H-extended tile.

    ``xh``: (rows+2, W, C) input including one halo row above and below.
    Returns (rows, W, C') in fp32. ``flip``/``contract_out`` select the
    transposed (input-gradient) form: spatially rotated kernel contracted
    over its OUTPUT channel axis.
    """
    rows = xh.shape[0] - 2
    w = xh.shape[1]
    zcol = jnp.zeros((xh.shape[0], 1, xh.shape[2]), xh.dtype)
    xw = jnp.concatenate([zcol, xh, zcol], axis=1)  # (rows+2, W+2, C)
    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.slice(
                xw, (dy, dx, 0), (dy + rows, dx + w, xw.shape[2])
            )
            k = k_ref[2 - dy, 2 - dx] if flip else k_ref[dy, dx]
            dims = (((2,), (1,)), ((), ())) if contract_out else (((2,), (0,)), ((), ()))
            term = jax.lax.dot_general(
                patch, k, dims, preferred_element_type=jnp.float32
            )
            acc = term if acc is None else acc + term
    return acc


def _pool2x2(y, rows, w, c):
    """(rows, W, C) -> (rows/2, W/2, C) 2x2 mean, sublane-split reshapes only."""
    y = y.reshape(rows, w // 2, 2, c)
    y = y[:, :, 0, :] + y[:, :, 1, :]
    y = y.reshape(rows // 2, 2, w // 2, c)
    y = y[:, 0] + y[:, 1]
    return y * 0.25


def _fwd_kernel(r1_ref, up_ref, down_ref, k2_ref, b2_ref,
                pool_ref, gram_ref, mask_ref, acc_ref, *, w):
    i = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r1 = r1_ref[:]  # (TILE_H, W, 64) bf16
    # single-row halo blocks (the H axis of a 3D block has no sublane
    # granularity constraint); zeroed at the image edges (SAME padding)
    up = jnp.where(i == 0, 0, up_ref[0:1])
    down = jnp.where(i == nt - 1, 0, down_ref[0:1])
    xh = jnp.concatenate([up, r1, down], axis=0)  # (TILE_H+2, W, 64)

    pre = _conv_taps(xh, k2_ref, flip=False, contract_out=False)
    pre = pre + b2_ref[0].astype(jnp.float32)
    mask_ref[:] = (pre > 0.0).astype(mask_ref.dtype)
    y = jnp.maximum(pre, 0.0)
    pool_ref[:] = _pool2x2(y, r1.shape[0], w, y.shape[2]).astype(pool_ref.dtype)

    f = r1.reshape(r1.shape[0] * w, r1.shape[2])
    acc_ref[:] += jax.lax.dot_general(
        f, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nt - 1)
    def _():
        gram_ref[:] = acc_ref[:]


def _bwd_kernel(r1_ref, mask_ref, mup_ref, mdown_ref, dp_ref, dpup_ref,
                dpdown_ref, k2_ref, s_ref, dr1_ref, *, w):
    """d_r1 for one tile: transposed conv of the mask-gated unpooled
    cotangent (needs the gated cotangent on rows r0-1 .. r0+TILE_H, so
    mask halos are 1 row and d_pool halos 1 pooled row each side) plus the
    Gram term r1 @ S. The ReLU mask comes from the forward (int8)."""
    i = pl.program_id(0)
    nt = pl.num_programs(0)

    r1 = r1_ref[:]  # (TILE_H, W, 64)
    rows = r1.shape[0]
    c = r1.shape[2]

    mask = jnp.concatenate(
        [mup_ref[0:1], mask_ref[:], mdown_ref[0:1]], axis=0
    )  # (TILE_H+2, W, 64) int8; edge halos are clamped garbage but the
    # matching dy2 rows are zeroed below, so the product is still zero.

    # unpool the cotangent onto the same extended rows. The caller already
    # duplicated it along W (a sublane-interleave Mosaic can't express);
    # rows duplicate here via an outer-dim broadcast+merge, which is free.
    # Pooled row p covers image rows 2p/2p+1; the extension rows r0-1 and
    # r0+TILE_H live in the neighbouring pooled rows (halo blocks, edge
    # rows zeroed).
    dp = dp_ref[:]  # (TILE_H//2, W, 64), W-duplicated
    dp_up = jnp.where(i == 0, 0, dpup_ref[0:1])
    dp_down = jnp.where(i == nt - 1, 0, dpdown_ref[0:1])
    dpx = jnp.concatenate([dp_up, dp, dp_down], axis=0)  # (TILE_H//2+2, W, 64)
    r2 = dpx.shape[0]
    dy2 = jnp.broadcast_to(dpx[:, None, :, :], (r2, 2, w, c)).reshape(r2 * 2, w, c)
    dy2 = dy2[1:-1] * jnp.asarray(0.25, dpx.dtype)  # rows r0-1 .. r0+TILE_H

    da2 = (dy2 * mask.astype(dy2.dtype)).astype(r1.dtype)
    dr1 = _conv_taps(da2, k2_ref, flip=True, contract_out=True)  # (TILE_H, W, 64)

    # Gram term: d_r1 += r1 @ S, S = (dG + dG^T)/(H*W) prescaled outside
    f = r1.reshape(rows * w, c)
    g = jax.lax.dot_general(
        f, s_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dr1_ref[:] = (dr1 + g.reshape(rows, w, c)).astype(dr1_ref.dtype)


def _halo_specs(w, c, tile_rows, h, halo):
    """(halo, W, C) blocks directly above/below each tile, edge-clamped.

    Block height = the halo width itself, so tile boundaries land exactly
    (H-axis blocks have no sublane granularity constraint). Requires
    ``halo | tile_rows`` so the halo rows are block-aligned.
    """
    n_blocks = h // halo

    def up_index(i):
        return (jnp.maximum(i * (tile_rows // halo) - 1, 0), 0, 0)

    def down_index(i):
        return (jnp.minimum((i + 1) * (tile_rows // halo), n_blocks - 1), 0, 0)

    return (
        pl.BlockSpec((halo, w, c), up_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((halo, w, c), down_index, memory_space=pltpu.VMEM),
    )


def _check(r1, kernel2, tile_h):
    h, w, c = r1.shape
    if c != kernel2.shape[2] or kernel2.shape[:2] != (3, 3):
        raise ValueError(f"expected 3x3 kernel on {c} channels, got {kernel2.shape}")
    if h % tile_h or w % 2:
        raise ValueError(f"H must be a multiple of {tile_h} and W even, got {(h, w)}")
    return h, w, c, kernel2.shape[3]


def _block1_fwd_2d(r1, kernel2, bias2):
    """(H, W, 64) r1 -> (pool1 (H/2, W/2, 64), unnormalized gram (64, 64),
    conv1_2 ReLU mask (H, W, 64) int8 — the backward's only residual)."""
    tile_h = _tile_h(r1.shape[1], backward=False)
    h, w, c, cout = _check(r1, kernel2, tile_h)
    grid = (h // tile_h,)
    up, down = _halo_specs(w, c, tile_h, h, halo=1)
    pool, gram, mask = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            up,
            down,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel2, full
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias2 (1, 64), full
        ],
        out_specs=[
            pl.BlockSpec((tile_h // 2, w // 2, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h // 2, w // 2, cout), r1.dtype),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((h, w, cout), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * c * (9 * cout + c),
            bytes_accessed=r1.size * r1.dtype.itemsize
            + (h // 2) * (w // 2) * cout * r1.dtype.itemsize
            + h * w * cout,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(r1, r1, r1, kernel2.astype(r1.dtype), bias2.reshape(1, -1))
    return pool, gram, mask


def _block1_bwd_2d(r1, mask, kernel2, d_pool, s):
    """One-pass d_r1 from (d_pool, S) using the forward's saved ReLU mask."""
    tile_h = _tile_h(r1.shape[1], backward=True)
    h, w, c, cout = _check(r1, kernel2, tile_h)
    grid = (h // tile_h,)
    m_up, m_down = _halo_specs(w, cout, tile_h, h, halo=1)
    hp = h // 2
    # W-duplicate the pooled cotangent in XLA (fast elementwise; Mosaic
    # cannot interleave sublanes in-kernel) — rows duplicate in-kernel.
    d_pool = jnp.repeat(d_pool, 2, axis=1)  # (hp, w, cout)
    dp_up, dp_down = _halo_specs(w, cout, tile_h // 2, hp, halo=1)
    dr1 = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            m_up,
            m_down,
            pl.BlockSpec((tile_h // 2, w, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            dp_up,
            dp_down,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S (64, 64)
        ],
        out_specs=pl.BlockSpec((tile_h, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c), r1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * c * (9 * cout + c),
            bytes_accessed=2 * r1.size * r1.dtype.itemsize + h * w * cout,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(r1, mask, mask, mask, d_pool, d_pool, d_pool,
      kernel2.astype(r1.dtype), s.astype(r1.dtype))
    return dr1


def _pad_h(x2d: jnp.ndarray):
    """Zero-pad rows to a multiple of 16 (covers every tile size; zero rows
    reproduce SAME-conv edge semantics and contribute nothing to the Gram)."""
    h = x2d.shape[0]
    pad = (-h) % 16
    if pad:
        x2d = jnp.pad(x2d, ((0, pad),) + ((0, 0),) * (x2d.ndim - 1))
    return x2d


@jax.custom_vjp
def block1_tail(r1: jnp.ndarray, kernel2: jnp.ndarray, bias2: jnp.ndarray):
    """Fused conv1_2+ReLU+avg-pool and conv1_1 Gram.

    ``r1``: (1, H, W, 64) post-ReLU conv1_1 activations (H even, W even,
    any float dtype). Returns ``(pool1 (1, H/2, W/2, 64), gram (64, 64)
    fp32 / (H*W))`` — exactly ``_pool(relu(conv(r1)+b), "average")`` and
    ``losses.gram_matrix(r1)`` of the oracle path.
    """
    n, h, w, c = r1.shape
    if n != 1 or h % 2:
        raise ValueError("block1_tail expects N=1 and even H")
    pool, gram, _ = _block1_fwd_2d(_pad_h(r1[0]), kernel2, bias2)
    return pool[None, : h // 2], gram / jnp.float32(h * w)


def _tail_fwd(r1, kernel2, bias2):
    n, h, w, c = r1.shape
    if n != 1 or h % 2:
        raise ValueError("block1_tail expects N=1 and even H")
    r1p = _pad_h(r1[0])
    pool, gram, mask = _block1_fwd_2d(r1p, kernel2, bias2)
    out = (pool[None, : h // 2], gram / jnp.float32(h * w))
    return out, (r1p, mask, kernel2, bias2, h)


def _tail_bwd(res, cts):
    r1p, mask, kernel2, bias2, h = res
    d_pool, d_gram = cts
    w = r1p.shape[1]
    # gram = F^T F / (HW): d_r1 contribution = F (dG + dG^T) / (HW)
    s = (d_gram + d_gram.T) / jnp.float32(h * w)
    dp = d_pool[0]
    if r1p.shape[0] != h:
        dp = jnp.pad(dp, ((0, (r1p.shape[0] - h) // 2), (0, 0), (0, 0)))
    dr1 = _block1_bwd_2d(r1p, mask, kernel2, dp, s)
    # the image optimization never differentiates w.r.t. the VGG weights;
    # zero cotangents keep the vjp signature total without extra traffic
    return dr1[None, :h], jnp.zeros_like(kernel2), jnp.zeros_like(bias2)


block1_tail.defvjp(_tail_fwd, _tail_bwd)


# --------------------------------------------------------------------------
# Full-block variant: conv1_1 included, so the kernel's input boundary is
# the preprocessed IMAGE (12 MB at 1024px) rather than the 134 MB conv1_1
# activation whose forced layout poisoned the neighbouring convs in the
# `block1_tail` experiment (ARCHITECTURE.md). conv1_1's tiny C_in=3 would
# waste the MXU's 128-deep contraction, so it runs as 27 VPU broadcast-FMAs
# (one per tap x input channel); conv1_2 stays on the MXU.
# --------------------------------------------------------------------------


def _im2col3(x2d: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) image -> (H, W, 27) 3x3 SAME patches, (dy, dx, ci) order.

    Runs in XLA (a cheap elementwise producer with no layout opinions), so
    the kernel's conv1_1 is ONE MXU contraction over 27 — building the
    patch tensor in-kernel is impossible (Mosaic cannot concatenate 3-lane
    vectors along the lane dim) and 27 VPU broadcast-FMAs blow VMEM with
    lane-padded temporaries.
    """
    h, w, c = x2d.shape
    xp = jnp.pad(x2d, ((1, 1), (1, 1), (0, 0)))
    taps = [
        jax.lax.slice(xp, (dy, dx, 0), (dy + h, dx + w, c))
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.concatenate(taps, axis=2)


def _full_fwd_kernel(p_ref, pup_ref, pdown_ref, k1f_ref, b1_ref, k2_ref, b2_ref,
                     pool_ref, gram_ref, r1_ref, mask2_ref, acc_ref, *, w, true_h):
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    tile = p_ref.shape[0]

    # im2col patches on the extended rows r0-1 .. r0+TILE (1-row halos,
    # zeroed at the image edges — the patch rows there don't exist)
    p = p_ref[:]  # (TILE, W, 27)
    pup = jnp.where(i == 0, 0, pup_ref[0:1])
    pdown = jnp.where(i == nt - 1, 0, pdown_ref[0:1])
    pe = jnp.concatenate([pup, p, pdown], axis=0)  # (TILE+2, W, 27)

    r1e = jax.lax.dot_general(
        pe, k1f_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r1e = jnp.maximum(r1e + b1_ref[0].astype(jnp.float32), 0.0)
    # Rows outside the true image must be ZERO r1 (conv1_2's SAME padding,
    # and no Gram contribution): computing the conv over zero-padded image
    # rows would instead produce a "virtual" relu(b1 + ...) row there. Ext
    # row 0 is image row i*tile - 1 (= -1 on the first tile).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, r1e.shape, 0) + i * tile - 1
    r1e = jnp.where((row_ids < 0) | (row_ids >= true_h), 0.0, r1e).astype(r1_ref.dtype)
    r1 = r1e[1:-1]
    r1_ref[:] = r1  # residual for the backward (and the Gram source)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pre = _conv_taps(r1e, k2_ref, flip=False, contract_out=False)
    pre = pre + b2_ref[0].astype(jnp.float32)
    mask2_ref[:] = (pre > 0.0).astype(mask2_ref.dtype)
    y = jnp.maximum(pre, 0.0)
    pool_ref[:] = _pool2x2(y, r1.shape[0], w, y.shape[2]).astype(pool_ref.dtype)

    f = r1.reshape(r1.shape[0] * w, r1.shape[2])
    acc_ref[:] += jax.lax.dot_general(
        f, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nt - 1)
    def _():
        gram_ref[:] = acc_ref[:]


def _full_bwd_kernel(r1_ref, m2_ref, m2up_ref, m2down_ref,
                     dp_ref, dpup_ref, dpdown_ref, k1f_ref, k2_ref, s_ref,
                     dpt_ref, *, w):
    """d_patches for one tile: the gated d_r1 (transposed conv1_2 of the
    mask-gated unpooled cotangent, plus the Gram term, ReLU-gated by r1)
    contracted with k1f^T in ONE MXU dot — the spatial scatter back to the
    image (col2im) happens in XLA outside the kernel, so only center rows
    are needed here (1-row mask2 / pooled-cotangent halos)."""
    i = pl.program_id(0)
    nt = pl.num_programs(0)

    r1 = r1_ref[:]  # (TILE, W, 64)
    rows = r1.shape[0]
    c = r1.shape[2]

    m2e = jnp.concatenate(
        [m2up_ref[0:1], m2_ref[:], m2down_ref[0:1]], axis=0
    )  # (TILE+2, W, 64); edge-halo garbage is matched by zeroed dy2 rows

    dp = dp_ref[:]  # (TILE//2, W, 64), W-duplicated by the caller
    dp_up = jnp.where(i == 0, 0, dpup_ref[0:1])
    dp_down = jnp.where(i == nt - 1, 0, dpdown_ref[0:1])
    dpx = jnp.concatenate([dp_up, dp, dp_down], axis=0)  # (TILE//2+2, W, 64)
    r2 = dpx.shape[0]
    dy2 = jnp.broadcast_to(dpx[:, None, :, :], (r2, 2, w, c)).reshape(r2 * 2, w, c)
    dy2 = dy2[1:-1] * jnp.asarray(0.25, dpx.dtype)  # rows r0-1 .. r0+TILE

    da2 = (dy2 * m2e.astype(dy2.dtype)).astype(r1.dtype)  # (TILE+2, W, 64)
    dr1 = _conv_taps(da2, k2_ref, flip=True, contract_out=True)  # (TILE, W, 64)

    f = r1.reshape(rows * w, c)
    g = jax.lax.dot_general(
        f, s_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(rows, w, c)
    # f32 compare: the target has no bf16 vector comparison
    gate = r1.astype(jnp.float32) > 0.0
    dpre1 = jnp.where(gate, dr1 + g, 0.0).astype(r1.dtype)  # (TILE, W, 64)

    # conv1_1^T as d_patches = dpre1 @ k1f^T (27 lanes out)
    dpt_ref[:] = jax.lax.dot_general(
        dpre1, k1f_ref[:], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dpt_ref.dtype)


def _block1_full_fwd_2d(x, k1, b1, k2, b2, true_h):
    tile_h = _tile_h(x.shape[1], backward=False)
    h, w, _ = x.shape
    c = k1.shape[3]
    grid = (h // tile_h,)
    patches = _im2col3(x)  # (H, W, 27), XLA-side
    pup, pdown = _halo_specs(w, 27, tile_h, h, halo=1)
    pool, gram, r1, mask2 = pl.pallas_call(
        functools.partial(_full_fwd_kernel, w=w, true_h=true_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, w, 27), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pup,
            pdown,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 (1, 64)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, 64)
        ],
        out_specs=[
            pl.BlockSpec((tile_h // 2, w // 2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h // 2, w // 2, c), x.dtype),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((h, w, c), x.dtype),
            jax.ShapeDtypeStruct((h, w, c), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * c * (9 * 3 + 9 * c + c),
            bytes_accessed=x.size * x.dtype.itemsize
            + 2 * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(patches, patches, patches, k1.reshape(27, -1).astype(x.dtype),
      b1.reshape(1, -1), k2.astype(x.dtype), b2.reshape(1, -1))
    return pool, gram, r1, mask2


def _col2im3(dpt: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 27) patch cotangents -> (H, W, 3) image cotangent (XLA-side
    inverse of :func:`_im2col3`: each tap scatters back shifted)."""
    h, w, _ = dpt.shape
    dx = jnp.zeros((h + 2, w + 2, 3), dpt.dtype)
    for t, (dy, tx) in enumerate((dy, tx) for dy in range(3) for tx in range(3)):
        comp = jax.lax.slice(dpt, (0, 0, 3 * t), (h, w, 3 * t + 3))
        dx = jax.lax.dynamic_update_slice(
            dx, jax.lax.dynamic_slice(dx, (dy, tx, 0), (h, w, 3)) + comp,
            (dy, tx, 0),
        )
    return dx[1:-1, 1:-1]


def _block1_full_bwd_2d(r1, mask2, k1, k2, d_pool, s):
    tile_h = _tile_h(r1.shape[1], backward=True)
    h, w, c = r1.shape
    grid = (h // tile_h,)
    m2up, m2down = _halo_specs(w, c, tile_h, h, halo=1)
    hp = h // 2
    d_pool = jnp.repeat(d_pool, 2, axis=1)  # (hp, w, c)
    dpup, dpdown = _halo_specs(w, c, tile_h // 2, hp, halo=1)
    dpt = pl.pallas_call(
        functools.partial(_full_bwd_kernel, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            m2up,
            m2down,
            pl.BlockSpec((tile_h // 2, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            dpup,
            dpdown,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1f (27, 64)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S
        ],
        out_specs=pl.BlockSpec((tile_h, w, 27), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, 27), r1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * c * (27 + 9 * c + c),
            bytes_accessed=3 * h * w * c * r1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(r1, mask2, mask2, mask2, d_pool, d_pool, d_pool,
      k1.reshape(27, -1).astype(r1.dtype), k2.astype(r1.dtype),
      s.astype(r1.dtype))
    return _col2im3(dpt)


@jax.custom_vjp
def block1_full(x: jnp.ndarray, k1, b1, k2, b2):
    """Whole VGG block 1 fused: conv1_1 (VPU) + ReLU + conv1_2 (MXU) + ReLU
    + 2x2 avg-pool, plus the conv1_1 Gram — from the preprocessed image.

    ``x``: (1, H, W, 3), H even, W even. Returns ``(pool1, gram)`` exactly
    matching the oracle composition; the backward produces d_x in one pass
    from the saved conv1_1 activation and the conv1_2 ReLU mask.
    """
    n, h, w, _ = x.shape
    if n != 1 or h % 2:
        raise ValueError("block1_full expects N=1 and even H")
    pool, gram, _, _ = _block1_full_fwd_2d(_pad_h(x[0]), k1, b1, k2, b2, h)
    return pool[None, : h // 2], gram / jnp.float32(h * w)


def _full_fwd(x, k1, b1, k2, b2):
    n, h, w, _ = x.shape
    if n != 1 or h % 2:
        raise ValueError("block1_full expects N=1 and even H")
    xp = _pad_h(x[0])
    pool, gram, r1, mask2 = _block1_full_fwd_2d(xp, k1, b1, k2, b2, h)
    out = (pool[None, : h // 2], gram / jnp.float32(h * w))
    return out, (r1, mask2, k1, k2, h)


def _full_bwd(res, cts):
    r1, mask2, k1, k2, h = res
    d_pool, d_gram = cts
    w = r1.shape[1]
    s = (d_gram + d_gram.T) / jnp.float32(h * w)
    dp = d_pool[0]
    if r1.shape[0] != h:
        dp = jnp.pad(dp, ((0, (r1.shape[0] - h) // 2), (0, 0), (0, 0)))
    dx = _block1_full_bwd_2d(r1, mask2, k1, k2, dp, s)
    # weights are never optimized; zero cotangents keep the vjp total
    return (dx[None, :h], jnp.zeros_like(k1), jnp.zeros((k1.shape[3],), k1.dtype),
            jnp.zeros_like(k2), jnp.zeros((k2.shape[3],), k2.dtype))


block1_full.defvjp(_full_fwd, _full_bwd)
