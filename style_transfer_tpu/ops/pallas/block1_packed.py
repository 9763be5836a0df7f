"""Fused VGG block 1 with W-pair-packed lanes — the round-3 attack on the
conv1 relayout-copy ceiling.

Profiled reality this kernel replaces (v5e, 1024px, per optimizer
iteration): XLA:TPU runs conv1_1/conv1_2 in an ``(H, 8, W/8+1, 64)``
internal form and surrounds them with ~7 ms of pure relayout copies of
134-270 MB tensors, ~4 ms of unfused ReLU/mask passes, and a channel-major
transpose feeding the conv1_1 Gram — ~21 ms for a block whose ideal HBM
traffic is ~1.5 ms. An XLA-level reformulation (space-to-depth,
``models/block1_s2d.py``) ties rather than wins: it trades the copies for
blocking reshapes of the same tensors. The only way out is fusion — one
pass from the image to pool1 with everything else resident in VMEM.

Round 2's fused kernels (``block1.py``) lost for a *layout* reason this
module fixes: tensors with 27 or 64 channels occupy 128-lane VMEM registers
at 2-4.7x padding, capping the H-tile at 4-8 rows and driving the MXU at
K=N=64 quarter efficiency against Mosaic's per-grid-step overhead. Here
every heavy buffer packs TWO W-pixels per lane register:

    packed[r, j, u*64 + c] = tensor[r, 2*j + u, c]        (lane = 128, dense)

so VMEM holds 2x the rows, and in packed space

- conv1_1 is ONE (M, 128) x (128, 128) matmul (the 3x3x3 patches arrive
  pre-packed from XLA as 2x27-padded-to-2x64 lanes; K1' is block-diagonal);
- conv1_2 is 9 taps of (M, 128) x (128, 128) — full 128-deep MXU
  contractions (kernels scattered from k2; packed-column offsets -1/0/+1);
- the conv1_1 Gram is a 128-wide syrk whose (64, 64) result is the sum of
  its two diagonal blocks (Grams are pixel-permutation-invariant);
- 2x2 average pooling is a 0.25-weighted (128, 64) matmul (the W-pair sum)
  followed by an outer-dim row-pair sum — no strided windows anywhere.

The forward reads the packed patches once and writes pool1, the packed
conv1_1 activation (the backward residual and Gram source), and the
conv1_2 ReLU mask (int8). The backward writes the IMAGE cotangent directly
in one pass: it computes the conv1_1 pre-activation cotangent on a
row-extended tile (transposed conv1_2 taps + Gram term + both ReLU gates)
and applies the transposed conv1_1 as 9 packed taps contracting to 8
output lanes — profiling showed the earlier XLA col2im (9 serialized
dynamic-update-slices on a lane-3 tensor) cost 2.5 ms/it at 1024px, more
than both kernel passes combined.

The reference computes this block inside Caffe's cuDNN kernels with no
cross-layer fusion (SURVEY.md section 2 rows 8/15, reconstructed). Checked
against the jnp oracle in ``tests/test_block1_packed.py`` (interpret mode
off-TPU); dispatch is decided by in-context measurement in
``api.StyleTransfer`` (ARCHITECTURE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64  # block-1 channel width (VGG); packed lane width is 2*C = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_h(w: int, backward: bool = False) -> int:
    """Rows per grid step: ~10-12 MB of VMEM across the packed buffers.

    The backward holds more live rows (the +-2-row extension, the unpool
    intermediates, and the fp32 dpre accumulator), and at W=2048 measured
    236 KB over the 16 MB scoped-VMEM limit at the forward tile — so wide
    backwards halve the tile.

    The tile is always EVEN: the 2x2-pool epilogues pair rows WITHIN a
    tile (``_pool2x2``'s row-pair reshape), so an odd tile fails to trace
    on every pooled kernel. Power-of-two effective widths always got
    even tiles for free; non-power-of-two ones (eff 2049-2730 -> 3,
    1490-1638 -> 5, ...) crashed until the parity floor below (round-4
    review finding)."""
    t = max(2, min(32, 8 * 1024 // max(w, 1)))
    if backward and w > 1024:
        t = max(2, t // 2)
    return max(2, t - (t % 2))


# ------------------------------------------------------------ weight packing


def _pack_k1(k1: jnp.ndarray, dtype) -> jnp.ndarray:
    """(3, 3, 3, 64) conv1_1 kernel -> (128, 128) block-diagonal matmul
    operand over packed patch lanes (u, tap) -> packed outputs (u, c_out)."""
    flat = k1.reshape(27, C).astype(dtype)
    out = jnp.zeros((2 * C, 2 * C), dtype)
    for u in range(2):
        out = out.at[u * C : u * C + 27, u * C : (u + 1) * C].set(flat)
    return out


def _pack_k2(k2: jnp.ndarray, dtype) -> jnp.ndarray:
    """(3, 3, 64, 64) conv1_2 kernel -> (3, 3, 128, 128) packed tap stack.

    Tap ``(dy, pi)`` (packed-column offset ``pi - 1``) carries
    ``k2[dy, dx]`` in block ``(p, u)`` iff output pixel parity ``u`` reads
    input parity ``p`` of that packed column: ``dx = 2*(pi-1) + p - u + 1``.
    Half the blocks are structurally zero (2x FLOP redundancy — the price
    of full 128-deep MXU contractions, ~0.4 ms at 1024px vs ~7 ms of
    copies saved).
    """
    out = jnp.zeros((3, 3, 2 * C, 2 * C), dtype)
    for dy in range(3):
        for pi in range(3):
            for p in range(2):
                for u in range(2):
                    dx = 2 * (pi - 1) + p - u + 1
                    if 0 <= dx <= 2:
                        out = out.at[
                            dy, pi, p * C : (p + 1) * C, u * C : (u + 1) * C
                        ].set(k2[dy, dx].astype(dtype))
    return out


def _pool_mat(dtype) -> jnp.ndarray:
    """(128, 64) 0.25-weighted W-pair summer: the lane half of 2x2 pooling."""
    eye = jnp.eye(C, dtype=dtype) * jnp.asarray(0.25, dtype)
    return jnp.concatenate([eye, eye], axis=0)


def _pack_k1_t(k1: jnp.ndarray, dtype) -> jnp.ndarray:
    """(3, 3, 3, 64) conv1_1 kernel -> (3, 3, 128, 8) transposed packed taps.

    The backward computes the image cotangent IN-KERNEL (profiling showed
    the XLA col2im — 9 serialized dynamic-update-slices on a lane-3 tensor
    — cost 2.5 ms/it at 1024px, more than both kernels combined):
    ``dx[r, w=2j+u, c] += dpre1[r+dy-1, 2(j+pi-1)+p, (p, co)] * k1[2-dy, b, c, co]``
    with ``b = u + 3 - 2*pi - p`` when valid. Output lanes are ``u*4 + c``
    (c < 3; 8 lanes total, unpacked to (H, W, 3) by a free reshape+slice).
    """
    out = jnp.zeros((3, 3, 2 * C, 8), dtype)
    flat = k1.astype(dtype)  # (3, 3, 3, 64)
    for dy in range(3):
        for pi in range(3):
            for p in range(2):
                for u in range(2):
                    b = u + 3 - 2 * pi - p
                    if 0 <= b <= 2:
                        # k1[2-dy, b] : (3, 64) -> block rows (p, co), cols (u, c)
                        out = out.at[
                            dy, pi, p * C : (p + 1) * C, u * 4 : u * 4 + 3
                        ].set(flat[2 - dy, b].T)
    return out


# ------------------------------------------------------- XLA-side transforms


def _im2col_packed(x2d: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) image -> (H, W/2, 128) packed 3x3 SAME patches.

    Lane = ``u*64 + (dy*3 + dx)*3 + ci`` (taps padded 27 -> 64 per parity).
    Cheap XLA elementwise producers with no layout opinions; the final
    lane-merge reshape is free because parity is adjacent-minor to tap.
    """
    h, w, c = x2d.shape
    xp = jnp.pad(x2d, ((1, 1), (1, 1), (0, 0)))
    taps = [
        jax.lax.slice(xp, (dy, dx, 0), (dy + h, dx + w, c))
        for dy in range(3)
        for dx in range(3)
    ]
    p27 = jnp.concatenate(taps, axis=2)  # (H, W, 27)
    p = p27.reshape(h, w // 2, 2, 27)
    p = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, C - 27)))
    return p.reshape(h, w // 2, 2 * C)


def _col2im_packed(dpt: jnp.ndarray, w: int) -> jnp.ndarray:
    """(H, W/2, 128) packed patch cotangents -> (H, W, 3) image cotangent.

    Unpack is a free reshape (parity adjacent-minor to tap) + one slice;
    each tap then scatters back shifted (inverse of :func:`_im2col_packed`).
    """
    h = dpt.shape[0]
    d27 = dpt.reshape(h, w // 2, 2, C)[:, :, :, :27].reshape(h, w, 27)
    dx = jnp.zeros((h + 2, w + 2, 3), dpt.dtype)
    for t in range(9):
        dy, tx = divmod(t, 3)
        comp = jax.lax.slice(d27, (0, 0, 3 * t), (h, w, 3 * t + 3))
        dx = jax.lax.dynamic_update_slice(
            dx, jax.lax.dynamic_slice(dx, (dy, tx, 0), (h, w, 3)) + comp,
            (dy, tx, 0),
        )
    return dx[1:-1, 1:-1]


# ------------------------------------------------------------------ kernels


def _w_chunks(w: int, c: int) -> int:
    """Static W-chunk count for the kernels' fp32 tap accumulators.

    Above effective width 2048 (``w * c / 64`` — the per-row VMEM cost
    normalization of :func:`_tile_h`'s callers) a full-width fp32
    accumulator at the minimum 2-row tile overflows the 16 MB scoped-VMEM
    budget (measured: block 2 at the 4096px scale misses by 2.5 MB).
    Computing the tap sums in W-slices and consuming each slice
    immediately (bias/ReLU/cast/store) keeps at most one chunk-sized fp32
    value live; the result is BIT-identical (the same per-element sum in
    the same order). Chunk widths stay sublane-tileable (the sliced axis
    is second-minor); a width that cannot split evenly keeps one chunk —
    callers gate on the compile-validated width instead."""
    eff = w * c // 64
    n = max(1, -(-eff // 2048))  # ceil: eff 2049..4096 needs 2 chunks
    while n > 1 and (w % n or (w // n) % 8):
        n -= 1
    return n


def _w_chunks_bwd(w: int, c: int) -> int:
    """W-chunk count for the packed block-1 BACKWARD kernel.

    The one-pass backward body holds ~5 full-width row-extended values
    simultaneously (the unpool broadcast, the gated cotangent, the mask
    and residual concats, ``dpre1``) on top of the fp32 tap accumulators
    and the Gram term. At effective width 4096 (the 4096px scale,
    w2 = 2048) the forward's 2 chunks leave a measured 17.79M scoped-VMEM
    demand and 4 chunks 16.61M, while 8 chunks (eff 512 per accumulator
    chunk) compile and run on v5e (ops/pallas/vmem.py table). Chunk-count
    bit-identity is the tested contract
    (tests/test_block1_packed.py::test_w_chunked_bit_identical), so
    escalating only the backward changes nothing numerically. Inside the
    two-conv validated envelope (eff <= 2048) this stays the forward
    count."""
    eff = w * c // 64
    if eff <= 2048:
        return _w_chunks(w, c)
    n = max(1, -(-eff // 512))
    while n > 1 and (w % n or (w // n) % 8):
        n -= 1
    return n


def fits_scoped_vmem(w: int, c: int) -> bool:
    """DEPRECATED round-3 gate, superseded by ``ops/pallas/vmem.py``.

    It modeled only the fp32 accumulators W-chunking shrinks; round-4
    hardware probes showed the full-width bf16 body values (which
    chunking cannot shrink — the 3x3 taps reach across chunk edges) put
    every two-conv kernel at effective width 4096 over the 16 MB scoped
    budget in at least one direction, so this returned True for shapes
    that do not compile. Kept only so old callers fail safe: it now
    returns the hardware-validated two-conv envelope (eff <= 2048,
    ``vmem.PAIR_EFF_LIMIT``). Dispatch uses ``vmem.segment_impl``."""
    return w * c // 64 <= 2048


def _taps_w(xh, k_ref, *, flip: bool, contract_out: bool, nchunks: int, post):
    """9 taps of a 3x3 conv over an H-extended tile, in static W-slices.

    ``xh``: (rows+2, W, C) with one halo row above and below (W is the
    packed-column axis for the packed block-1 kernels, the pixel axis for
    the conv-pair kernels — the tap geometry is identical). ``post(acc,
    c0, c1)`` consumes each fp32 chunk (rows, cw, C') as soon as it is
    produced — applying the pointwise epilogue and casting down, or
    storing into a ref slice — so the full-width fp32 tensor never
    exists. Returns the list of ``post`` results (chunks in W order).
    ``flip``/``contract_out`` select the transposed (input-gradient) form.
    Column shifts ride a zero-column concat on the sublane axis — the zero
    column is exactly the W-edge padding. With ``nchunks=1`` this is
    exactly the unchunked computation."""
    rows = xh.shape[0] - 2
    w = xh.shape[1]
    if w % nchunks:
        # a partial last chunk would silently leave ref columns unwritten
        raise ValueError(f"W={w} does not split into {nchunks} chunks")
    zcol = jnp.zeros((xh.shape[0], 1, xh.shape[2]), xh.dtype)
    xw = jnp.concatenate([zcol, xh, zcol], axis=1)  # (rows+2, W+2, C)
    cw = w // nchunks
    dims = (((2,), (1,)), ((), ())) if contract_out else (((2,), (0,)), ((), ()))
    outs = []
    for j in range(nchunks):
        acc = None
        for dy in range(3):
            for dx in range(3):
                patch = jax.lax.slice(
                    xw, (dy, j * cw + dx, 0),
                    (dy + rows, j * cw + dx + cw, xw.shape[2]),
                )
                k = k_ref[2 - dy, 2 - dx] if flip else k_ref[dy, dx]
                term = jax.lax.dot_general(
                    patch, k, dims, preferred_element_type=jnp.float32
                )
                acc = term if acc is None else acc + term
        outs.append(post(acc, j * cw, (j + 1) * cw))
    return outs


def _taps_packed(xh, k_ref, *, flip: bool, contract_out: bool):
    """9 packed taps of a 3x3 conv over an H-extended packed tile:
    :func:`_taps_w` unchunked. Returns (rows, W/2, 128) fp32."""
    return _taps_w(
        xh, k_ref, flip=flip, contract_out=contract_out, nchunks=1,
        post=lambda acc, c0, c1: acc,
    )[0]


def _fwd_kernel(p_ref, pup_ref, pdown_ref, k1p_ref, b1p_ref, k2p_ref, b2p_ref,
                pm_ref, off_ref, pool_ref, gram_ref, r1_ref, mask2_ref, acc_ref,
                *, true_h, gram_lo, gram_hi, nchunks):
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    tile = p_ref.shape[0]
    w2 = p_ref.shape[1]
    cw = w2 // nchunks
    off = off_ref[0]  # global row index of array row 0 (nonzero under a mesh)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # packed patches on rows r0-1 .. r0+tile (1-row halos, zeroed at edges)
    pup = jnp.where(i == 0, 0, pup_ref[0:1])
    pdown = jnp.where(i == nt - 1, 0, pdown_ref[0:1])
    pe = jnp.concatenate([pup, p_ref[:], pdown], axis=0)  # (tile+2, W/2, 128)

    # conv1_1: one full-depth packed matmul (pointwise in W — chunked so
    # the fp32 product never exists full-width); rows outside the true
    # image (GLOBAL coordinates: array row + off) are forced to zero
    # (conv1_2's SAME padding at the true image edges).
    def conv1(pc):
        y = jax.lax.dot_general(
            pc, k1p_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(y + b1p_ref[0].astype(jnp.float32), 0.0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + i * tile - 1 + off
        return jnp.where((row_ids < 0) | (row_ids >= true_h), 0.0, y).astype(
            r1_ref.dtype
        )

    if nchunks == 1:
        y1e = conv1(pe)
    else:
        y1e = jnp.concatenate(
            [conv1(pe[:, c0 : c0 + cw]) for c0 in range(0, w2, cw)], axis=1
        )
    r1 = y1e[1:-1]
    r1_ref[:] = r1

    # conv1_2: 9 packed full-depth taps, fp32 tap-sum per W-chunk; ReLU
    # mask saved; 2x2 average pool (lane half as a matmul, row half as an
    # outer split) applied per chunk.
    def post(pre, c0, c1):
        pre = pre + b2p_ref[0].astype(jnp.float32)
        mask2_ref[:, c0:c1] = (pre > 0.0).astype(mask2_ref.dtype)
        y2 = jnp.maximum(pre, 0.0)
        wsum = jax.lax.dot_general(
            y2, pm_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tile, cw, 64), 0.25-weighted pair sums
        wsum = wsum.reshape(tile // 2, 2, c1 - c0, C)
        pool_ref[:, c0:c1] = (wsum[:, 0] + wsum[:, 1]).astype(pool_ref.dtype)

    _taps_w(y1e, k2p_ref, flip=False, contract_out=False, nchunks=nchunks,
            post=post)

    # conv1_1 Gram: 128-wide syrk; diagonal blocks summed in XLA afterwards.
    # Under a mesh only rows in the static LOCAL-row window [gram_lo,
    # gram_hi) contribute — a shard owns exactly its own rows' Gram term;
    # halo/padding rows belong to (and are counted by) the neighbour.
    fr = r1
    if gram_lo > 0 or gram_hi < (1 << 30):
        lrow = jax.lax.broadcasted_iota(jnp.int32, r1.shape, 0) + i * tile
        fr = jnp.where((lrow < gram_lo) | (lrow >= gram_hi), 0, r1)
    f = fr.reshape(tile * w2, 2 * C)
    acc_ref[:] += jax.lax.dot_general(
        f, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nt - 1)
    def _():
        gram_ref[:] = acc_ref[:]


def _bwd_kernel(r1_ref, r1up_ref, r1down_ref, m2_ref, m2u2_ref, m2u1_ref,
                m2d1_ref, m2d2_ref, dp_ref, dpup_ref, dpdown_ref,
                k1t_ref, k2p_ref, sp_ref, off_ref, dx_ref, *, true_h,
                nchunks):
    """Image cotangent for one tile, fully in-kernel.

    ``dpre1`` (the conv1_1 pre-activation cotangent) is computed on the
    ROW-EXTENDED range r0-1 .. r0+tile — unpool -> conv1_2 ReLU gate ->
    transposed packed conv1_2 taps -> + Gram term -> conv1_1 ReLU gate —
    so the final transposed conv1_1 (9 packed taps contracting to 8 output
    lanes, ``_pack_k1_t``) has its row halo locally and the kernel writes
    d_image directly: no patch cotangents, no XLA col2im. The extension
    costs 2 extra rows of taps per tile; the inputs carry 1-row (r1, pooled
    cotangent) and 2-row (conv1_2 mask) halos.
    """
    i = pl.program_id(0)
    tile, w2 = r1_ref.shape[0], r1_ref.shape[1]
    off = off_ref[0]  # global row index of array row 0 (nonzero under a mesh)

    # conv1_2 mask on rows r0-2 .. r0+tile+1 (tile+4)
    m2e = jnp.concatenate(
        [m2u2_ref[0:1], m2u1_ref[0:1], m2_ref[:], m2d1_ref[0:1], m2d2_ref[0:1]],
        axis=0,
    )

    # unpool the (lane-duplicated by the caller) pooled cotangent onto the
    # same rows; 0.25 is the pool weight (folded forward into pm, so
    # applied exactly once here). Pooled halo rows cover image rows
    # r0-2 .. r0+tile+1 exactly; edge-clamped halo garbage is zeroed by the
    # row-range mask below.
    dpx = jnp.concatenate([dpup_ref[0:1], dp_ref[:], dpdown_ref[0:1]], axis=0)
    r2 = dpx.shape[0]  # tile/2 + 2
    dy2 = jnp.broadcast_to(dpx[:, None, :, :], (r2, 2, w2, 2 * C)).reshape(
        r2 * 2, w2, 2 * C
    ) * jnp.asarray(0.25, dpx.dtype)  # (tile+4, W/2, 128), rows r0-2 ..

    cw = w2 // nchunks
    if nchunks == 1:
        rows4 = jax.lax.broadcasted_iota(jnp.int32, dy2.shape, 0) + i * tile - 2 + off
        da2 = dy2 * m2e.astype(dy2.dtype)
        da2 = jnp.where((rows4 < 0) | (rows4 >= true_h), 0.0, da2).astype(
            r1_ref.dtype
        )
    else:
        # pointwise in W: chunk so no full-width fp32 product exists
        cshape = (dy2.shape[0], cw, dy2.shape[2])
        rows4 = jax.lax.broadcasted_iota(jnp.int32, cshape, 0) + i * tile - 2 + off
        da2 = jnp.concatenate(
            [
                jnp.where(
                    (rows4 < 0) | (rows4 >= true_h),
                    0.0,
                    dy2[:, c0 : c0 + cw] * m2e[:, c0 : c0 + cw].astype(dy2.dtype),
                ).astype(r1_ref.dtype)
                for c0 in range(0, w2, cw)
            ],
            axis=1,
        )

    # dpre1 on the extended rows r0-1 .. r0+tile, per W-chunk
    r1e = jnp.concatenate([r1up_ref[0:1], r1_ref[:], r1down_ref[0:1]], axis=0)

    def post_b(dr1, c0, c1):
        r1c = r1e[:, c0:c1]
        f = r1c.reshape((tile + 2) * (c1 - c0), 2 * C)
        g = jax.lax.dot_general(
            f, sp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tile + 2, c1 - c0, 2 * C)
        gate = r1c.astype(jnp.float32) > 0.0  # no bf16 vector compare on TPU
        dp = jnp.where(gate, dr1 + g, 0.0)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, dp.shape, 0) + i * tile - 1 + off
        return jnp.where((rows2 < 0) | (rows2 >= true_h), 0.0, dp).astype(
            r1_ref.dtype
        )

    chunks = _taps_w(
        da2, k2p_ref, flip=True, contract_out=True, nchunks=nchunks, post=post_b
    )
    dpre1 = chunks[0] if nchunks == 1 else jnp.concatenate(chunks, axis=1)

    # transposed conv1_1 straight to packed image-cotangent lanes (u*4 + c)
    _taps_w(
        dpre1, k1t_ref, flip=False, contract_out=False, nchunks=nchunks,
        post=lambda acc, c0, c1: dx_ref.__setitem__(
            (slice(None), slice(c0, c1)), acc.astype(dx_ref.dtype)
        ),
    )


# ------------------------------------------------------------ host wrappers


def _halo_specs(w2: int, tile_rows: int, h: int):
    """1-row halo blocks directly above/below each tile (H-axis blocks have
    no sublane granularity constraint), edge-clamped."""

    def up_index(i):
        return (jnp.maximum(i * tile_rows - 1, 0), 0, 0)

    def down_index(i):
        return (jnp.minimum((i + 1) * tile_rows, h - 1), 0, 0)

    return (
        pl.BlockSpec((1, w2, 2 * C), up_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w2, 2 * C), down_index, memory_space=pltpu.VMEM),
    )


def _pad_h(x2d: jnp.ndarray, tile: int):
    h = x2d.shape[0]
    pad = (-h) % (2 * tile)
    if pad:
        x2d = jnp.pad(x2d, ((0, pad),) + ((0, 0),) * (x2d.ndim - 1))
    return x2d


def _fwd(x2d, k1, b1, k2, b2, true_h, off=None, gram_rows=None):
    """(H, W, 3) preprocessed image rows (H padded, W even) ->
    (pool1 (H/2, W/2, 64), unnormalized gram128 (128, 128) fp32,
    r1 packed, mask2 packed int8).

    ``off`` (traced int32, default 0) is the GLOBAL row index of array row
    0 — nonzero when ``x2d`` is a halo-extended mesh shard, so the
    edge-zeroing masks work in global coordinates. ``gram_rows`` is a
    static local-row window ``(lo, hi)`` restricting the Gram accumulation
    to the rows this shard owns (halo rows are the neighbour's)."""
    h, w, _ = x2d.shape
    tile = _tile_h(w)
    w2 = w // 2
    dt = x2d.dtype
    gram_lo, gram_hi = gram_rows if gram_rows is not None else (0, 1 << 30)
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    patches = _im2col_packed(x2d)
    pup, pdown = _halo_specs(w2, tile, h)
    grid = (h // tile,)
    pool, gram, r1, mask2 = pl.pallas_call(
        functools.partial(_fwd_kernel, true_h=true_h, gram_lo=gram_lo,
                          gram_hi=gram_hi, nchunks=_w_chunks(w2, 2 * C)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, w2, 2 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pup,
            pdown,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # K1' (128, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 packed (1, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # K2' (3, 3, 128, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 packed (1, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pool matrix (128, 64)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # global row offset (1,)
        ],
        out_specs=[
            pl.BlockSpec((tile // 2, w2, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * C, 2 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w2, 2 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w2, 2 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h // 2, w2, C), dt),
            jax.ShapeDtypeStruct((2 * C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((h, w2, 2 * C), dt),
            jax.ShapeDtypeStruct((h, w2, 2 * C), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((2 * C, 2 * C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w2 * 2 * C * (2 * C + 9 * 2 * C + 2 * C),
            bytes_accessed=patches.size * dt.itemsize
            + 2 * h * w2 * 2 * C * dt.itemsize
            + h * w2 * 2 * C,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        patches, patches, patches,
        _pack_k1(k1, dt), jnp.tile(b1.astype(dt), 2).reshape(1, -1),
        _pack_k2(k2, dt), jnp.tile(b2.astype(dt), 2).reshape(1, -1),
        _pool_mat(dt), off_arr,
    )
    return pool, gram, r1, mask2


def _row_halo(w2: int, lanes: int, h: int, row_fn):
    """A single-row halo block whose element row is ``row_fn(i)``, clamped
    to the array (H-axis blocks have no sublane granularity constraint;
    clamped edge garbage is masked in-kernel by the row-range checks)."""
    return pl.BlockSpec(
        (1, w2, lanes),
        lambda i: (jnp.clip(row_fn(i), 0, h - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )


def _bwd(r1p, mask2, k1, k2, d_pool, s, true_h, off=None):
    """One-pass in-kernel backward -> (H_pad, W, 3) image cotangent.

    ``off`` as in :func:`_fwd`: the global row of array row 0, so the
    edge masks hold in global coordinates for halo-extended mesh shards."""
    h, w2, _ = r1p.shape
    w = 2 * w2
    tile = _tile_h(w, backward=True)
    dt = r1p.dtype
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    # lane-duplicate the pooled cotangent: packed d_y2 has the same value on
    # both parities of a packed column (one pooled pixel covers both)
    dp = jnp.concatenate([d_pool, d_pool], axis=-1).astype(dt)  # (H/2, W/2, 128)
    sp = jnp.zeros((2 * C, 2 * C), jnp.float32)
    sp = sp.at[:C, :C].set(s).at[C:, C:].set(s)
    center = lambda i: (i, 0, 0)
    dx8 = pl.pallas_call(
        functools.partial(_bwd_kernel, true_h=true_h,
                          nchunks=_w_chunks_bwd(w2, 2 * C)),
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((tile, w2, 2 * C), center, memory_space=pltpu.VMEM),
            _row_halo(w2, 2 * C, h, lambda i: i * tile - 1),
            _row_halo(w2, 2 * C, h, lambda i: (i + 1) * tile),
            pl.BlockSpec((tile, w2, 2 * C), center, memory_space=pltpu.VMEM),
            _row_halo(w2, 2 * C, h, lambda i: i * tile - 2),
            _row_halo(w2, 2 * C, h, lambda i: i * tile - 1),
            _row_halo(w2, 2 * C, h, lambda i: (i + 1) * tile),
            _row_halo(w2, 2 * C, h, lambda i: (i + 1) * tile + 1),
            pl.BlockSpec((tile // 2, w2, 2 * C), center, memory_space=pltpu.VMEM),
            _row_halo(w2, 2 * C, h // 2, lambda i: i * (tile // 2) - 1),
            _row_halo(w2, 2 * C, h // 2, lambda i: (i + 1) * (tile // 2)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # K1^T packed (3,3,128,8)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # K2'
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S'
            pl.BlockSpec(memory_space=pltpu.SMEM),  # global row offset (1,)
        ],
        out_specs=pl.BlockSpec((tile, w2, 8), center, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w2, 8), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w2 * 2 * C * (9 * 2 * C + 2 * 2 * C + 9 * 8),
            bytes_accessed=3 * h * w2 * 2 * C * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        r1p, r1p, r1p, mask2, mask2, mask2, mask2, mask2, dp, dp, dp,
        _pack_k1_t(k1, dt), _pack_k2(k2, dt), sp.astype(dt), off_arr,
    )
    # unpack lanes (u*4 + c, c < 3) -> (H, W, 3): free reshape + one slice
    return dx8.reshape(h, w2, 2, 4)[:, :, :, :3].reshape(h, w, 3)


def _gram64(gram128: jnp.ndarray, hw: int) -> jnp.ndarray:
    return (gram128[:C, :C] + gram128[C:, C:]) / jnp.float32(hw)


@jax.custom_vjp
def block1_packed(x: jnp.ndarray, k1, b1, k2, b2):
    """Whole VGG block 1 fused, W-pair-packed: conv1_1 + ReLU + conv1_2 +
    ReLU + 2x2 average pool, plus the conv1_1 Gram — from the preprocessed
    (1, H, W, 3) image (H, W even). Returns ``(pool1 (1, H/2, W/2, 64),
    gram (64, 64) fp32 / (H*W))``, matching the oracle composition
    (``models/vgg.py`` + ``ops/losses.py``) to accumulation tolerance.
    """
    n, h, w, _ = x.shape
    if n != 1 or h % 2 or w % 2:
        raise ValueError("block1_packed expects (1, even H, even W, 3)")
    pool, gram, _, _ = _fwd(_pad_h(x[0], _tile_h(w)), *_wargs(k1, b1, k2, b2), h)
    return pool[None, : h // 2], _gram64(gram, h * w)


def _wargs(k1, b1, k2, b2):
    return k1, b1, k2, b2


def _packed_fwd(x, k1, b1, k2, b2):
    n, h, w, _ = x.shape
    if n != 1 or h % 2 or w % 2:
        raise ValueError("block1_packed expects (1, even H, even W, 3)")
    pool, gram, r1p, mask2 = _fwd(_pad_h(x[0], _tile_h(w)), k1, b1, k2, b2, h)
    out = (pool[None, : h // 2], _gram64(gram, h * w))
    return out, (r1p, mask2, k1, k2, h)


def _packed_bwd(res, cts):
    r1p, mask2, k1, k2, h = res
    d_pool, d_gram = cts
    # gram = F^T F / (HW): d_r1 contribution = F (dG + dG^T) / (HW)
    s = (d_gram + d_gram.T) / jnp.float32(h * (2 * r1p.shape[1]))
    dp = d_pool[0]
    if r1p.shape[0] != h:
        dp = jnp.pad(dp, ((0, (r1p.shape[0] - h) // 2), (0, 0), (0, 0)))
    dx = _bwd(r1p, mask2, k1, k2, dp, s, h)
    # the image optimization never differentiates w.r.t. the VGG weights
    return (dx[None, :h], jnp.zeros_like(k1), jnp.zeros((C,), k1.dtype),
            jnp.zeros_like(k2), jnp.zeros((C,), k2.dtype))


block1_packed.defvjp(_packed_fwd, _packed_bwd)


# ------------------------------------------------- block 1 on a spatial mesh

HALO = 4  # rows of image halo each way: dx rows [lo, hi) need dpre1
# [lo-1, hi], mask2 [lo-2, hi+1], r1 [lo-3, hi+2], image [lo-4, hi+3] —
# and 4 keeps the extension even-aligned for the 2x2 pool row pairing.


def _local_b1_fwd(x, k1, b1, k2, b2, *, axis, n_dev):
    """Per-device forward body (inside shard_map): 4-row ``ppermute`` image
    halos, the packed kernel over the extended rows in GLOBAL coordinates
    (``off``/``gram_rows``), center-sliced pool1, ``psum``'d Gram. Edge
    devices receive ppermute's zero fill; the kernel's global row masks
    turn exactly those rows into conv SAME padding."""
    _, h_l, w, _ = x.shape
    idx = jax.lax.axis_index(axis)
    up = jax.lax.ppermute(x[:, -HALO:], axis, [(i, i + 1) for i in range(n_dev - 1)])
    down = jax.lax.ppermute(x[:, :HALO], axis, [(i, i - 1) for i in range(1, n_dev)])
    xe = jnp.concatenate([up, x, down], axis=1)[0]  # (h_l + 8, W, 3)
    off = idx * h_l - HALO
    pool, gram, r1p, mask2 = _fwd(
        _pad_h(xe, _tile_h(w)), k1, b1, k2, b2, n_dev * h_l,
        off=off, gram_rows=(HALO, HALO + h_l),
    )
    pool_c = pool[HALO // 2 : HALO // 2 + h_l // 2]
    return pool_c[None], jax.lax.psum(gram, axis), r1p, mask2


def _local_b1_bwd(r1p, mask2, d_pool, s, k1, k2, *, axis, n_dev):
    """Per-device backward body: the stored residuals already cover the
    4-row extension, so only the POOLED cotangent needs a (one-row)
    ``ppermute`` halo; the in-kernel backward then writes the local image
    cotangent in one pass, center-sliced to the shard's own rows. Rows fed
    by the zero-filled extension edges only reach sliced-away outputs."""
    h_l = d_pool.shape[1] * 2
    idx = jax.lax.axis_index(axis)
    dp = d_pool[0]  # (h_l/2, W/2, 64)
    up = jax.lax.ppermute(dp[-1:], axis, [(i, i + 1) for i in range(n_dev - 1)])
    down = jax.lax.ppermute(dp[:1], axis, [(i, i - 1) for i in range(1, n_dev)])
    # pooled rows aligned with the r1p extension: array pooled row 0 is
    # global pooled row lo/2 - HALO/2; rows outside [lo/2-1, hi/2] are
    # zero (they only influence dx rows outside the center slice).
    pad_tail = r1p.shape[0] // 2 - h_l // 2 - 3
    dpe = jnp.concatenate(
        [jnp.zeros_like(up), up, dp, down,
         jnp.zeros((pad_tail,) + dp.shape[1:], dp.dtype)],
        axis=0,
    )
    off = idx * h_l - HALO
    dx = _bwd(r1p, mask2, k1, k2, dpe, s, n_dev * h_l, off=off)
    return dx[HALO : HALO + h_l][None]


def make_sharded_block1(mesh, axis: str):
    """:func:`block1_packed` carried onto a 1-D spatial mesh.

    Returns a drop-in ``(x, k1, b1, k2, b2) -> (pool1, gram)`` for NHWC
    images sharded along H over ``mesh`` (``P(None, axis, None, None)``):
    each device runs the packed kernel on its own rows plus a 4-row
    ``ppermute`` halo, Grams ``psum`` over ICI, and the custom VJP keeps
    the per-shard packed residuals sharded — the backward's only
    collective is a one-pooled-row halo exchange (the Gram cotangent
    arrives replicated). Caller gates: N == 1, even W, per-shard rows
    H / n_dev even and >= 4. Sharded == unsharded to accumulation
    tolerance (tests/test_sharding.py)."""
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.shape[axis])
    img = P(None, axis, None, None)
    rows = P(axis, None, None)
    kw = dict(axis=axis, n_dev=n_dev)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation (same situation as make_sharded_tv_loss).
    body_fwd = jax.shard_map(
        functools.partial(_local_b1_fwd, **kw),
        mesh=mesh,
        in_specs=(img, P(), P(), P(), P()),
        out_specs=(img, P(), rows, rows),
        check_vma=False,
    )
    body_bwd = jax.shard_map(
        functools.partial(_local_b1_bwd, **kw),
        mesh=mesh,
        in_specs=(rows, rows, img, P(), P(), P()),
        out_specs=img,
        check_vma=False,
    )

    def _check(x):
        n, h, w, _ = x.shape
        h_l = h // n_dev
        if n != 1 or w % 2 or h % n_dev or h_l % 2 or h_l < HALO:
            raise ValueError(
                "sharded block1_packed expects (1, H, even W, 3) with "
                f"H / {n_dev} even and >= {HALO}; got {x.shape}"
            )

    @jax.custom_vjp
    def sharded_block1(x, k1, b1, k2, b2):
        _check(x)
        pool, gram, _, _ = body_fwd(x, k1, b1, k2, b2)
        return pool, _gram64(gram, x.shape[1] * x.shape[2])

    def fwd(x, k1, b1, k2, b2):
        _check(x)
        pool, gram, r1p, mask2 = body_fwd(x, k1, b1, k2, b2)
        out = (pool, _gram64(gram, x.shape[1] * x.shape[2]))
        return out, (r1p, mask2, k1, k2, x.shape[1], x.shape[2])

    def bwd(res, cts):
        r1p, mask2, k1, k2, h, w = res
        d_pool, d_gram = cts
        s = (d_gram + d_gram.T) / jnp.float32(h * w)
        dx = body_bwd(r1p, mask2, d_pool, s, k1, k2)
        return (dx, jnp.zeros_like(k1), jnp.zeros((C,), k1.dtype),
                jnp.zeros_like(k2), jnp.zeros((C,), k2.dtype))

    sharded_block1.defvjp(fwd, bwd)
    return sharded_block1
