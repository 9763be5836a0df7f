"""Fused VGG block 2: conv2_1 + ReLU + conv2_2 + ReLU + 2x2 average pool,
plus the conv2_1 Gram — one pass each way.

After the packed block-1 kernel landed, the 1024px full-step profile showed
block 2 as the new leader: ~10 ms/it across the (1, 512, 512, 128)
`T(2,128)`-layout conv fusions and their ReLU/mask passes — the same
small-spatial-tile disease one level up (conv fusions 2.4-2.5 ms each,
ReLU fusions 1.4-2.5 ms each, for a block whose ideal HBM traffic is
~0.5 ms). Block 2's channel widths are already lane-native (64 in, 128
through), so this kernel needs NO W-packing: it is the
``block1_packed`` structure minus im2col —

    forward:  pool1 (2-row halos) -> conv2_1 (9 taps, K=64) + ReLU on a
              row-EXTENDED tile -> conv2_2 (9 taps, K=128) + ReLU ->
              2x2 average pool, with the conv2_1 activation written as the
              backward residual and its Gram accumulated as a 128-wide
              syrk. The extension recomputes 2 overlap rows per tile so
              conv2_2's row halo is local.

    backward: unpool -> conv2_2 ReLU gate -> transposed conv2_2 taps on
              the extended rows -> + Gram term -> conv2_1 ReLU gate ->
              transposed conv2_1 taps -> d_pool1, all in one pass; the
              only residuals are the conv2_1 activation (bf16) and the
              conv2_2 ReLU mask (int8).

The reference computes this block inside Caffe's cuDNN kernels with no
cross-layer fusion (SURVEY.md section 2 rows 8/15, reconstructed). Checked
against the jnp oracle in ``tests/test_block2.py`` (interpret mode
off-TPU); dispatch is decided by in-context measurement in
``api.StyleTransfer`` (ARCHITECTURE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from style_transfer_tpu.ops.pallas.block1 import _conv_taps, _pool2x2
from style_transfer_tpu.ops.pallas.block1_packed import _row_halo, _tile_h

CIN = 64
CMID = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(p_ref, pu2_ref, pu1_ref, pd1_ref, pd2_ref, k1_ref, b1_ref,
                k2_ref, b2_ref, pool_ref, gram_ref, r1_ref, mask2_ref,
                acc_ref, *, w, true_h):
    i = pl.program_id(0)
    tile = p_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # pool1 rows r0-2 .. r0+tile+1; edge-clamped halo garbage is handled by
    # the row-range masks below (out-of-range rows produce out-of-range
    # y21e rows, which are zeroed).
    pe = jnp.concatenate(
        [pu2_ref[0:1], pu1_ref[0:1], p_ref[:], pd1_ref[0:1], pd2_ref[0:1]],
        axis=0,
    )  # (tile+4, W2, 64)
    rows4 = jax.lax.broadcasted_iota(jnp.int32, pe.shape, 0) + i * tile - 2
    pe = jnp.where((rows4 < 0) | (rows4 >= true_h), 0.0, pe)

    # conv2_1 + ReLU on the extended rows r0-1 .. r0+tile
    y1e = _conv_taps(pe, k1_ref, flip=False, contract_out=False)
    y1e = jnp.maximum(y1e + b1_ref[0].astype(jnp.float32), 0.0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, y1e.shape, 0) + i * tile - 1
    y1e = jnp.where((rows2 < 0) | (rows2 >= true_h), 0.0, y1e).astype(r1_ref.dtype)
    r1 = y1e[1:-1]
    r1_ref[:] = r1

    pre = _conv_taps(y1e, k2_ref, flip=False, contract_out=False)
    pre = pre + b2_ref[0].astype(jnp.float32)
    mask2_ref[:] = (pre > 0.0).astype(mask2_ref.dtype)
    y2 = jnp.maximum(pre, 0.0)
    pool_ref[:] = _pool2x2(y2, tile, w, CMID).astype(pool_ref.dtype)

    f = r1.reshape(tile * w, CMID)
    acc_ref[:] += jax.lax.dot_general(
        f, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        gram_ref[:] = acc_ref[:]


def _bwd_kernel(r1_ref, r1up_ref, r1down_ref, m2_ref, m2u2_ref, m2u1_ref,
                m2d1_ref, m2d2_ref, dp_ref, dpup_ref, dpdown_ref,
                k1_ref, k2_ref, s_ref, dpool1_ref, *, w, true_h):
    """d_pool1 for one tile, fully in-kernel (the block1_packed backward
    structure, unpacked): dpre2_1 on rows r0-1 .. r0+tile, then the
    transposed conv2_1 taps write the input cotangent directly."""
    i = pl.program_id(0)
    tile = r1_ref.shape[0]

    m2e = jnp.concatenate(
        [m2u2_ref[0:1], m2u1_ref[0:1], m2_ref[:], m2d1_ref[0:1], m2d2_ref[0:1]],
        axis=0,
    )  # rows r0-2 .. r0+tile+1

    # unpool the W-duplicated pooled cotangent onto the same rows
    dpx = jnp.concatenate([dpup_ref[0:1], dp_ref[:], dpdown_ref[0:1]], axis=0)
    r2 = dpx.shape[0]  # tile/2 + 2
    dy2 = jnp.broadcast_to(dpx[:, None, :, :], (r2, 2, w, CMID)).reshape(
        r2 * 2, w, CMID
    ) * jnp.asarray(0.25, dpx.dtype)
    rows4 = jax.lax.broadcasted_iota(jnp.int32, dy2.shape, 0) + i * tile - 2
    da2 = dy2 * m2e.astype(dy2.dtype)
    da2 = jnp.where((rows4 < 0) | (rows4 >= true_h), 0.0, da2).astype(r1_ref.dtype)

    dr1 = _conv_taps(da2, k2_ref, flip=True, contract_out=True)  # (tile+2,) fp32
    r1e = jnp.concatenate([r1up_ref[0:1], r1_ref[:], r1down_ref[0:1]], axis=0)
    f = r1e.reshape((tile + 2) * w, CMID)
    g = jax.lax.dot_general(
        f, s_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(tile + 2, w, CMID)
    gate = r1e.astype(jnp.float32) > 0.0
    dpre1 = jnp.where(gate, dr1 + g, 0.0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, dpre1.shape, 0) + i * tile - 1
    dpre1 = jnp.where(
        (rows2 < 0) | (rows2 >= true_h), 0.0, dpre1
    ).astype(r1_ref.dtype)

    dpool1_ref[:] = _conv_taps(
        dpre1, k1_ref, flip=True, contract_out=True
    ).astype(dpool1_ref.dtype)


def _pad_rows(x, tile):
    h = x.shape[0]
    pad = (-h) % (2 * tile)
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _fwd(pool1, k1, b1, k2, b2, true_h):
    h, w, _ = pool1.shape  # h padded; w = W/2 at the original scale
    tile = _tile_h(2 * w)
    dt = pool1.dtype
    center = lambda i: (i, 0, 0)
    pool2, gram, r1, mask2 = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w, true_h=true_h),
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, CIN), center, memory_space=pltpu.VMEM),
            _row_halo(w, CIN, h, lambda i: i * tile - 2),
            _row_halo(w, CIN, h, lambda i: i * tile - 1),
            _row_halo(w, CIN, h, lambda i: (i + 1) * tile),
            _row_halo(w, CIN, h, lambda i: (i + 1) * tile + 1),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2_1 (3,3,64,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2_1 (1,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2_2 (3,3,128,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2_2 (1,128)
        ],
        out_specs=[
            pl.BlockSpec((tile // 2, w // 2, CMID), center, memory_space=pltpu.VMEM),
            pl.BlockSpec((CMID, CMID), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w, CMID), center, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w, CMID), center, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h // 2, w // 2, CMID), dt),
            jax.ShapeDtypeStruct((CMID, CMID), jnp.float32),
            jax.ShapeDtypeStruct((h, w, CMID), dt),
            jax.ShapeDtypeStruct((h, w, CMID), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((CMID, CMID), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * CMID * (9 * CIN + 9 * CMID + CMID),
            bytes_accessed=pool1.size * dt.itemsize + 2 * h * w * CMID * dt.itemsize
            + h * w * CMID,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        pool1, pool1, pool1, pool1, pool1,
        k1.astype(dt), b1.astype(dt).reshape(1, -1),
        k2.astype(dt), b2.astype(dt).reshape(1, -1),
    )
    return pool2, gram, r1, mask2


def _bwd(r1, mask2, k1, k2, d_pool2, s, true_h):
    h, w, _ = r1.shape
    tile = _tile_h(2 * w, backward=True)
    dt = r1.dtype
    dp = jnp.repeat(d_pool2, 2, axis=1).astype(dt)  # W-duplicate -> (h/2, w, 128)
    center = lambda i: (i, 0, 0)
    dpool1 = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, true_h=true_h),
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, CMID), center, memory_space=pltpu.VMEM),
            _row_halo(w, CMID, h, lambda i: i * tile - 1),
            _row_halo(w, CMID, h, lambda i: (i + 1) * tile),
            pl.BlockSpec((tile, w, CMID), center, memory_space=pltpu.VMEM),
            _row_halo(w, CMID, h, lambda i: i * tile - 2),
            _row_halo(w, CMID, h, lambda i: i * tile - 1),
            _row_halo(w, CMID, h, lambda i: (i + 1) * tile),
            _row_halo(w, CMID, h, lambda i: (i + 1) * tile + 1),
            pl.BlockSpec((tile // 2, w, CMID), center, memory_space=pltpu.VMEM),
            _row_halo(w, CMID, h // 2, lambda i: i * (tile // 2) - 1),
            _row_halo(w, CMID, h // 2, lambda i: (i + 1) * (tile // 2)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2_1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2_2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S (128,128)
        ],
        out_specs=pl.BlockSpec((tile, w, CIN), center, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, CIN), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * CMID * (9 * CIN + 9 * CMID + 2 * CMID),
            bytes_accessed=3 * h * w * CMID * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        r1, r1, r1, mask2, mask2, mask2, mask2, mask2, dp, dp, dp,
        k1.astype(dt), k2.astype(dt), s.astype(dt),
    )
    return dpool1


@jax.custom_vjp
def block2_fused(pool1: jnp.ndarray, k1, b1, k2, b2):
    """Whole VGG block 2 fused: conv2_1 + ReLU + conv2_2 + ReLU + 2x2
    average pool, plus the conv2_1 Gram.

    ``pool1``: (1, H2, W2, 64) block-1 pool output (H2, W2 even). Returns
    ``(pool2 (1, H2/2, W2/2, 128), gram (128, 128) fp32 / (H2*W2))``,
    matching the oracle composition (``models/vgg.py`` + ``ops/losses.py``)
    to accumulation tolerance.
    """
    n, h, w, c = pool1.shape
    if n != 1 or c != CIN or h % 2 or w % 2:
        raise ValueError("block2_fused expects (1, even H2, even W2, 64)")
    tile = _tile_h(2 * w)
    pool2, gram, _, _ = _fwd(_pad_rows(pool1[0], tile), k1, b1, k2, b2, h)
    return pool2[None, : h // 2], gram / jnp.float32(h * w)


def _fused_fwd(pool1, k1, b1, k2, b2):
    n, h, w, c = pool1.shape
    if n != 1 or c != CIN or h % 2 or w % 2:
        raise ValueError("block2_fused expects (1, even H2, even W2, 64)")
    tile = _tile_h(2 * w)
    pool2, gram, r1, mask2 = _fwd(_pad_rows(pool1[0], tile), k1, b1, k2, b2, h)
    out = (pool2[None, : h // 2], gram / jnp.float32(h * w))
    return out, (r1, mask2, k1, k2, h)


def _fused_bwd(res, cts):
    r1, mask2, k1, k2, h = res
    d_pool2, d_gram = cts
    w = r1.shape[1]
    s = (d_gram + d_gram.T) / jnp.float32(h * w)
    dp = d_pool2[0]
    if r1.shape[0] != h:
        dp = jnp.pad(dp, ((0, (r1.shape[0] - h) // 2), (0, 0), (0, 0)))
    dpool1 = _bwd(r1, mask2, k1, k2, dp, s, h)
    return (dpool1[None, :h], jnp.zeros_like(k1), jnp.zeros((CMID,), k1.dtype),
            jnp.zeros_like(k2), jnp.zeros((CMID,), k2.dtype))


block2_fused.defvjp(_fused_fwd, _fused_bwd)
