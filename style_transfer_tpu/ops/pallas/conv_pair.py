"""Generalized fused conv-pair kernel: two 3x3 convs (+ReLUs), optional
2x2 average pool and optional first-conv Gram — one pass each way.

This is the ``block2.py`` structure with the channel widths, pool, and
Gram epilogues as parameters, so one kernel family covers every
lane-native VGG block segment:

- block 2 = one pair (64->128, 128->128) with pool+gram;
- block 3 (VGG-19: four convs) = two pairs — (128->256, 256->256) with
  gram (conv3_1's style Gram), then (256->256, 256->256) with pool.

Chaining pairs costs nothing at the seam: a Pallas custom call requires
row-major operands and produces row-major results, so a
custom-call-to-custom-call boundary needs no relayout — unlike the
custom-call-to-XLA-conv boundary, where XLA re-tiles the neighbouring
convs into ``T(2,128)`` forms (measured ~6.8 ms/it around conv3_1 at
1024px once blocks 1-2 were fused; fusing block 3 moves that boundary to
quarter resolution where the same tax costs 4x less).

Structure per tile (rows-extended so every halo is local):

    forward:  input (2-row halos) -> conv_a + ReLU on rows r0-1..r0+tile
              -> conv_b + ReLU -> [2x2 average pool]; first activation
              written as the backward residual (+ its Gram accumulated as
              a CMID-wide syrk); conv_b's ReLU mask saved as int8.
    backward: [unpool] -> conv_b ReLU gate -> transposed conv_b taps on
              the extended rows [-> + Gram term] -> conv_a ReLU gate ->
              transposed conv_a taps -> input cotangent, in one pass.

Checked against the jnp oracle in ``tests/test_conv_pair.py`` (interpret
mode off-TPU). The reference computes these blocks inside Caffe's cuDNN
kernels with no cross-layer fusion (SURVEY.md section 2 rows 8/15,
reconstructed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from style_transfer_tpu.ops.pallas.block1 import _pool2x2
from style_transfer_tpu.ops.pallas.block1_packed import (
    _row_halo,
    _taps_w as _conv_taps_w,
    _tile_h,
    _w_chunks,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_for(w: int, cmid: int, backward: bool = False) -> int:
    """Rows per grid step, normalized by the per-row VMEM cost ``w*cmid``
    (same budget the packed block-1 tile table encodes at w*128/64)."""
    return _tile_h(w * cmid // 64, backward)




def _fwd_kernel(p_ref, pu2_ref, pu1_ref, pd1_ref, pd2_ref, k1_ref, b1_ref,
                k2_ref, b2_ref, off_ref, out_ref, r1_ref, mask2_ref, *refs,
                w, true_h, pool, gram, gram_lo, gram_hi, nchunks):
    i = pl.program_id(0)
    tile = p_ref.shape[0]
    cmid = r1_ref.shape[2]
    off = off_ref[0]  # global row index of array row 0 (nonzero under a mesh)
    if gram:
        gram_ref, acc_ref = refs

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    # input rows r0-2 .. r0+tile+1; rows outside the true image (GLOBAL
    # coordinates: array row + off) zeroed (SAME padding semantics +
    # edge-clamped halo garbage)
    pe = jnp.concatenate(
        [pu2_ref[0:1], pu1_ref[0:1], p_ref[:], pd1_ref[0:1], pd2_ref[0:1]],
        axis=0,
    )
    rows4 = jax.lax.broadcasted_iota(jnp.int32, pe.shape, 0) + i * tile - 2 + off
    pe = jnp.where((rows4 < 0) | (rows4 >= true_h), 0.0, pe)

    def post_a(acc, c0, c1):
        y = jnp.maximum(acc + b1_ref[0].astype(jnp.float32), 0.0)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + i * tile - 1 + off
        return jnp.where((rows2 < 0) | (rows2 >= true_h), 0.0, y).astype(
            r1_ref.dtype
        )

    chunks = _conv_taps_w(
        pe, k1_ref, flip=False, contract_out=False, nchunks=nchunks, post=post_a
    )
    y1e = chunks[0] if nchunks == 1 else jnp.concatenate(chunks, axis=1)
    r1 = y1e[1:-1]
    r1_ref[:] = r1

    def post_b(acc, c0, c1):
        pre = acc + b2_ref[0].astype(jnp.float32)
        mask2_ref[:, c0:c1] = (pre > 0.0).astype(mask2_ref.dtype)
        y2 = jnp.maximum(pre, 0.0)
        if pool:
            out_ref[:, c0 // 2 : c1 // 2] = _pool2x2(
                y2, tile, c1 - c0, y2.shape[2]
            ).astype(out_ref.dtype)
        else:
            out_ref[:, c0:c1] = y2.astype(out_ref.dtype)

    _conv_taps_w(
        y1e, k2_ref, flip=False, contract_out=False, nchunks=nchunks, post=post_b
    )

    if gram:
        # Under a mesh only rows in the static LOCAL-row window [gram_lo,
        # gram_hi) contribute — a shard owns exactly its own rows' Gram
        # term; halo/padding rows belong to (and are counted by) the
        # neighbour.
        fr = r1
        if gram_lo > 0 or gram_hi < (1 << 30):
            lrow = jax.lax.broadcasted_iota(jnp.int32, r1.shape, 0) + i * tile
            fr = jnp.where((lrow < gram_lo) | (lrow >= gram_hi), 0, r1)
        f = fr.reshape(tile * w, cmid)
        acc_ref[:] += jax.lax.dot_general(
            f, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            gram_ref[:] = acc_ref[:]


def _bwd_kernel(*refs, w, true_h, pool, gram, nchunks):
    """Input cotangent for one tile: [unpool ->] conv_b ReLU gate ->
    transposed conv_b taps on rows r0-1 .. r0+tile [-> + Gram term] ->
    conv_a ReLU gate -> transposed conv_a taps.

    Ref order: r1, r1 up/down halos, mask2, mask2 u2/u1/d1/d2 halos, then
    the output-cotangent refs (pooled: center + 1-pooled-row halos, giving
    rows r0-2..r0+tile+1 after unpooling; un-pooled: center + u2/u1/d1/d2
    single-row halos), k1, k2, [S], the global row offset (SMEM), and the
    input-cotangent output ref.
    """
    it = iter(refs)
    r1_ref, r1up_ref, r1down_ref = next(it), next(it), next(it)
    m2_ref, m2u2_ref, m2u1_ref, m2d1_ref, m2d2_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    i = pl.program_id(0)
    tile = r1_ref.shape[0]
    cmid = r1_ref.shape[2]

    m2e = jnp.concatenate(
        [m2u2_ref[0:1], m2u1_ref[0:1], m2_ref[:], m2d1_ref[0:1], m2d2_ref[0:1]],
        axis=0,
    )  # rows r0-2 .. r0+tile+1

    if pool:
        # W-duplicated pooled cotangent; rows duplicate here (0.25 applied
        # exactly once — the forward's pool does the plain mean)
        dout_ref, doutup_ref, doutdown_ref = next(it), next(it), next(it)
        dpx = jnp.concatenate([doutup_ref[0:1], dout_ref[:], doutdown_ref[0:1]],
                              axis=0)
        r2 = dpx.shape[0]
        dy2 = jnp.broadcast_to(dpx[:, None, :, :], (r2, 2, w, cmid)).reshape(
            r2 * 2, w, cmid
        ) * jnp.asarray(0.25, dpx.dtype)
    else:
        # un-pooled output: the second activation's cotangent arrives at
        # full rows; the extended range needs real rows r0-2 .. r0+tile+1
        dout_ref, du2, du1, dd1, dd2 = next(it), next(it), next(it), next(it), next(it)
        dy2 = jnp.concatenate(
            [du2[0:1], du1[0:1], dout_ref[:], dd1[0:1], dd2[0:1]], axis=0
        )

    k1_ref, k2_ref = next(it), next(it)
    s_ref = next(it) if gram else None
    off_ref = next(it)
    dout2_ref = next(it)
    off = off_ref[0]  # global row index of array row 0 (nonzero under a mesh)

    if nchunks == 1:
        rows4 = jax.lax.broadcasted_iota(jnp.int32, dy2.shape, 0) + i * tile - 2 + off
        da2 = dy2.astype(jnp.float32) * m2e.astype(jnp.float32)
        da2 = jnp.where((rows4 < 0) | (rows4 >= true_h), 0.0, da2).astype(
            r1_ref.dtype
        )
    else:
        # pointwise in W: chunk so the fp32 product never exists full-width
        cw = w // nchunks
        cshape = (dy2.shape[0], cw, dy2.shape[2])
        rows4 = jax.lax.broadcasted_iota(jnp.int32, cshape, 0) + i * tile - 2 + off
        da2 = jnp.concatenate(
            [
                jnp.where(
                    (rows4 < 0) | (rows4 >= true_h),
                    0.0,
                    dy2[:, c0 : c0 + cw].astype(jnp.float32)
                    * m2e[:, c0 : c0 + cw].astype(jnp.float32),
                ).astype(r1_ref.dtype)
                for c0 in range(0, w, cw)
            ],
            axis=1,
        )

    r1e = jnp.concatenate([r1up_ref[0:1], r1_ref[:], r1down_ref[0:1]], axis=0)

    def post_b(acc, c0, c1):
        dr1 = acc
        r1c = r1e[:, c0:c1]
        if gram:
            f = r1c.reshape((tile + 2) * (c1 - c0), cmid)
            g = jax.lax.dot_general(
                f, s_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(tile + 2, c1 - c0, cmid)
            dr1 = dr1 + g
        gate = r1c.astype(jnp.float32) > 0.0
        dp = jnp.where(gate, dr1, 0.0)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, dp.shape, 0) + i * tile - 1 + off
        return jnp.where((rows2 < 0) | (rows2 >= true_h), 0.0, dp).astype(
            r1_ref.dtype
        )

    chunks = _conv_taps_w(
        da2, k2_ref, flip=True, contract_out=True, nchunks=nchunks, post=post_b
    )
    dpre1 = chunks[0] if nchunks == 1 else jnp.concatenate(chunks, axis=1)

    _conv_taps_w(
        dpre1, k1_ref, flip=True, contract_out=True, nchunks=nchunks,
        post=lambda acc, c0, c1: dout2_ref.__setitem__(
            (slice(None), slice(c0, c1)), acc.astype(dout2_ref.dtype)
        ),
    )


def _pad_rows(x, tile):
    h = x.shape[0]
    pad = (-h) % (2 * tile)
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _fwd(x2d, k1, b1, k2, b2, true_h, pool, gram, off=None, gram_rows=None,
         w_chunks=None):
    """``off`` (traced int32, default 0) is the GLOBAL row index of array
    row 0 — nonzero when ``x2d`` is a halo-extended mesh shard, so the
    edge-zeroing masks work in global coordinates. ``gram_rows`` is a
    static local-row window ``(lo, hi)`` restricting the Gram accumulation
    to the rows this shard owns (halo rows are the neighbour's).
    ``w_chunks`` overrides :func:`_w_chunks` (tests)."""
    h, w, cin = x2d.shape
    cmid = k1.shape[3]
    tile = _tile_for(w, cmid)
    nchunks = _w_chunks(w, cmid) if w_chunks is None else w_chunks
    if pool and nchunks > 1 and (w // nchunks) % 2:
        raise ValueError(
            f"pooling needs even W-chunks: W={w} / {nchunks} chunks is odd"
        )
    dt = x2d.dtype
    gram_lo, gram_hi = gram_rows if gram_rows is not None else (0, 1 << 30)
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    center = lambda i: (i, 0, 0)
    out_specs = [
        pl.BlockSpec(
            (tile // 2, w // 2, cmid) if pool else (tile, w, cmid),
            center, memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((tile, w, cmid), center, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, w, cmid), center, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(
            (h // 2, w // 2, cmid) if pool else (h, w, cmid), dt
        ),
        jax.ShapeDtypeStruct((h, w, cmid), dt),
        jax.ShapeDtypeStruct((h, w, cmid), jnp.int8),
    ]
    scratch = []
    if gram:
        out_specs.append(
            pl.BlockSpec((cmid, cmid), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((cmid, cmid), jnp.float32))
        scratch.append(pltpu.VMEM((cmid, cmid), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w, true_h=true_h, pool=pool, gram=gram,
                          gram_lo=gram_lo, gram_hi=gram_hi, nchunks=nchunks),
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, cin), center, memory_space=pltpu.VMEM),
            _row_halo(w, cin, h, lambda i: i * tile - 2),
            _row_halo(w, cin, h, lambda i: i * tile - 1),
            _row_halo(w, cin, h, lambda i: (i + 1) * tile),
            _row_halo(w, cin, h, lambda i: (i + 1) * tile + 1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # global row offset (1,)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cmid * (9 * cin + 9 * cmid + (cmid if gram else 0)),
            bytes_accessed=x2d.size * dt.itemsize + 3 * h * w * cmid * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        x2d, x2d, x2d, x2d, x2d,
        k1.astype(dt), b1.astype(dt).reshape(1, -1),
        k2.astype(dt), b2.astype(dt).reshape(1, -1),
        off_arr,
    )
    if gram:
        out, r1, mask2, gram128 = res
        return out, r1, mask2, gram128
    out, r1, mask2 = res
    return out, r1, mask2, None


def _bwd(r1, mask2, k1, k2, d_out, s, true_h, pool, gram, off=None,
         w_chunks=None):
    """``off`` as in :func:`_fwd`: the global row of array row 0, so the
    edge masks hold in global coordinates for halo-extended mesh shards."""
    h, w, cmid = r1.shape
    cin = k1.shape[2]
    tile = _tile_for(w, cmid, backward=True)
    nchunks = _w_chunks(w, cmid) if w_chunks is None else w_chunks
    dt = r1.dtype
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    center = lambda i: (i, 0, 0)
    if pool:
        dout = jnp.repeat(d_out, 2, axis=1).astype(dt)  # (h/2, w, cmid)
        dout_specs = [
            pl.BlockSpec((tile // 2, w, cmid), center, memory_space=pltpu.VMEM),
            _row_halo(w, cmid, h // 2, lambda i: i * (tile // 2) - 1),
            _row_halo(w, cmid, h // 2, lambda i: (i + 1) * (tile // 2)),
        ]
    else:
        dout = d_out.astype(dt)  # (h, w, cmid)
        dout_specs = [
            pl.BlockSpec((tile, w, cmid), center, memory_space=pltpu.VMEM),
            _row_halo(w, cmid, h, lambda i: i * tile - 2),
            _row_halo(w, cmid, h, lambda i: i * tile - 1),
            _row_halo(w, cmid, h, lambda i: (i + 1) * tile),
            _row_halo(w, cmid, h, lambda i: (i + 1) * tile + 1),
        ]
    in_specs = [
        pl.BlockSpec((tile, w, cmid), center, memory_space=pltpu.VMEM),
        _row_halo(w, cmid, h, lambda i: i * tile - 1),
        _row_halo(w, cmid, h, lambda i: (i + 1) * tile),
        pl.BlockSpec((tile, w, cmid), center, memory_space=pltpu.VMEM),
        _row_halo(w, cmid, h, lambda i: i * tile - 2),
        _row_halo(w, cmid, h, lambda i: i * tile - 1),
        _row_halo(w, cmid, h, lambda i: (i + 1) * tile),
        _row_halo(w, cmid, h, lambda i: (i + 1) * tile + 1),
        *dout_specs,
        pl.BlockSpec(memory_space=pltpu.VMEM),  # k1
        pl.BlockSpec(memory_space=pltpu.VMEM),  # k2
    ]
    args = [r1, r1, r1, mask2, mask2, mask2, mask2, mask2,
            *([dout] * len(dout_specs)), k1.astype(dt), k2.astype(dt)]
    if gram:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # S
        args.append(s.astype(dt))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # global row offset
    args.append(off_arr)
    din = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, true_h=true_h, pool=pool, gram=gram,
                          nchunks=nchunks),
        grid=(h // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, w, cin), center, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cin), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cmid * (9 * cin + 9 * cmid + (2 * cmid if gram else 0)),
            bytes_accessed=3 * h * w * cmid * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)
    return din


def make_conv_pair(*, pool: bool, gram: bool, w_chunks=None):
    """Build a custom-VJP fused conv pair with the given epilogues.

    Returned callable: ``f(x, k1, b1, k2, b2)`` with ``x`` (1, H, W, Cin),
    H and W even when ``pool``. Returns ``(out, gram)`` when ``gram`` else
    ``out`` — ``out`` is the pooled (1, H/2, W/2, Cmid) or full-resolution
    (1, H, W, Cmid) second activation, and ``gram`` is the FIRST conv's
    (Cmid, Cmid) fp32 Gram normalized by H*W. The backward differentiates
    w.r.t. ``x`` only (VGG weights are frozen in image optimization).
    ``w_chunks`` forces the W-chunk count (tests; default: auto per
    :func:`_w_chunks`).
    """

    @jax.custom_vjp
    def pair(x, k1, b1, k2, b2):
        out, _ = _pair_fwd_impl(x, k1, b1, k2, b2)
        return out

    def _pair_fwd_impl(x, k1, b1, k2, b2):
        n, h, w, cin = x.shape
        if n != 1 or (pool and (h % 2 or w % 2)):
            raise ValueError(f"conv pair expects (1, even H, even W, C), got {x.shape}")
        cmid = k1.shape[3]
        tile = _tile_for(w, cmid)
        out, r1, mask2, gram128 = _fwd(
            _pad_rows(x[0], tile), k1, b1, k2, b2, h, pool, gram,
            w_chunks=w_chunks,
        )
        out = out[None, : h // 2] if pool else out[None, :h]
        if gram:
            return (out, gram128 / jnp.float32(h * w)), (r1, mask2, k1, k2, h)
        return out, (r1, mask2, k1, k2, h)

    def pair_fwd(x, k1, b1, k2, b2):
        return _pair_fwd_impl(x, k1, b1, k2, b2)

    def pair_bwd(res, cts):
        r1, mask2, k1, k2, h = res
        w = r1.shape[1]
        if gram:
            d_out, d_gram = cts
            s = (d_gram + d_gram.T) / jnp.float32(h * w)
        else:
            d_out, s = cts, None
        dq = d_out[0]
        if r1.shape[0] != h:
            pad = r1.shape[0] - h
            dq = jnp.pad(dq, ((0, pad // 2 if pool else pad), (0, 0), (0, 0)))
        din = _bwd(r1, mask2, k1, k2, dq, s, h, pool, gram, w_chunks=w_chunks)
        cmid = k1.shape[3]
        return (din[None, :h], jnp.zeros_like(k1), jnp.zeros((cmid,), k1.dtype),
                jnp.zeros_like(k2), jnp.zeros((cmid,), k2.dtype))

    pair.defvjp(pair_fwd, pair_bwd)
    return pair


#: block-3 front pair: conv3_1+conv3_2 with the conv3_1 style Gram
pair_gram = make_conv_pair(pool=False, gram=True)
#: block-3 tail pair (and any plain segment): two convs + 2x2 average pool
pair_pool = make_conv_pair(pool=True, gram=False)


# ---------------------------------------------- conv pairs on a spatial mesh

HALO = 4  # rows of input halo each way: din rows [lo, hi) need dpre1
# [lo-1, hi], mask2/da2 [lo-2, hi+1], r1 [lo-3, hi+2], input [lo-4, hi+3]
# — the same reach as the packed block-1 kernel, and even-aligned for the
# 2x2 pool row pairing.


def _local_pair_fwd(x, k1, b1, k2, b2, *, axis, n_dev, pool, gram):
    """Per-device forward body (inside shard_map): 4-row ``ppermute`` input
    halos, the pair kernel over the extended rows in GLOBAL coordinates
    (``off``/``gram_rows``), center-sliced output, ``psum``'d Gram. Edge
    devices receive ppermute's zero fill; the kernel's global row masks
    turn exactly those rows into conv SAME padding."""
    _, h_l, w, _ = x.shape
    idx = jax.lax.axis_index(axis)
    up = jax.lax.ppermute(x[:, -HALO:], axis, [(i, i + 1) for i in range(n_dev - 1)])
    down = jax.lax.ppermute(x[:, :HALO], axis, [(i, i - 1) for i in range(1, n_dev)])
    xe = jnp.concatenate([up, x, down], axis=1)[0]  # (h_l + 8, W, Cin)
    off = idx * h_l - HALO
    cmid = k1.shape[3]
    out, r1, mask2, gram128 = _fwd(
        _pad_rows(xe, _tile_for(w, cmid)), k1, b1, k2, b2, n_dev * h_l,
        pool, gram, off=off, gram_rows=(HALO, HALO + h_l),
    )
    out_c = out[HALO // 2 : HALO // 2 + h_l // 2] if pool else out[HALO : HALO + h_l]
    rets = (out_c[None], r1, mask2)
    if gram:
        rets += (jax.lax.psum(gram128, axis),)
    return rets


def _local_pair_bwd(r1, mask2, d_out, s, k1, k2, *, axis, n_dev, pool, gram):
    """Per-device backward body: the stored residuals already cover the
    4-row extension, so only the output cotangent needs a halo ``ppermute``
    (one pooled row when ``pool``, two full rows otherwise); the in-kernel
    backward then writes the local input cotangent in one pass, center-
    sliced to the shard's own rows. Rows fed by the zero-filled extension
    edges only reach sliced-away outputs."""
    dq = d_out[0]
    h_l = dq.shape[0] * 2 if pool else dq.shape[0]
    idx = jax.lax.axis_index(axis)
    depth = 1 if pool else 2
    up = jax.lax.ppermute(dq[-depth:], axis, [(i, i + 1) for i in range(n_dev - 1)])
    down = jax.lax.ppermute(dq[:depth], axis, [(i, i - 1) for i in range(1, n_dev)])
    # cotangent rows aligned with the r1 extension: leading zeros cover the
    # extension rows beyond the halo's reach — they only influence din
    # rows outside the center slice.
    lead = HALO // 2 - 1 if pool else HALO - 2
    rows_tot = r1.shape[0] // 2 if pool else r1.shape[0]
    pad_tail = rows_tot - lead - 2 * depth - dq.shape[0]
    dqe = jnp.concatenate(
        [jnp.zeros((lead,) + dq.shape[1:], dq.dtype), up, dq, down,
         jnp.zeros((pad_tail,) + dq.shape[1:], dq.dtype)],
        axis=0,
    )
    off = idx * h_l - HALO
    din = _bwd(r1, mask2, k1, k2, dqe, s, n_dev * h_l, pool, gram, off=off)
    return din[HALO : HALO + h_l][None]


def make_sharded_pair(mesh, axis: str, *, pool: bool, gram: bool):
    """:func:`make_conv_pair` carried onto a 1-D spatial mesh.

    Returns a drop-in for the matching unsharded pair, for NHWC inputs
    sharded along H over ``mesh`` (``P(None, axis, None, None)``): each
    device runs the pair kernel on its own rows plus a 4-row ``ppermute``
    halo, Grams ``psum`` over ICI, and the custom VJP keeps the per-shard
    residuals sharded — the backward's only collective is a small halo
    exchange on the output cotangent (the Gram cotangent arrives
    replicated). Caller gates: N == 1, per-shard rows H / n_dev even and
    >= 4 (W even when ``pool``). Sharded == unsharded to accumulation
    tolerance (tests/test_sharding.py)."""
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.shape[axis])
    img = P(None, axis, None, None)
    rows = P(axis, None, None)
    kw = dict(axis=axis, n_dev=n_dev, pool=pool, gram=gram)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation (same situation as make_sharded_block1).
    body_fwd = jax.shard_map(
        functools.partial(_local_pair_fwd, **kw),
        mesh=mesh,
        in_specs=(img, P(), P(), P(), P()),
        out_specs=(img, rows, rows) + ((P(),) if gram else ()),
        check_vma=False,
    )
    if gram:
        bwd_body = functools.partial(_local_pair_bwd, **kw)
        bwd_in = (rows, rows, img, P(), P(), P())
    else:
        def bwd_body(r1, mask2, d_out, k1, k2):
            return _local_pair_bwd(r1, mask2, d_out, None, k1, k2, **kw)
        bwd_in = (rows, rows, img, P(), P())
    body_bwd = jax.shard_map(
        bwd_body, mesh=mesh, in_specs=bwd_in, out_specs=img, check_vma=False
    )

    def _check(x):
        n, h, w, _ = x.shape
        h_l = h // n_dev
        if n != 1 or h % n_dev or h_l % 2 or h_l < HALO or (pool and w % 2):
            raise ValueError(
                "sharded conv pair expects (1, H, W, C) with "
                f"H / {n_dev} even and >= {HALO}"
                f"{' and even W' if pool else ''}; got {x.shape}"
            )

    def _run_fwd(x, k1, b1, k2, b2):
        _check(x)
        res = body_fwd(x, k1, b1, k2, b2)
        out = (res[0], res[3] / jnp.float32(x.shape[1] * x.shape[2])) if gram \
            else res[0]
        return out, res[1], res[2]

    @jax.custom_vjp
    def sharded_pair(x, k1, b1, k2, b2):
        out, _, _ = _run_fwd(x, k1, b1, k2, b2)
        return out

    def fwd(x, k1, b1, k2, b2):
        out, r1, mask2 = _run_fwd(x, k1, b1, k2, b2)
        return out, (r1, mask2, k1, k2, x.shape[1], x.shape[2])

    def bwd(res, cts):
        r1, mask2, k1, k2, h, w = res
        if gram:
            d_out, d_gram = cts
            s = (d_gram + d_gram.T) / jnp.float32(h * w)
            din = body_bwd(r1, mask2, d_out, s, k1, k2)
        else:
            din = body_bwd(r1, mask2, cts, k1, k2)
        cmid = k1.shape[3]
        return (din, jnp.zeros_like(k1), jnp.zeros((cmid,), k1.dtype),
                jnp.zeros_like(k2), jnp.zeros((cmid,), k2.dtype))

    sharded_pair.defvjp(fwd, bwd)
    return sharded_pair
