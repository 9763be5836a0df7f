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

from style_transfer_tpu.ops.pallas.block1 import _conv_taps, _pool2x2
from style_transfer_tpu.ops.pallas.block1_packed import _row_halo, _tile_h


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_for(w: int, cmid: int, backward: bool = False) -> int:
    """Rows per grid step, normalized by the per-row VMEM cost ``w*cmid``
    (same budget the packed block-1 tile table encodes at w*128/64)."""
    return _tile_h(w * cmid // 64, backward)


def _fwd_kernel(p_ref, pu2_ref, pu1_ref, pd1_ref, pd2_ref, k1_ref, b1_ref,
                k2_ref, b2_ref, out_ref, r1_ref, mask2_ref, *refs,
                w, true_h, pool, gram):
    i = pl.program_id(0)
    tile = p_ref.shape[0]
    cmid = r1_ref.shape[2]
    if gram:
        gram_ref, acc_ref = refs

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    # input rows r0-2 .. r0+tile+1; out-of-range rows zeroed (SAME padding
    # semantics + edge-clamped halo garbage)
    pe = jnp.concatenate(
        [pu2_ref[0:1], pu1_ref[0:1], p_ref[:], pd1_ref[0:1], pd2_ref[0:1]],
        axis=0,
    )
    rows4 = jax.lax.broadcasted_iota(jnp.int32, pe.shape, 0) + i * tile - 2
    pe = jnp.where((rows4 < 0) | (rows4 >= true_h), 0.0, pe)

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
    if pool:
        out_ref[:] = _pool2x2(y2, tile, w, y2.shape[2]).astype(out_ref.dtype)
    else:
        out_ref[:] = y2.astype(out_ref.dtype)

    if gram:
        f = r1.reshape(tile * w, cmid)
        acc_ref[:] += jax.lax.dot_general(
            f, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            gram_ref[:] = acc_ref[:]


def _bwd_kernel(*refs, w, true_h, pool, gram):
    """Input cotangent for one tile: [unpool ->] conv_b ReLU gate ->
    transposed conv_b taps on rows r0-1 .. r0+tile [-> + Gram term] ->
    conv_a ReLU gate -> transposed conv_a taps.

    Ref order: r1, r1 up/down halos, mask2, mask2 u2/u1/d1/d2 halos, then
    the output-cotangent refs (pooled: center + 1-pooled-row halos, giving
    rows r0-2..r0+tile+1 after unpooling; un-pooled: center + u2/u1/d1/d2
    single-row halos), k1, k2, [S], and the input-cotangent output ref.
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
    dout2_ref = next(it)

    rows4 = jax.lax.broadcasted_iota(jnp.int32, dy2.shape, 0) + i * tile - 2
    da2 = dy2.astype(jnp.float32) * m2e.astype(jnp.float32)
    da2 = jnp.where((rows4 < 0) | (rows4 >= true_h), 0.0, da2).astype(r1_ref.dtype)

    dr1 = _conv_taps(da2, k2_ref, flip=True, contract_out=True)  # (tile+2,) fp32
    r1e = jnp.concatenate([r1up_ref[0:1], r1_ref[:], r1down_ref[0:1]], axis=0)
    if gram:
        f = r1e.reshape((tile + 2) * w, cmid)
        g = jax.lax.dot_general(
            f, s_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tile + 2, w, cmid)
        dr1 = dr1 + g
    gate = r1e.astype(jnp.float32) > 0.0
    dpre1 = jnp.where(gate, dr1, 0.0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, dpre1.shape, 0) + i * tile - 1
    dpre1 = jnp.where(
        (rows2 < 0) | (rows2 >= true_h), 0.0, dpre1
    ).astype(r1_ref.dtype)

    dout2_ref[:] = _conv_taps(
        dpre1, k1_ref, flip=True, contract_out=True
    ).astype(dout2_ref.dtype)


def _pad_rows(x, tile):
    h = x.shape[0]
    pad = (-h) % (2 * tile)
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _fwd(x2d, k1, b1, k2, b2, true_h, pool, gram):
    h, w, cin = x2d.shape
    cmid = k1.shape[3]
    tile = _tile_for(w, cmid)
    dt = x2d.dtype
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
        functools.partial(_fwd_kernel, w=w, true_h=true_h, pool=pool, gram=gram),
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
    )
    if gram:
        out, r1, mask2, gram128 = res
        return out, r1, mask2, gram128
    out, r1, mask2 = res
    return out, r1, mask2, None


def _bwd(r1, mask2, k1, k2, d_out, s, true_h, pool, gram):
    h, w, cmid = r1.shape
    cin = k1.shape[2]
    tile = _tile_for(w, cmid, backward=True)
    dt = r1.dtype
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
    din = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, true_h=true_h, pool=pool, gram=gram),
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


def make_conv_pair(*, pool: bool, gram: bool):
    """Build a custom-VJP fused conv pair with the given epilogues.

    Returned callable: ``f(x, k1, b1, k2, b2)`` with ``x`` (1, H, W, Cin),
    H and W even when ``pool``. Returns ``(out, gram)`` when ``gram`` else
    ``out`` — ``out`` is the pooled (1, H/2, W/2, Cmid) or full-resolution
    (1, H, W, Cmid) second activation, and ``gram`` is the FIRST conv's
    (Cmid, Cmid) fp32 Gram normalized by H*W. The backward differentiates
    w.r.t. ``x`` only (VGG weights are frozen in image optimization).
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
            _pad_rows(x[0], tile), k1, b1, k2, b2, h, pool, gram
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
        din = _bwd(r1, mask2, k1, k2, dq, s, h, pool, gram)
        cmid = k1.shape[3]
        return (din[None, :h], jnp.zeros_like(k1), jnp.zeros((cmid,), k1.dtype),
                jnp.zeros_like(k2), jnp.zeros((cmid,), k2.dtype))

    pair.defvjp(pair_fwd, pair_bwd)
    return pair


#: block-3 front pair: conv3_1+conv3_2 with the conv3_1 style Gram
pair_gram = make_conv_pair(pool=False, gram=True)
#: block-3 tail pair (and any plain segment): two convs + 2x2 average pool
pair_pool = make_conv_pair(pool=True, gram=False)
