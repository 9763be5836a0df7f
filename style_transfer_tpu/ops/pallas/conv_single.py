"""Fused single 3x3 conv (+ReLU, optional 2x2 average pool, optional
Gram) — the narrow-VMEM decomposition of the conv-pair kernels.

Why this exists: the pair kernels (``conv_pair.py``, ``block2.py``) hold
BOTH 3x3 weight stacks plus a two-conv body in scoped VMEM. Measured on
v5e, that envelope overflows the 16 MB scoped-VMEM budget at the 4096px
scale's block shapes — the block-4 pair forward needs 17.83 MB at
(1, 512, 512, 512) (both bf16[3,3,512,512] stacks are ~9.4 MB on their
own), and the block-2 pair backward needs 17.70 MB at (1, 2048, 2048, 64)
(the two-conv transposed body: ~15 MB of live full-width rows). One conv
per pass halves both: a single weight stack, a one-conv body, and no
int8 ReLU-mask residual (the gate recomputes from the stored activation,
``y > 0``).

A chain of singles keeps the pair chain's load-bearing property — a
Pallas custom call consumes and produces row-major operands, so a
custom-call-to-custom-call seam needs no XLA relayout — and its HBM
traffic is within ~15% of the pair's (the pair also writes its first
activation and a mask as backward residuals; the single writes the
activation it computed anyway). Dispatch (``api.StyleTransfer``) uses
pairs where they fit and singles where only they do, per the byte model
in ``ops/pallas/vmem.py``.

Structure per tile (1-row halos; mesh shards add a 2-row ``ppermute``
halo — see ``HALO``):

    forward:  input rows (±1 halo, zeroed outside the true image) ->
              9 taps in W-chunks -> +bias, ReLU, edge-zeroed ->
              activation written (the backward residual and, when not
              pooling, the output) [-> 2x2 average pool] [-> Gram
              accumulated as a Cout-wide syrk over owned rows].
    backward: [unpool ->] (+ y @ S Gram term) -> ReLU gate (y > 0) ->
              edge-zeroed -> transposed taps in W-chunks -> input
              cotangent, one pass.

Checked against the jnp oracle in ``tests/test_conv_single.py``
(interpret mode off-TPU). The reference computes every conv inside
Caffe's cuDNN kernels with no fusion at all (SURVEY.md section 2 rows
8/15, reconstructed).
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
    _taps_w,
    _w_chunks,
)
from style_transfer_tpu.ops.pallas.conv_pair import _pad_rows, _tile_for


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(p_ref, pu_ref, pd_ref, k_ref, b_ref, off_ref, *refs,
                w, true_h, pool, gram, gram_lo, gram_hi, gram_clo,
                gram_chi, nchunks):
    i = pl.program_id(0)
    tile = p_ref.shape[0]
    it = iter(refs)
    y_ref = next(it)
    pool_ref = next(it) if pool else None
    if gram:
        gram_ref, acc_ref = next(it), next(it)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    cout = y_ref.shape[2]
    off = off_ref[0]  # global row index of array row 0 (nonzero under a mesh)

    # input rows r0-1 .. r0+tile; rows outside the true image (GLOBAL
    # coordinates) zeroed (SAME padding + edge-clamped halo garbage)
    pe = jnp.concatenate([pu_ref[0:1], p_ref[:], pd_ref[0:1]], axis=0)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, pe.shape, 0) + i * tile - 1 + off
    pe = jnp.where((rows1 < 0) | (rows1 >= true_h), 0.0, pe)

    def post(acc, c0, c1):
        y = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
        rows0 = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + i * tile + off
        y = jnp.where((rows0 < 0) | (rows0 >= true_h), 0.0, y)
        yc = y.astype(y_ref.dtype)
        y_ref[:, c0:c1] = yc
        if pool:
            pool_ref[:, c0 // 2 : c1 // 2] = _pool2x2(
                y, tile, c1 - c0, cout
            ).astype(pool_ref.dtype)
    _taps_w(pe, k_ref, flip=False, contract_out=False, nchunks=nchunks,
            post=post)

    if gram:
        # Full-width syrk AFTER the chunked taps (reading the activation
        # back from the just-written output ref) so the pixel-axis
        # contraction order is independent of nchunks — the same
        # bit-identity contract as the pair kernels. Under a mesh only
        # rows in the static LOCAL-row window [gram_lo, gram_hi)
        # contribute — halo rows are the neighbour's.
        fr = y_ref[:]
        if gram_lo > 0 or gram_hi < (1 << 30):
            lrow = jax.lax.broadcasted_iota(jnp.int32, fr.shape, 0) + i * tile
            fr = jnp.where((lrow < gram_lo) | (lrow >= gram_hi), 0, fr)
        if gram_clo > 0 or gram_chi < (1 << 30):
            # W-tiled dispatch: halo COLUMNS are the neighbour slice's —
            # only the owned local-column window contributes to the Gram
            # (the row window's exact analogue on the W axis).
            lcol = jax.lax.broadcasted_iota(jnp.int32, fr.shape, 1)
            fr = jnp.where((lcol < gram_clo) | (lcol >= gram_chi), 0, fr)
        f = fr.reshape(tile * w, cout)
        acc_ref[:] += jax.lax.dot_general(
            f, f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            gram_ref[:] = acc_ref[:]


def _bwd_kernel(*refs, w, true_h, pool, gram, gram_clo, gram_chi, nchunks):
    """Input cotangent for one tile: [unpool ->] (+ Gram term) -> ReLU
    gate from the stored activation -> transposed taps.

    Ref order: y (center + 1-row up/down halos), then the output
    cotangent (pooled: center + 1-pooled-row halos, W-duplicated by the
    caller; un-pooled: center + 1-row halos), k, [S], the global row
    offset (SMEM), and the input-cotangent output ref.

    ``gram_clo``/``gram_chi``: the forward's LOCAL-column Gram ownership
    window (W-tiled dispatch). The forward Gram summed only owned
    columns, so the ``S @ f`` term must vanish on halo columns here too —
    the wide wrapper overlap-SUMS per-slice input cotangents (each
    owned column's full dpre is computed exactly once, in its owner
    slice), and an unmasked halo Gram term would be double-counted.
    """
    it = iter(refs)
    y_ref, yu_ref, yd_ref = next(it), next(it), next(it)
    i = pl.program_id(0)
    tile = y_ref.shape[0]
    cout = y_ref.shape[2]

    ye = jnp.concatenate([yu_ref[0:1], y_ref[:], yd_ref[0:1]], axis=0)

    if pool:
        # W-duplicated pooled cotangent; rows duplicate here (0.25 applied
        # exactly once — the forward's pool does the plain mean). The
        # broadcast covers rows r0-2 .. r0+tile+1; the conv reach only
        # needs r0-1 .. r0+tile, so the outer rows are sliced away.
        dp_ref, dpu_ref, dpd_ref = next(it), next(it), next(it)
        dpx = jnp.concatenate([dpu_ref[0:1], dp_ref[:], dpd_ref[0:1]], axis=0)
        r2 = dpx.shape[0]
        de = jnp.broadcast_to(dpx[:, None, :, :], (r2, 2, w, cout)).reshape(
            r2 * 2, w, cout
        )[1:-1] * jnp.asarray(0.25, dpx.dtype)
    else:
        d_ref, du_ref, dd_ref = next(it), next(it), next(it)
        de = jnp.concatenate([du_ref[0:1], d_ref[:], dd_ref[0:1]], axis=0)

    k_ref = next(it)
    s_ref = next(it) if gram else None
    off_ref = next(it)
    dx_ref = next(it)
    off = off_ref[0]  # global row index of array row 0 (nonzero under a mesh)

    # dpre on rows r0-1 .. r0+tile, chunked so no full-width fp32 exists
    cw = w // nchunks

    def chunk(c0):
        yc = ye[:, c0 : c0 + cw]
        d = de[:, c0 : c0 + cw].astype(jnp.float32)
        if gram:
            yg = yc
            if gram_clo > 0 or gram_chi < (1 << 30):
                lcol = jax.lax.broadcasted_iota(jnp.int32, yc.shape, 1) + c0
                yg = jnp.where(
                    (lcol < gram_clo) | (lcol >= gram_chi),
                    jnp.zeros_like(yc), yc,
                )
            f = yg.reshape((tile + 2) * cw, cout)
            d = d + jax.lax.dot_general(
                f, s_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(tile + 2, cw, cout)
        d = jnp.where(yc.astype(jnp.float32) > 0.0, d, 0.0)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + i * tile - 1 + off
        return jnp.where((rows1 < 0) | (rows1 >= true_h), 0.0, d).astype(
            y_ref.dtype
        )

    if nchunks == 1:
        dpre = chunk(0)
    else:
        dpre = jnp.concatenate([chunk(c0) for c0 in range(0, w, cw)], axis=1)

    _taps_w(
        dpre, k_ref, flip=True, contract_out=True, nchunks=nchunks,
        post=lambda acc, c0, c1: dx_ref.__setitem__(
            (slice(None), slice(c0, c1)), acc.astype(dx_ref.dtype)
        ),
    )


def _fwd(x2d, k, b, true_h, pool, gram, off=None, gram_rows=None,
         w_chunks=None, gram_cols=None):
    """``off``/``gram_rows`` as in ``conv_pair._fwd``: the global row of
    array row 0 and the static local-row Gram ownership window for
    halo-extended mesh shards. ``gram_cols`` is the same ownership window
    on the LOCAL COLUMN axis, for the W-tiled dispatch
    (:func:`make_wide_single`) whose slices carry halo columns.
    ``w_chunks`` overrides :func:`_w_chunks` (tests)."""
    h, w, cin = x2d.shape
    cout = k.shape[3]
    tile = _tile_for(w, cout)
    nchunks = _w_chunks(w, cout) if w_chunks is None else w_chunks
    if pool and nchunks > 1 and (w // nchunks) % 2:
        raise ValueError(
            f"pooling needs even W-chunks: W={w} / {nchunks} chunks is odd"
        )
    dt = x2d.dtype
    gram_lo, gram_hi = gram_rows if gram_rows is not None else (0, 1 << 30)
    gram_clo, gram_chi = gram_cols if gram_cols is not None else (0, 1 << 30)
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    center = lambda i: (i, 0, 0)
    out_specs = [
        pl.BlockSpec((tile, w, cout), center, memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((h, w, cout), dt)]
    if pool:
        out_specs.append(
            pl.BlockSpec((tile // 2, w // 2, cout), center,
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((h // 2, w // 2, cout), dt))
    scratch = []
    if gram:
        out_specs.append(
            pl.BlockSpec((cout, cout), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((cout, cout), jnp.float32))
        scratch.append(pltpu.VMEM((cout, cout), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w, true_h=true_h, pool=pool,
                          gram=gram, gram_lo=gram_lo, gram_hi=gram_hi,
                          gram_clo=gram_clo, gram_chi=gram_chi,
                          nchunks=nchunks),
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, cin), center, memory_space=pltpu.VMEM),
            _row_halo(w, cin, h, lambda i: i * tile - 1),
            _row_halo(w, cin, h, lambda i: (i + 1) * tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # global row offset (1,)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cout * (9 * cin + (cout if gram else 0)),
            bytes_accessed=x2d.size * dt.itemsize + h * w * cout * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x2d, x2d, x2d, k.astype(dt), b.astype(dt).reshape(1, -1), off_arr)
    y = res[0]
    out = res[1] if pool else y
    g = res[-1] if gram else None
    return out, y, g


def _bwd(y, k, d_out, s, true_h, pool, gram, off=None, w_chunks=None,
         gram_cols=None):
    """``off`` as in :func:`_fwd`: the global row of array row 0, so the
    edge masks hold in global coordinates for halo-extended mesh shards;
    ``gram_cols`` as in :func:`_fwd` (the ``S @ f`` term is masked to the
    owned columns, matching the forward's Gram window)."""
    h, w, cout = y.shape
    cin = k.shape[2]
    tile = _tile_for(w, cout, backward=True)
    nchunks = _w_chunks(w, cout) if w_chunks is None else w_chunks
    dt = y.dtype
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    center = lambda i: (i, 0, 0)
    if pool:
        dout = jnp.repeat(d_out, 2, axis=1).astype(dt)  # (h/2, w, cout)
        dout_specs = [
            pl.BlockSpec((tile // 2, w, cout), center, memory_space=pltpu.VMEM),
            _row_halo(w, cout, h // 2, lambda i: i * (tile // 2) - 1),
            _row_halo(w, cout, h // 2, lambda i: (i + 1) * (tile // 2)),
        ]
    else:
        dout = d_out.astype(dt)
        dout_specs = [
            pl.BlockSpec((tile, w, cout), center, memory_space=pltpu.VMEM),
            _row_halo(w, cout, h, lambda i: i * tile - 1),
            _row_halo(w, cout, h, lambda i: (i + 1) * tile),
        ]
    in_specs = [
        pl.BlockSpec((tile, w, cout), center, memory_space=pltpu.VMEM),
        _row_halo(w, cout, h, lambda i: i * tile - 1),
        _row_halo(w, cout, h, lambda i: (i + 1) * tile),
        *dout_specs,
        pl.BlockSpec(memory_space=pltpu.VMEM),  # k
    ]
    args = [y, y, y, *([dout] * 3), k.astype(dt)]
    if gram:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # S
        args.append(s.astype(dt))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(off_arr)
    gram_clo, gram_chi = gram_cols if gram_cols is not None else (0, 1 << 30)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, true_h=true_h, pool=pool,
                          gram=gram, gram_clo=gram_clo, gram_chi=gram_chi,
                          nchunks=nchunks),
        grid=(h // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, w, cin), center, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cin), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cout * (9 * cin + (2 * cout if gram else 0)),
            bytes_accessed=2 * h * w * cout * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)
    return dx


def make_conv_single(*, pool: bool, gram: bool, w_chunks=None,
                     gram_cols=None):
    """Build a custom-VJP fused single conv with the given epilogues.

    Returned callable: ``f(x, k, b)`` with ``x`` (1, H, W, Cin), H and W
    even when ``pool``. Returns ``(out, gram)`` when ``gram`` else
    ``out`` — ``out`` is the pooled (1, H/2, W/2, Cout) or full
    (1, H, W, Cout) activation, and ``gram`` is the (Cout, Cout) fp32
    Gram of the PRE-pool activation normalized by H*W. The backward
    differentiates w.r.t. ``x`` only: VGG weights are frozen in image
    optimization, and the weight/bias cotangents are structural ZEROS
    (the documented contract, pinned by tests/test_weight_grads.py — a
    caller training through this kernel sees exactly-zero weight
    gradients, not silent garbage). ``w_chunks`` forces the W-chunk
    count (tests). ``gram_cols`` restricts the Gram to a LOCAL column
    window (the W-tiled dispatch's ownership mask — see
    :func:`make_wide_single`); the Gram stays normalized by the local
    H*W, so the wide wrapper rescales.
    """

    @jax.custom_vjp
    def single(x, k, b):
        out, _ = _single_fwd_impl(x, k, b)
        return out

    def _single_fwd_impl(x, k, b):
        n, h, w, cin = x.shape
        if n != 1 or (pool and (h % 2 or w % 2)):
            raise ValueError(
                f"conv single expects (1, even H, even W, C), got {x.shape}"
            )
        cout = k.shape[3]
        tile = _tile_for(w, cout)
        out, y, g = _fwd(
            _pad_rows(x[0], tile), k, b, h, pool, gram, w_chunks=w_chunks,
            gram_cols=gram_cols,
        )
        out = out[None, : h // 2] if pool else out[None, :h]
        if gram:
            return (out, g / jnp.float32(h * w)), (y, k, h)
        return out, (y, k, h)

    def fwd(x, k, b):
        return _single_fwd_impl(x, k, b)

    def bwd(res, cts):
        y, k, h = res
        w = y.shape[1]
        if gram:
            d_out, d_gram = cts
            s = (d_gram + d_gram.T) / jnp.float32(h * w)
        else:
            d_out, s = cts, None
        dq = d_out[0]
        if y.shape[0] != h:
            pad = y.shape[0] - h
            dq = jnp.pad(dq, ((0, pad // 2 if pool else pad), (0, 0), (0, 0)))
        dx = _bwd(y, k, dq, s, h, pool, gram, w_chunks=w_chunks,
                  gram_cols=gram_cols)
        cout = k.shape[3]
        return dx[None, :h], jnp.zeros_like(k), jnp.zeros((cout,), k.dtype)

    single.defvjp(fwd, bwd)
    return single


#: plain fused conv (chain interior)
single_plain = make_conv_single(pool=False, gram=False)
#: first conv of a block: its activation feeds on AND its Gram is a style
#: target (conv2_1/conv3_1/conv4_1)
single_gram = make_conv_single(pool=False, gram=True)
#: last conv of a block: conv + ReLU + 2x2 average pool
single_pool = make_conv_single(pool=True, gram=False)


def gram_tail(x, k, b):
    """W-chunked conv+Gram: ``conv_gram.py``'s contract — (1, H, W, Cin)
    -> (Cout, Cout) fp32 Gram of relu(conv(x)+b), input gradient only —
    delivered by the single kernel with the activation output discarded.
    ``conv_gram.py`` has no W-chunked form, so its envelope ends at
    eff = w*cout/64 = 2048 (an 8192px run's conv5_1 sits at eff 4096);
    the single kernel W-chunks its fp32 tap accumulators and covers
    eff <= 4096 (``vmem.single_fits``). The discarded activation costs
    nothing extra: with ``pool=False`` the output IS the backward
    residual the kernel writes anyway, and its zero cotangent folds into
    the backward's Gram term."""
    return single_gram(x, k, b)[1]


def make_sharded_gram_tail(mesh, axis: str):
    """:func:`gram_tail` on a 1-D spatial mesh (the W-chunked analogue of
    ``conv_gram.make_sharded_conv_gram``)."""
    fn = make_sharded_single(mesh, axis, pool=False, gram=True)

    def sharded_gram_tail(x, k, b):
        return fn(x, k, b)[1]

    return sharded_gram_tail


def make_pair_of_singles(*, pool: bool, gram: bool, mesh=None, axis=None):
    """A drop-in for ``conv_pair.make_conv_pair`` built from two single
    kernels — same signature ``f(x, k1, b1, k2, b2)``, same outputs
    (``(out, gram)`` when ``gram`` else ``out``) — used by the api
    dispatch at shapes where the pair kernel's scoped-VMEM envelope
    doesn't fit but the singles' does (``ops/pallas/vmem.py``). The
    singles seam is Pallas-to-Pallas (row-major both sides), so no XLA
    relayout appears between them; the intermediate activation makes one
    extra HBM round trip, which the single's dropped int8-mask residual
    mostly pays back."""
    if mesh is None:
        first = single_gram if gram else single_plain
        second = single_pool if pool else single_plain
    else:
        first = make_sharded_single(mesh, axis, pool=False, gram=gram)
        second = make_sharded_single(mesh, axis, pool=pool, gram=False)

    def pair(x, k1, b1, k2, b2):
        if gram:
            y1, g = first(x, k1, b1)
            return second(y1, k2, b2), g
        return second(first(x, k1, b1), k2, b2)

    return pair


# ------------------------------------------------------- W-tiled dispatch


def make_wide_single(*, pool: bool, gram: bool, mesh=None, axis=None,
                     slices=None):
    """A single conv W-TILED at the JAX level — coverage beyond the
    single kernel's eff-4096 scoped-VMEM envelope (the 5120..8192px
    ladders' block shapes, which the probe table in ``vmem.py`` shows
    failing at 16.5-20 MB).

    Same contract as :func:`make_conv_single`. W splits into
    ``vmem.wide_slices`` slices of ``vmem.wide_owned`` owned columns,
    each extended by ``vmem.WIDE_HALO`` halo columns per side (zero at
    true image edges, where zero IS the conv's SAME padding; the tail
    slice's grid-rounding surplus is zero too). Each slice runs the
    plain single kernel — back inside the measured envelope — and the
    wrapper stitches:

    - activations: halo output columns are discarded (the outermost
      slice column sees the kernel's own SAME-padded slice edge, wrong
      for an interior seam; the conv reach is 1 column, so the 8-column
      halo has 7 to spare) and owned spans concatenate exactly.
    - Gram: each slice masks its accumulation to its OWNED column
      window (``gram_cols``) in BOTH directions, so every column
      contributes exactly once; the wrapper rescales the per-slice
      ``h * slice_w`` normalization onto the global ``h * w``.
    - input cotangent: reverse-mode through the pad/slice/concat
      overlap-SUMS per-slice ``dx``. Each owned column's full ``dpre``
      (output cotangent + Gram term, both zero on non-owned columns —
      the output cotangent because halo outputs were discarded, the
      Gram term because the backward masks ``S @ f`` to the same owned
      window) is computed exactly once, in its owner slice, and its
      3-tap reach lands inside that slice's halo, so the summed
      overlaps reproduce the unsliced cotangent.

    ``slices`` forces the slice count (tests; production counts come
    from the vmem gate). A count of 1 (or a shape the gate covers with
    the plain single) degenerates to the unsliced kernel. With ``mesh``
    the per-slice kernels are the H-sharded ones
    (:func:`make_sharded_single`) — W tiling composes with the spatial
    mesh because the two act on different axes.
    """
    from style_transfer_tpu.ops.pallas import vmem as VM

    def _build(window):
        gc = window if gram else None
        if mesh is None:
            return make_conv_single(pool=pool, gram=gram, gram_cols=gc)
        return make_sharded_single(mesh, axis, pool=pool, gram=gram,
                                   gram_cols=gc)

    def wide(x, k, b):
        _, h, w, cin = x.shape
        cout = k.shape[3]
        n = slices
        if n is None:
            n = VM.wide_slices(w, cin, cout, pool=pool, gram=gram)
        if n is None or n == 1:
            return _build(None)(x, k, b)
        hw = VM.WIDE_HALO
        ow = VM.wide_owned(w, n)
        xe = jnp.pad(x, ((0, 0), (0, 0), (hw, n * ow - w + hw), (0, 0)))
        interior = _build((hw, hw + ow))
        last_owned = w - (n - 1) * ow
        final = interior if last_owned == ow else _build((hw, hw + last_owned))
        outs, grams = [], []
        lo = hw // 2 if pool else hw
        span = ow // 2 if pool else ow
        for j in range(n):
            xs = jax.lax.slice_in_dim(xe, j * ow, j * ow + ow + 2 * hw, axis=2)
            r = (final if j == n - 1 else interior)(xs, k, b)
            o, g = r if gram else (r, None)
            outs.append(o[:, :, lo : lo + span])
            if gram:
                grams.append(g)
        out = jnp.concatenate(outs, axis=2)[:, :, : (w // 2 if pool else w)]
        if not gram:
            return out
        gt = grams[0]
        for g_ in grams[1:]:
            gt = gt + g_
        # per-slice kernels normalized by h * slice_w; global is h * w
        return out, gt * (jnp.float32(ow + 2 * hw) / jnp.float32(w))

    return wide


def make_wide_pair_of_singles(*, pool: bool, gram: bool, mesh=None,
                              axis=None, slices=None):
    """:func:`make_pair_of_singles` built from two W-tiled singles — the
    ``'wide'`` arm of ``vmem.segment_impl``, for two-conv block segments
    beyond the single envelope (eff > 4096). Each conv picks its own
    slice count (a conv the plain single covers runs unsliced)."""
    first = make_wide_single(pool=False, gram=gram, mesh=mesh, axis=axis,
                             slices=slices)
    second = make_wide_single(pool=pool, gram=False, mesh=mesh, axis=axis,
                              slices=slices)

    def pair(x, k1, b1, k2, b2):
        if gram:
            y1, g = first(x, k1, b1)
            return second(y1, k2, b2), g
        return second(first(x, k1, b1), k2, b2)

    return pair


# ------------------------------------------- single convs on a spatial mesh

HALO = 2  # rows of input halo each way: dx rows [lo, hi) need dpre
# [lo-1, hi], y/dout [lo-1, hi], input [lo-2, hi+1] — plus the clamped-
# edge-garbage margin row (see conv_gram.HALO for the aliasing argument),
# and 2 keeps the extension even-aligned for the 2x2 pool row pairing.


def _local_single_fwd(x, k, b, *, axis, n_dev, pool, gram, gram_cols=None):
    """Per-device forward body (inside shard_map): 2-row ``ppermute``
    input halos, the kernel over the extended rows in GLOBAL coordinates,
    center-sliced output, ``psum``'d Gram. Edge devices receive
    ppermute's zero fill; the kernel's global row masks turn exactly
    those rows into conv SAME padding."""
    _, h_l, w, _ = x.shape
    idx = jax.lax.axis_index(axis)
    up = jax.lax.ppermute(x[:, -HALO:], axis, [(i, i + 1) for i in range(n_dev - 1)])
    down = jax.lax.ppermute(x[:, :HALO], axis, [(i, i - 1) for i in range(1, n_dev)])
    xe = jnp.concatenate([up, x, down], axis=1)[0]  # (h_l + 4, W, Cin)
    off = idx * h_l - HALO
    cout = k.shape[3]
    out, y, g = _fwd(
        _pad_rows(xe, _tile_for(w, cout)), k, b, n_dev * h_l, pool, gram,
        off=off, gram_rows=(HALO, HALO + h_l), gram_cols=gram_cols,
    )
    out_c = out[HALO // 2 : HALO // 2 + h_l // 2] if pool else out[HALO : HALO + h_l]
    rets = (out_c[None], y)
    if gram:
        rets += (jax.lax.psum(g, axis),)
    return rets


def _local_single_bwd(y, d_out, s, k, *, axis, n_dev, pool, gram,
                      gram_cols=None):
    """Per-device backward body: the stored activation already covers the
    2-row extension, so only the output cotangent needs a halo
    ``ppermute`` (one pooled row when ``pool``, one full row otherwise);
    the kernel writes the local input cotangent in one pass, center-
    sliced to the shard's own rows. Rows fed by the zero-filled extension
    edges only reach sliced-away outputs."""
    dq = d_out[0]
    h_l = dq.shape[0] * 2 if pool else dq.shape[0]
    depth = 1
    up = jax.lax.ppermute(dq[-depth:], axis, [(i, i + 1) for i in range(n_dev - 1)])
    down = jax.lax.ppermute(dq[:depth], axis, [(i, i - 1) for i in range(1, n_dev)])
    # cotangent rows aligned with the y extension: leading/trailing zeros
    # cover extension rows beyond the halo's reach — they only influence
    # dx rows outside the center slice.
    lead = HALO // 2 - depth if pool else HALO - depth
    rows_tot = y.shape[0] // 2 if pool else y.shape[0]
    pad_tail = rows_tot - lead - 2 * depth - dq.shape[0]
    dqe = jnp.concatenate(
        [jnp.zeros((lead,) + dq.shape[1:], dq.dtype), up, dq, down,
         jnp.zeros((pad_tail,) + dq.shape[1:], dq.dtype)],
        axis=0,
    )
    idx = jax.lax.axis_index(axis)
    off = idx * h_l - HALO
    dx = _bwd(y, k, dqe, s, n_dev * h_l, pool, gram, off=off,
              gram_cols=gram_cols)
    return dx[HALO : HALO + h_l][None]


def make_sharded_single(mesh, axis: str, *, pool: bool, gram: bool,
                        gram_cols=None):
    """:func:`make_conv_single` carried onto a 1-D spatial mesh.

    Returns a drop-in for the matching unsharded single, for NHWC inputs
    sharded along H over ``mesh`` (``P(None, axis, None, None)``): each
    device runs the kernel on its own rows plus a 2-row ``ppermute``
    halo, Grams ``psum`` over ICI, and the custom VJP keeps the per-shard
    activation residual sharded — the backward's only collective is a
    small halo exchange on the output cotangent (the Gram cotangent
    arrives replicated). Caller gates: N == 1, per-shard rows H / n_dev
    even and >= 2 (W even when ``pool``). Sharded == unsharded to
    accumulation tolerance (tests/test_conv_single.py)."""
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.shape[axis])
    img = P(None, axis, None, None)
    rows = P(axis, None, None)
    kw = dict(axis=axis, n_dev=n_dev, pool=pool, gram=gram)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation (same situation as make_sharded_pair).
    body_fwd = jax.shard_map(
        functools.partial(_local_single_fwd, gram_cols=gram_cols, **kw),
        mesh=mesh,
        in_specs=(img, P(), P()),
        out_specs=(img, rows) + ((P(),) if gram else ()),
        check_vma=False,
    )
    if gram:
        bwd_body = functools.partial(
            _local_single_bwd, gram_cols=gram_cols, **kw
        )
        bwd_in = (rows, img, P(), P())
    else:
        def bwd_body(y, d_out, k):
            return _local_single_bwd(y, d_out, None, k, **kw)
        bwd_in = (rows, img, P())
    body_bwd = jax.shard_map(
        bwd_body, mesh=mesh, in_specs=bwd_in, out_specs=img, check_vma=False
    )

    def _check(x):
        n, h, w, _ = x.shape
        h_l = h // n_dev
        if n != 1 or h % n_dev or h_l % 2 or h_l < HALO or (pool and w % 2):
            raise ValueError(
                "sharded conv single expects (1, H, W, C) with "
                f"H / {n_dev} even and >= {HALO}"
                f"{' and even W' if pool else ''}; got {x.shape}"
            )

    def _run_fwd(x, k, b):
        _check(x)
        res = body_fwd(x, k, b)
        out = (res[0], res[2] / jnp.float32(x.shape[1] * x.shape[2])) if gram \
            else res[0]
        return out, res[1]

    @jax.custom_vjp
    def sharded_single(x, k, b):
        out, _ = _run_fwd(x, k, b)
        return out

    def fwd(x, k, b):
        out, y = _run_fwd(x, k, b)
        return out, (y, k, x.shape[1], x.shape[2])

    def bwd(res, cts):
        y, k, h, w = res
        if gram:
            d_out, d_gram = cts
            s = (d_gram + d_gram.T) / jnp.float32(h * w)
            dx = body_bwd(y, d_out, s, k)
        else:
            dx = body_bwd(y, cts, k)
        cout = k.shape[3]
        return dx, jnp.zeros_like(k), jnp.zeros((cout,), k.dtype)

    sharded_single.defvjp(fwd, bwd)
    return sharded_single
