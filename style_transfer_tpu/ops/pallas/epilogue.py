"""Fused objective-epilogue Pallas kernels (SURVEY.md section 7 phase 3).

The objective's epilogue — everything between the captured VGG features and
the scalar loss — is three independent reductions, each of which also has a
dense top-gradient the backward pass needs:

- content: ``sse = sum((F - T)^2)`` over a feature map, gradient ``2(F-T)``;
- style:   ``sse = sum((G - Ghat)^2)`` over a (C, C) Gram, gradient
  ``2(G - Ghat)`` (the Gram's own VJP to features happens upstream);
- TV:      squared forward-difference total variation of the image, with its
  5-point-stencil gradient.

Each kernel here produces the loss contribution AND the raw top-gradient in
ONE streaming pass over its input (the plain-XLA autodiff path reads the
inputs once in the forward for the loss and again in the backward for the
gradient). A ``jax.custom_vjp`` wrapper saves the precomputed gradient as
the residual, so the backward is a pure scale by the upstream cotangent —
it never touches the original operands again.

Reference equivalence: the reference computes these same quantities with
host NumPy on fetched Caffe blobs and injects the gradients into
``net.backward`` (SURVEY.md section 3.1/3.3, reconstructed). Every kernel is
unit-checked against the fp32 oracle in :mod:`style_transfer_tpu.ops.losses`
— values and gradients — in ``tests/test_pallas_epilogue.py``; off-TPU the
kernels run in interpreter mode.

Normalization and loss weights stay OUTSIDE the kernels (plain scalar jnp on
the (already tiny) outputs): the kernels compute raw sums and raw gradients,
which keeps them shape-generic and their VJPs trivial.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile budget per streamed block, sized so double-buffered input +
# output tiles stay well inside ~16 MiB VMEM at any dtype.
_TILE_BYTES = 2 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- content


def _content_kernel(f_ref, t_ref, sse_ref, diff_ref, acc_ref):
    """Grid step i: diff = F - T (written), acc += sum(diff^2) in fp32."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    d32 = f_ref[:].astype(jnp.float32) - t_ref[:].astype(jnp.float32)
    diff_ref[:] = d32.astype(diff_ref.dtype)
    acc_ref[0, 0] += jnp.sum(d32 * d32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        sse_ref[0, 0] = acc_ref[0, 0]


def _tile_rows(c: int, itemsize: int) -> int:
    t = _TILE_BYTES // max(1, c * itemsize)
    return max(8, (t // 8) * 8)


def _content_sse_diff(feat2d: jnp.ndarray, target2d: jnp.ndarray):
    """(M, C) feature/target -> (sse fp32 scalar, diff in feat dtype).

    The diff is produced in fp32-exact form then cast to the feature dtype;
    the fp32 SSE accumulates the exact differences (matching the oracle's
    fp32 accumulation).
    """
    m, c = feat2d.shape
    tile = _tile_rows(c, feat2d.dtype.itemsize)
    m_pad = pl.cdiv(m, tile) * tile
    if m_pad != m:
        feat2d = jnp.pad(feat2d, ((0, m_pad - m), (0, 0)))
        target2d = jnp.pad(target2d, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // tile,)
    sse, diff = pl.pallas_call(
        _content_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, c), feat2d.dtype),
        ],
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * m_pad * c,
            bytes_accessed=3 * m_pad * c * feat2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(feat2d, target2d)
    return sse[0, 0], diff[:m]


@jax.custom_vjp
def content_loss(feat: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused :func:`ops.losses.content_loss`: mean((F-T)^2), fp32."""
    n, h, w, c = feat.shape
    sse, _ = _content_sse_diff(feat.reshape(-1, c), target.reshape(-1, c))
    return sse / jnp.float32(feat.size)


def _content_fwd(feat, target):
    n, h, w, c = feat.shape
    sse, diff = _content_sse_diff(feat.reshape(-1, c), target.reshape(-1, c))
    return sse / jnp.float32(feat.size), (diff.reshape(feat.shape), feat.size)


def _content_bwd(res, ct):
    diff, numel = res
    scale = (2.0 * ct / jnp.float32(numel)).astype(jnp.float32)
    g = (diff.astype(jnp.float32) * scale).astype(diff.dtype)
    # target is a constant capture; returning a zero cotangent for it would
    # cost a full extra write, and the optimize loop never differentiates
    # w.r.t. targets — None marks it symbolically zero.
    return g, None


content_loss.defvjp(_content_fwd, _content_bwd)


# ----------------------------------------------------------------- style


def _style_kernel(g_ref, t_ref, sse_ref, dg_ref):
    d = g_ref[:] - t_ref[:]
    dg_ref[:] = d
    sse_ref[0, 0] = jnp.sum(d * d)


def _style_sse_dg(gram: jnp.ndarray, target: jnp.ndarray):
    """(C, C) fp32 Grams -> (sse scalar, raw delta G - Ghat)."""
    c = gram.shape[0]
    sse, dg = pl.pallas_call(
        _style_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=_interpret(),
    )(gram.astype(jnp.float32), target.astype(jnp.float32))
    return sse[0, 0], dg


@jax.custom_vjp
def style_loss(gram: jnp.ndarray, target_gram: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused :func:`ops.losses.style_loss`: mean((G-Ghat)^2), fp32."""
    sse, _ = _style_sse_dg(gram, target_gram)
    return sse / jnp.float32(gram.size)


def _style_fwd(gram, target_gram):
    sse, dg = _style_sse_dg(gram, target_gram)
    return sse / jnp.float32(gram.size), dg


def _style_bwd(dg, ct):
    # Grams are fp32 by construction (gram_matrix accumulates fp32), so the
    # cotangent stays fp32.
    return dg * (2.0 * ct / jnp.float32(dg.size)), None


style_loss.defvjp(_style_fwd, _style_bwd)


# -------------------------------------------------------------------- TV


def _tv_kernel(x_ref, up_ref, down_ref, sse_ref, grad_ref, acc_ref, *, d, rows, true_h):
    """One H-tile of the fused TV loss + gradient.

    The tile holds rows [r0, r0+rows) of the (H, W*3) flattened image;
    ``up_ref``/``down_ref`` are single-row halo views of rows r0-1 and
    r0+rows (clamped at the image edges and masked out below). ``d`` is the
    channel stride (3) by which a shift along the flattened lane dimension
    moves one pixel in W.

    Loss: sum of dh^2 + dw^2 over forward differences this tile OWNS
    (dh rows r0-1..r0+rows-2 would double-count across tiles; each tile owns
    the dh whose *minuend* row it holds, i.e. rows r0..r0+rows-1 minus the
    very last image row — implemented as the difference against ``down``).
    Gradient: full 5-point stencil, boundary terms masked.
    """
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:].astype(jnp.float32)  # (rows, D)
    # Halo refs are 8-row blocks (TPU block sublane granularity); the row
    # above the tile is the LAST row of the block ending at it, the row
    # below is the FIRST row of the block starting at it.
    up = up_ref[7:8].astype(jnp.float32)  # (1, D): row above the tile
    down = down_ref[0:1].astype(jnp.float32)  # (1, D): row below the tile

    # H-direction forward differences owned by this tile: next(r) - x(r) for
    # every row r of the tile; for the tile's last row "next" is the halo.
    # On the last tile the halo row below is a clamped duplicate of the last
    # image row -> mask its (zero anyway) contribution out of the loss and
    # gradient explicitly for clarity.
    x_next = jnp.concatenate([x[1:], down], axis=0)  # (rows, D)
    dh = x_next - x
    row_ids = jax.lax.broadcasted_iota(jnp.int32, dh.shape, 0) + i * rows
    # no forward difference out of the last TRUE image row, and rows in the
    # replication-padded tail contribute nothing
    dh = jnp.where(row_ids >= true_h - 1, 0.0, dh)

    # W-direction forward differences: shift by one pixel = d lanes. The
    # shifted-in garbage at the right edge is masked (last pixel column has
    # no forward neighbour).
    zeros_col = jnp.zeros((x.shape[0], d), jnp.float32)
    x_wnext = jnp.concatenate([x[:, d:], zeros_col], axis=1)
    dw = x_wnext - x
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dw.shape, 1)
    is_last_col = col_ids >= x.shape[1] - d
    dw = jnp.where(is_last_col | (row_ids >= true_h), 0.0, dw)

    acc_ref[0, 0] += jnp.sum(dh * dh) + jnp.sum(dw * dw)

    # Gradient of sum(dh^2 + dw^2) w.r.t. this tile's rows:
    #   d/dx[r] = -2*dh[r] + 2*dh[r-1]  (dh[r-1] needs the halo row above)
    #           + -2*dw[:, w] + 2*dw[:, w-1]
    dh_above_first = jnp.where(i == 0, 0.0, x[0:1] - up)  # dh at row r0-1
    dh_prev = jnp.concatenate([dh_above_first, dh[:-1]], axis=0)
    dw_prev = jnp.concatenate([zeros_col, dw[:, :-d]], axis=1)
    grad = 2.0 * (dh_prev - dh + dw_prev - dw)
    grad_ref[:] = grad.astype(grad_ref.dtype)

    @pl.when(i == n_tiles - 1)
    def _():
        sse_ref[0, 0] = acc_ref[0, 0]


def _tv_sse_grad(x2d: jnp.ndarray, d: int):
    """(H, W*d) flattened image -> (tv sse, raw gradient)."""
    h, wd = x2d.shape
    # rows must stay a multiple of 8 (TPU sublane block granularity)
    rows = max(8, min(((h + 7) // 8) * 8, (_TILE_BYTES // max(1, wd * 4) // 8) * 8))
    h_pad = pl.cdiv(h, rows) * rows
    if h_pad != h:
        # edge-replicate so padded dh terms are zero and gradients at the
        # true boundary see clamped neighbours
        x2d = jnp.concatenate([x2d, jnp.tile(x2d[-1:], (h_pad - h, 1))], axis=0)
    grid = (h_pad // rows,)

    blocks_per_tile = rows // 8

    def up_index(i):
        # 8-row block whose last row is the row above the tile (i*rows - 1);
        # clamped at the top edge, where the kernel masks it out anyway.
        return (jnp.maximum(i * blocks_per_tile - 1, 0), 0)

    def down_index(i):
        # 8-row block whose first row is the row below the tile ((i+1)*rows);
        # clamped at the bottom edge, where the kernel masks it out anyway.
        return (jnp.minimum((i + 1) * blocks_per_tile, h_pad // 8 - 1), 0)

    sse, grad = pl.pallas_call(
        functools.partial(_tv_kernel, d=d, rows=rows, true_h=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, wd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wd), up_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, wd), down_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, wd), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, wd), x2d.dtype),
        ],
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * h_pad * wd,
            bytes_accessed=2 * h_pad * wd * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x2d, x2d, x2d)
    return sse[0, 0], grad[:h]


@jax.custom_vjp
def tv_loss(image: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused :func:`ops.losses.tv_loss` (mean squared forward-diff
    isotropic TV); gradient at a constant image is exactly zero."""
    n, h, w, c = image.shape
    if n != 1:
        raise ValueError("fused tv_loss expects a single NHWC image (N=1)")
    sse, _ = _tv_sse_grad(image.astype(jnp.float32).reshape(h, w * c), c)
    return sse / jnp.float32(image.size)


def _tv_fwd(image):
    n, h, w, c = image.shape
    if n != 1:
        raise ValueError("fused tv_loss expects a single NHWC image (N=1)")
    sse, grad = _tv_sse_grad(image.astype(jnp.float32).reshape(h, w * c), c)
    return sse / jnp.float32(image.size), grad.reshape(image.shape).astype(image.dtype)


def _tv_bwd(grad, ct):
    return (grad * (ct / jnp.float32(grad.size)),)


tv_loss.defvjp(_tv_fwd, _tv_bwd)


# --------------------------------------------------- TV on a spatial mesh


def _tv_sse_grad_sharded(image: jnp.ndarray, axis: str):
    """Per-device body (inside shard_map): fused local TV + halo correction.

    ``image`` is the local (1, H/n, W, C) spatial shard. The single-device
    Pallas kernel computes every difference interior to the shard (it treats
    the block as a full image, so it emits no dh out of the shard's last
    row); the one forward difference per boundary — shard p's last row to
    shard p+1's first row — is then added in plain jnp from two one-row
    ``ppermute`` halo exchanges. Loss contributions ``psum`` over ICI; the
    gradient stays sharded. Mathematically exact vs the unsharded kernel
    (the same sums, re-associated), tested in tests/test_sharding.py.
    """
    n, h_l, w, c = image.shape
    x2d = image.astype(jnp.float32).reshape(h_l, w * c)
    sse, grad2d = _tv_sse_grad(x2d, c)

    idx = jax.lax.axis_index(axis)
    size = jax.lax.axis_size(axis)
    first, last = x2d[:1], x2d[-1:]
    # shard p receives p+1's FIRST row (the forward-difference target of its
    # own last row) and p-1's LAST row (needed for its first row's gradient
    # term). Edge devices receive zeros and mask the contribution out.
    down = jax.lax.ppermute(first, axis, [(i, i - 1) for i in range(1, size)])
    up = jax.lax.ppermute(last, axis, [(i, i + 1) for i in range(size - 1)])
    not_last = (idx < size - 1).astype(jnp.float32)
    not_first = (idx > 0).astype(jnp.float32)

    dh_down = (down - last) * not_last  # boundary dh owned by this shard
    dh_up = (first - up) * not_first  # boundary dh owned by the shard above
    sse = sse + jnp.sum(dh_down * dh_down)
    grad2d = grad2d.at[-1:].add(-2.0 * dh_down).at[:1].add(2.0 * dh_up)

    total = jax.lax.psum(sse, axis)
    return total, grad2d.reshape(image.shape)


def make_sharded_tv_loss(mesh, axis: str):
    """Fused TV loss carried onto a 1-D spatial mesh (round-2 verdict item 2).

    Returns a drop-in :func:`ops.losses.tv_loss` for images sharded along H
    over ``mesh`` (``PartitionSpec(None, axis, None, None)``): each device
    runs the streaming Pallas kernel on its own rows, boundary terms ride a
    one-row ``ppermute`` halo, and the scalar loss is ``psum``-replicated.
    The custom VJP keeps the per-shard gradient as the residual, so the
    backward is a local cotangent scale — no extra collectives.

    Caller gates: H divisible by the mesh size, (W*C) % 128 == 0 (the same
    Mosaic lane-alignment gate as the single-device kernel), N == 1.
    """
    shard_map = jax.shard_map
    from jax.sharding import PartitionSpec as P

    img_spec = P(None, axis, None, None)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the jax 0.9 vma checker rejects inside shard_map;
    # correctness is covered by the sharded == unsharded tests instead.
    body = shard_map(
        lambda img: _tv_sse_grad_sharded(img, axis),
        mesh=mesh,
        in_specs=(img_spec,),
        out_specs=(P(), img_spec),
        check_vma=False,
    )

    @jax.custom_vjp
    def tv_loss_sharded(image: jnp.ndarray) -> jnp.ndarray:
        sse, _ = body(image)
        return sse / jnp.float32(image.size)

    def fwd(image):
        sse, grad = body(image)
        return sse / jnp.float32(image.size), (grad.astype(image.dtype), image.size)

    def bwd(res, ct):
        grad, numel = res
        return (grad * (ct / jnp.float32(numel)),)

    tv_loss_sharded.defvjp(fwd, bwd)
    return tv_loss_sharded
