"""Fused single 3x3 conv + ReLU + channel Gram — one pass each way.

The deepest style layer (VGG-19's conv5_1) is consumed ONLY as its Gram:
nothing downstream reads the activation, so the XLA formulation —
conv, ReLU materialized whole-tensor for the Gram contraction, backward
conv — is pure overhead beyond the contraction itself, and XLA runs those
convs in the whole-tensor ``T(2,128)`` batch-in-sublanes forms it picks
next to custom-call seams (~1.1 ms/it at 1024px vs ~0.2 ms roofline).
This kernel computes the Gram directly from streamed conv rows (forward)
and the input cotangent from the Gram cotangent (backward), so with the
block 1-4 chain (``block1_packed.py``, ``block2.py``, ``conv_pair.py``)
the ENTIRE VGG forward+backward runs in Pallas and no XLA conv remains.

Per tile (1-row tile halos in-kernel; mesh shards additionally carry a
2-row ``ppermute`` halo — see ``HALO``):

    forward:  input rows -> 9-tap conv + bias + ReLU -> rows zeroed
              outside the true image -> activation written as the
              backward residual; Gram accumulated as a C-wide syrk.
    backward: y rows -> dy = y @ S (the symmetrized, normalized Gram
              cotangent) -> ReLU gate (y > 0) -> zeroed outside the true
              image -> transposed taps -> input cotangent.

Checked against the jnp oracle in ``tests/test_conv_gram.py`` (interpret
mode off-TPU). The reference computes this layer inside Caffe's cuDNN
kernels and forms the Gram on the host (SURVEY.md section 2 rows 7/8,
reconstructed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from style_transfer_tpu.ops.pallas.block1 import _conv_taps
from style_transfer_tpu.ops.pallas.block1_packed import _row_halo
from style_transfer_tpu.ops.pallas.conv_pair import _pad_rows, _tile_for


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(p_ref, pu1_ref, pd1_ref, k_ref, b_ref, off_ref,
                y_ref, gram_ref, acc_ref, *, w, true_h, gram_lo, gram_hi):
    i = pl.program_id(0)
    tile = p_ref.shape[0]
    cout = y_ref.shape[2]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pe = jnp.concatenate([pu1_ref[0:1], p_ref[:], pd1_ref[0:1]], axis=0)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, pe.shape, 0) + i * tile - 1
    off = off_ref[0]  # global row index of array row 0 (nonzero under a mesh)
    pe = jnp.where((rows1 + off < 0) | (rows1 + off >= true_h), 0.0, pe)

    y = _conv_taps(pe, k_ref, flip=False, contract_out=False)
    y = jnp.maximum(y + b_ref[0].astype(jnp.float32), 0.0)
    rows0 = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + i * tile
    y = jnp.where((rows0 + off < 0) | (rows0 + off >= true_h), 0.0, y)
    y = y.astype(y_ref.dtype)
    y_ref[:] = y

    fr = y
    if gram_lo > 0 or gram_hi < (1 << 30):
        fr = jnp.where((rows0 < gram_lo) | (rows0 >= gram_hi), 0, y)
    f = fr.reshape(tile * w, cout)
    acc_ref[:] += jax.lax.dot_general(
        f, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        gram_ref[:] = acc_ref[:]


def _bwd_kernel(y_ref, yu1_ref, yd1_ref, k_ref, s_ref, off_ref, dx_ref,
                *, w, true_h):
    i = pl.program_id(0)
    tile = y_ref.shape[0]
    cout = y_ref.shape[2]

    ye = jnp.concatenate([yu1_ref[0:1], y_ref[:], yd1_ref[0:1]], axis=0)
    f = ye.reshape((tile + 2) * w, cout)
    g = jax.lax.dot_general(
        f, s_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tile + 2, w, cout)
    dpre = jnp.where(ye.astype(jnp.float32) > 0.0, g, 0.0)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, dpre.shape, 0) + i * tile - 1
    off = off_ref[0]
    dpre = jnp.where(
        (rows1 + off < 0) | (rows1 + off >= true_h), 0.0, dpre
    ).astype(y_ref.dtype)
    dx_ref[:] = _conv_taps(
        dpre, k_ref, flip=True, contract_out=True
    ).astype(dx_ref.dtype)


def _fwd(x2d, k, b, true_h, off=None, gram_rows=None):
    """``off``/``gram_rows`` as in conv_pair._fwd: global row of array row
    0 and the static local-row Gram ownership window for mesh shards."""
    h, w, cin = x2d.shape
    cout = k.shape[3]
    tile = _tile_for(w, cout)
    dt = x2d.dtype
    gram_lo, gram_hi = gram_rows if gram_rows is not None else (0, 1 << 30)
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    center = lambda i: (i, 0, 0)
    y, gram = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w, true_h=true_h,
                          gram_lo=gram_lo, gram_hi=gram_hi),
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, cin), center, memory_space=pltpu.VMEM),
            _row_halo(w, cin, h, lambda i: i * tile - 1),
            _row_halo(w, cin, h, lambda i: (i + 1) * tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # global row offset (1,)
        ],
        out_specs=[
            pl.BlockSpec((tile, w, cout), center, memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, cout), dt),
            jax.ShapeDtypeStruct((cout, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((cout, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cout * (9 * cin + cout),
            bytes_accessed=x2d.size * dt.itemsize + h * w * cout * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x2d, x2d, x2d, k.astype(dt), b.astype(dt).reshape(1, -1), off_arr)
    return y, gram


def _bwd(y, k, s, true_h, off=None):
    h, w, cout = y.shape
    cin = k.shape[2]
    tile = _tile_for(w, cout, backward=True)
    dt = y.dtype
    off_arr = jnp.reshape(jnp.asarray(0 if off is None else off, jnp.int32), (1,))
    center = lambda i: (i, 0, 0)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, true_h=true_h),
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, cout), center, memory_space=pltpu.VMEM),
            _row_halo(w, cout, h, lambda i: i * tile - 1),
            _row_halo(w, cout, h, lambda i: (i + 1) * tile),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # S
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, w, cin), center, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, cin), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * cout * (9 * cin + cout),
            bytes_accessed=2 * h * w * cout * dt.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(y, y, y, k.astype(dt), s.astype(dt), off_arr)
    return dx


@jax.custom_vjp
def conv_gram(x, k, b):
    """(1, H, W, Cin) -> (Cout, Cout) fp32 Gram of relu(conv3x3(x) + b),
    normalized by H*W. Differentiates w.r.t. ``x`` only (VGG weights are
    frozen in image optimization)."""
    out, _ = _conv_gram_fwd(x, k, b)
    return out


def _conv_gram_fwd(x, k, b):
    n, h, w, cin = x.shape
    if n != 1:
        raise ValueError(f"conv_gram expects (1, H, W, C), got {x.shape}")
    cout = k.shape[3]
    y, gram = _fwd(_pad_rows(x[0], _tile_for(w, cout)), k, b, h)
    return gram / jnp.float32(h * w), (y, k, h, w)


def _conv_gram_bwd(res, d_gram):
    y, k, h, w = res
    s = (d_gram + d_gram.T) / jnp.float32(h * w)
    dx = _bwd(y, k, s, h)
    cout = k.shape[3]
    return (dx[None, :h], jnp.zeros_like(k), jnp.zeros((cout,), k.dtype))


conv_gram.defvjp(_conv_gram_fwd, _conv_gram_bwd)


# ------------------------------------------------- conv+gram on a spatial mesh

HALO = 2  # one row more than the dataflow minimum (d_x rows [lo, hi) need
# dpre rows [lo-1, hi], y [lo-1, hi], input [lo-2, hi+1]): the kernels'
# edge halo blocks CLAMP out-of-array rows, and on an interior shard a
# clamped row aliases a VALID global row index, so the in-kernel global
# masks don't zero it — the outermost extension row each way is therefore
# garbage (wrong-input y in the forward residual, duplicate-row dpre in
# the backward) and the extra halo row keeps that garbage one tap away
# from the center slice (the same margin trick as conv_pair's HALO=4).


def _local_fwd(x, k, b, *, axis, n_dev):
    _, h_l, w, _ = x.shape
    idx = jax.lax.axis_index(axis)
    up = jax.lax.ppermute(x[:, -HALO:], axis, [(i, i + 1) for i in range(n_dev - 1)])
    down = jax.lax.ppermute(x[:, :HALO], axis, [(i, i - 1) for i in range(1, n_dev)])
    xe = jnp.concatenate([up, x, down], axis=1)[0]  # (h_l + 4, W, Cin)
    off = idx * h_l - HALO
    cout = k.shape[3]
    y, gram = _fwd(
        _pad_rows(xe, _tile_for(w, cout)), k, b, n_dev * h_l,
        off=off, gram_rows=(HALO, HALO + h_l),
    )
    return y, jax.lax.psum(gram, axis)


def make_sharded_conv_gram(mesh, axis: str):
    """:func:`conv_gram` carried onto a 1-D spatial mesh: each device runs
    the kernel on its own rows plus a 2-row ``ppermute`` halo, Grams
    ``psum`` over ICI, and the backward needs NO collective at all — the
    Gram cotangent arrives replicated and the stored extended-row
    activations already cover the halo. Caller gates: N == 1, H divisible
    by n_dev, per-shard rows >= 2."""
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.shape[axis])
    img = P(None, axis, None, None)
    rows = P(axis, None, None)
    kw = dict(axis=axis, n_dev=n_dev)
    body_fwd = jax.shard_map(
        functools.partial(_local_fwd, **kw),
        mesh=mesh,
        in_specs=(img, P(), P()),
        out_specs=(rows, P()),
        check_vma=False,
    )

    def _bwd_body(y, s, k, h_l):
        idx = jax.lax.axis_index(axis)
        off = idx * h_l - HALO
        dx = _bwd(y, k, s, n_dev * h_l, off=off)
        return dx[HALO : HALO + h_l][None]

    def _check(x):
        n, h, w, _ = x.shape
        if n != 1 or h % n_dev or h // n_dev < 2:
            raise ValueError(
                f"sharded conv_gram expects (1, H, W, C) with H divisible "
                f"by {n_dev} and per-shard rows >= 2; got {x.shape}"
            )

    @jax.custom_vjp
    def sharded_conv_gram(x, k, b):
        _check(x)
        _, gram = body_fwd(x, k, b)
        return gram / jnp.float32(x.shape[1] * x.shape[2])

    def fwd(x, k, b):
        _check(x)
        y, gram = body_fwd(x, k, b)
        return gram / jnp.float32(x.shape[1] * x.shape[2]), (
            y, k, x.shape[1], x.shape[2]
        )

    def bwd(res, d_gram):
        y, k, h, w = res
        s = (d_gram + d_gram.T) / jnp.float32(h * w)
        h_l = h // n_dev
        body_bwd = jax.shard_map(
            functools.partial(_bwd_body, h_l=h_l),
            mesh=mesh,
            in_specs=(rows, P(), P()),
            out_specs=img,
            check_vma=False,
        )
        dx = body_bwd(y, s, k)
        cout = k.shape[3]
        return (dx, jnp.zeros_like(k), jnp.zeros((cout,), k.dtype))

    sharded_conv_gram.defvjp(fwd, bwd)
    return sharded_conv_gram
