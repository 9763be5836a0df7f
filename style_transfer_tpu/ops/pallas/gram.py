"""Fused Pallas Gram-matrix kernel (TPU MXU) with custom VJP.

The Gram matrix ``G = F^T F / M`` (``F``: (M, C) features, ``M = N*H*W``) is
the style loss's hot op — at 4K, conv1_1's F is ~8.8M x 64, far beyond VMEM.
This kernel streams row tiles of ``F`` through VMEM and accumulates the
(C, C) product in a float32 VMEM accumulator on the MXU, never materializing
more than one (TILE_M, C) block on-chip at a time (SURVEY.md section 7, hard
part 4). Rows are zero-padded to the tile size — zero rows contribute nothing
to ``F^T F``, so no masking is needed.

The backward (``dF = F (dG + dG^T) / M``) is a single (M, C) x (C, C) matmul
that XLA already schedules optimally, so the custom VJP lowers it to a plain
``jnp`` contraction.

Equivalent reference computation: NumPy ``A.dot(A.T)`` on host-fetched Caffe
blobs (SURVEY.md section 2 row 7, reconstructed). Checked against the
:func:`style_transfer_tpu.ops.losses.gram_matrix` oracle in
``tests/test_pallas_gram.py``; runs in interpreter mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile budget: the (TILE_M, C) input block may use at most this many
# bytes, so that double buffering plus the (C, C) fp32 accumulator stay
# within the ~16 MiB VMEM budget at any channel width / dtype. Large tiles
# amortize per-grid-step overhead: measured on v5e at (262144, 128) bf16,
# tile 8192 runs 0.64 ms vs 0.78 ms at tile 512.
_TILE_BYTES = 4 * 1024 * 1024
TILE_M = 8192  # upper bound (reached at C=128 bf16)


def _tile_m(c: int, itemsize: int) -> int:
    """Largest row tile whose (tile, c) block fits the VMEM budget."""
    t = _TILE_BYTES // max(1, c * itemsize)
    return max(8, min(TILE_M, (t // 8) * 8))

# Channel widths routed to the streaming kernel by gram_matrix. Standalone,
# the kernel beats XLA's einsum at C=128 (0.64 ms vs 0.93 ms at VGG conv2_1
# 1024px extents on v5e) and loses at C=64 (1.7 ms vs 0.92 ms, the lane
# dimension being half-utilized). *In context* it loses at every width:
# re-measured in round 2 against the conv-rewrite-free oracle formulation
# (see ops.losses.gram_matrix), the full 1024px objective step runs
# 36.3 ms/it with the XLA dot vs 59.2 ms/it dispatching all widths to the
# kernel and 52.3 ms/it dispatching C=64 only — pallas_call acts as an
# optimization barrier, so the producing activation materializes in HBM
# instead of fusing into the contraction. The default therefore routes
# nothing to the kernel; pallas_gram stays available (and unit-tested) for
# direct use.
_PALLAS_CHANNELS: frozenset = frozenset()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gram_kernel(f_ref, out_ref, acc_ref):
    """Grid step i: acc += F_tile^T @ F_tile; final step writes out."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tile = f_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        tile,
        tile,
        dimension_numbers=(((0,), (0,)), ((), ())),  # F^T @ F over rows
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("normalizer",))
def _gram_2d(f: jnp.ndarray, normalizer: int) -> jnp.ndarray:
    """(M, C) features -> (C, C) float32 Gram / normalizer."""
    m, c = f.shape
    tile_m = _tile_m(c, f.dtype.itemsize)
    m_pad = pl.cdiv(m, tile_m) * tile_m
    if m_pad != m:
        f = jnp.pad(f, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // tile_m,)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * c * c,
            bytes_accessed=m_pad * c * f.dtype.itemsize + c * c * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(f)
    return out / jnp.asarray(normalizer, jnp.float32)


@jax.custom_vjp
def pallas_gram(feat: jnp.ndarray) -> jnp.ndarray:
    """The streaming-kernel Gram: (N, H, W, C) -> (C, C) fp32, always Pallas."""
    n, h, w, c = feat.shape
    return _gram_2d(feat.reshape(n * h * w, c), n * h * w)


def _gram_fwd(feat):
    return pallas_gram(feat), feat


def _gram_bwd(feat, g):
    n, h, w, c = feat.shape
    m = n * h * w
    sym = (g + g.T) / jnp.asarray(m, jnp.float32)
    df = jnp.einsum(
        "nhwc,cd->nhwd",
        feat.astype(jnp.float32),
        sym,
        preferred_element_type=jnp.float32,
    )
    return (df.astype(feat.dtype),)


pallas_gram.defvjp(_gram_fwd, _gram_bwd)


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused replacement for :func:`ops.losses.gram_matrix`.

    (N, H, W, C) activations -> (C, C) float32 Gram normalized by N*H*W.

    Dispatches per channel width via ``_PALLAS_CHANNELS`` — which is EMPTY
    by default, because in-context the XLA dot wins everywhere (see the
    measurement note on ``_PALLAS_CHANNELS``); every call therefore takes
    the oracle contraction (with its conv-rewrite-defeating barrier
    formulation, see ``ops.losses.gram_matrix``) unless that set is
    changed. The backward of both paths is the same single
    (M, C) x (C, C) matmul.
    """
    if feat.shape[-1] in _PALLAS_CHANNELS:
        return pallas_gram(feat)
    from style_transfer_tpu.ops import losses

    return losses.gram_matrix(feat)
