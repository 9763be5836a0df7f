"""Coarse-to-fine multi-scale schedule.

The reference optimizes at a small size first, upsamples the result, and
repeats until the final size (SURVEY.md section 2 row 4, reconstructed; the
driver's config 2 is an explicit 256->512->1024 doubling ladder,
BASELINE.json:8). The plan here is computed *ahead of time* — a static list
of (H, W) per scale — so each scale's step function has one static shape and
XLA compiles exactly once per scale (SURVEY.md section 7, hard part 2).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

from style_transfer_tpu.utils.imgio import scale_size


def _round_even(x: float) -> int:
    """Round to a multiple of 2 (>= 8) — friendly to VGG's pooling halvings.

    The floor must stay small: it may only catch degenerate aspect ratios,
    never distort a requested size.
    """
    return max(8, int(round(x / 2.0)) * 2)


#: Width grids of the fused Pallas chain, deepest first. Mosaic tiles the
#: W (second-minor) axis in 16-row bf16 sublanes, and off-grid widths void
#: the kernels' measured compile envelope (ops/pallas/vmem.py SUBLANE,
#: misalignment probe), so each block's kernel needs its OWN width on the
#: 16 grid: W % 32 keeps blocks 1-2 fused (packed block 1 and the block-2
#: pair both run at W/2), % 64 adds block 3 (W/4), % 128 adds block 4's
#: pairs (W/8), and % 256 also keeps conv5_1's fused conv+Gram (W/16).
#: Off-grid widths fall back to XLA — correct but ~2-3x slower (the whole
#: Pallas tier disengages), which is why the scheduler snaps to this grid.
FUSED_GRIDS_W = (256, 128, 64, 32)

#: Height grid of the fused chain: pool evenness down to the block-4 tail
#: pair's input (H, H/2, H/4, H/8 all even). Heights ride the 8-sublane
#: H-tiling inside the kernels, so there is no H alignment pathology —
#: 16 | H is all the chain needs.
FUSED_GRID_H = 16

#: Maximum relative size change a snap may introduce. 4% admits the worst
#: realistic case on the deep grids (1360 -> 1408 is +3.5% on the 128
#: grid) while refusing distortions a user would notice as a crop; the
#: requested output size is always restored exactly by a final on-device
#: resize (api.stylize), so the tolerance only governs the sizes the
#: OPTIMIZER sees.
SNAP_TOLERANCE = 0.04


def _snap_dim(n: int, grid: int, tolerance: float) -> int | None:
    """Nearest multiple of ``grid`` (>= grid) within ``tolerance`` relative
    change of ``n``, else None."""
    m = max(grid, int(round(n / grid)) * grid)
    return m if abs(m - n) <= tolerance * n else None


def snap_to_fused_grid(
    size: Tuple[int, int], *, tolerance: float = SNAP_TOLERANCE
) -> Tuple[int, int]:
    """Nearest fused-kernel-grid size for one scale: H on the 16 grid, W on
    the DEEPEST grid in :data:`FUSED_GRIDS_W` reachable within
    ``tolerance`` (deeper grid = more of the VGG runs in Pallas, so depth
    wins over closeness). Dimensions below 64 px are left on the even grid
    — sub-tile widths (< 16 rows after packing) are inside the kernels'
    envelope anyway, and snapping tiny scales would distort them visibly.

    Pure and total: when no grid multiple is within tolerance the input
    dimension is returned even-rounded, never rejected.
    """
    h, w = size
    h2 = (_snap_dim(h, FUSED_GRID_H, tolerance) or _round_even(h)) if h >= 64 else _round_even(h)
    w2 = _round_even(w)
    if w >= 64:
        for g in FUSED_GRIDS_W:
            cand = _snap_dim(w, g, tolerance)
            if cand is not None:
                w2 = cand
                break
    return h2, w2


@dataclasses.dataclass(frozen=True)
class Scale:
    index: int
    size: Tuple[int, int]  # (H, W)
    iterations: int


def scale_ladder(
    end_size: Tuple[int, int],
    *,
    min_scale: int = 256,
    factor: float = 2.0,
    grid_snap: bool = False,
) -> List[Tuple[int, int]]:
    """Sizes coarse->fine: long side grows by ``factor`` up to ``end_size``.

    The coarsest long side is the smallest ``end/factor^k`` still >= min_scale
    (or the end size itself if it is already smaller than ``min_scale``).

    ``grid_snap=True`` additionally snaps every scale onto the fused
    Pallas kernel grid (:func:`snap_to_fused_grid`) so an off-grid user
    size (e.g. 1360 px) keeps the ~2-3x kernel tier instead of silently
    falling back to XLA; the caller restores the exact requested end size
    with a final resize.
    """
    if factor <= 1.0:
        raise ValueError("scale factor must be > 1")
    end_long = max(end_size)
    longs = [end_long]
    while longs[-1] / factor >= min_scale:
        longs.append(longs[-1] / factor)
    longs.reverse()
    sizes = []
    for s in longs:
        h, w = scale_size(end_size, int(round(s)))
        size = (_round_even(h), _round_even(w))
        if grid_snap:
            size = snap_to_fused_grid(size)
        sizes.append(size)
    # dedupe (tiny images can collapse to the same rounded size)
    out: List[Tuple[int, int]] = []
    for s in sizes:
        if not out or s != out[-1]:
            out.append(s)
    return out


def chunk_lengths(iterations: int, chunk_size: int) -> List[int]:
    """The static scan lengths a scale's chunked loop will request:
    ``chunk_size`` repeated, plus the remainder. Shared by the optimize loop,
    the background compile warmer, and the bench warm pass so they always
    agree on which (shape, n) programs exist."""
    if iterations <= 0:
        return []
    full, rem = divmod(iterations, chunk_size)
    return [chunk_size] * full + ([rem] if rem else [])


def build_plan(
    end_size: Tuple[int, int],
    iterations: Sequence[int],
    *,
    min_scale: int = 256,
    factor: float = 2.0,
    grid_snap: bool = False,
) -> List[Scale]:
    """Full static plan. ``iterations`` applies coarse->fine, last entry repeats.

    (The reference family's per-scale iteration flags behave the same way —
    SURVEY.md section 2 row 1, reconstructed.)
    """
    if not iterations:
        raise ValueError("need at least one iteration count")
    sizes = scale_ladder(
        end_size, min_scale=min_scale, factor=factor, grid_snap=grid_snap
    )
    plan = []
    for i, size in enumerate(sizes):
        iters = iterations[min(i, len(iterations) - 1)]
        plan.append(Scale(index=i, size=size, iterations=int(iters)))
    return plan
