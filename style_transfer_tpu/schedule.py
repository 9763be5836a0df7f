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
) -> List[Tuple[int, int]]:
    """Sizes coarse->fine: long side grows by ``factor`` up to ``end_size``.

    The coarsest long side is the smallest ``end/factor^k`` still >= min_scale
    (or the end size itself if it is already smaller than ``min_scale``).
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
        sizes.append((_round_even(h), _round_even(w)))
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
) -> List[Scale]:
    """Full static plan. ``iterations`` applies coarse->fine, last entry repeats.

    (The reference family's per-scale iteration flags behave the same way —
    SURVEY.md section 2 row 1, reconstructed.)
    """
    if not iterations:
        raise ValueError("need at least one iteration count")
    sizes = scale_ladder(end_size, min_scale=min_scale, factor=factor)
    plan = []
    for i, size in enumerate(sizes):
        iters = iterations[min(i, len(iterations) - 1)]
        plan.append(Scale(index=i, size=size, iterations=int(iters)))
    return plan
