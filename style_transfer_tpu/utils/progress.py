"""Progress events, stdout reporting, and iteration-rate metrics.

Mirrors the reference's observability surface — per-iteration loss lines on
stdout, periodic snapshots, a live web view (SURVEY.md section 2 row 12) —
but structured: the optimize loop emits :class:`ProgressEvent` records per
device chunk, and sinks (printer, web monitor, checkpointer, metrics JSON)
subscribe. The hot loop itself never blocks on a sink; the only
synchronization is the per-chunk loss fetch.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ProgressEvent:
    """One per-chunk progress record from the optimize loop."""

    scale_index: int
    num_scales: int
    size: Tuple[int, int]
    iteration: int  # iterations completed at this scale (cumulative)
    total_iterations: int  # planned iterations at this scale
    losses: Dict[str, np.ndarray]  # per-iteration loss terms for this chunk
    # Wall-clock rate since the previous event. The FIRST chunk of each scale
    # understates the steady rate: its interval absorbs XLA compile (or cache
    # load), target capture, and — in pipelined mode — the dispatch of the
    # speculative chunks filling the queue. Steady-state consumers should
    # drop each scale's first event (bench.py and MetricsRecorder.summary do).
    its_per_sec: float
    # Lazily fetches the current image as float RGB (H, W, 3) in [0, 1].
    # Backed by a private (non-donated) device snapshot, so it is safe to
    # call from any thread, even after later chunks have run.
    get_image: Callable[[], np.ndarray]
    done: bool = False  # last event of the whole run
    # Lazily fetches the full resumable state (image, optimizer state leaves,
    # schedule position) for checkpointing; None when unavailable. Unlike
    # get_image this reads donated buffers — call it synchronously inside the
    # callback, before the next chunk runs.
    get_state: Optional[Callable[[], dict]] = None

    @property
    def loss(self) -> float:
        return float(self.losses["loss"][-1])


Callback = Callable[[ProgressEvent], None]


class Printer:
    """Per-iteration stdout lines, like the reference's progress prints."""

    def __init__(self, every: int = 25, out=None):
        self.every = max(1, every)
        self.out = out

    def __call__(self, ev: ProgressEvent) -> None:
        n = len(ev.losses["loss"])
        start = ev.iteration - n
        for i in range(n):
            it = start + i + 1
            if it % self.every == 0 or (ev.done and i == n - 1):
                parts = [
                    f"scale {ev.scale_index + 1}/{ev.num_scales}",
                    f"{ev.size[1]}x{ev.size[0]}",
                    f"iter {it}/{ev.total_iterations}",
                    f"loss {float(ev.losses['loss'][i]):.6g}",
                    f"content {float(ev.losses['content'][i]):.4g}",
                    f"style {float(ev.losses['style'][i]):.4g}",
                    f"tv {float(ev.losses['tv'][i]):.4g}",
                    f"{ev.its_per_sec:.1f} it/s",
                ]
                print("  ".join(parts), flush=True, file=self.out)


class MetricsRecorder:
    """Accumulates per-scale timing for the perf harness (BASELINE.json:2)."""

    def __init__(self):
        self.records: List[dict] = []

    def __call__(self, ev: ProgressEvent) -> None:
        self.records.append(
            {
                "scale": ev.scale_index,
                "size": list(ev.size),
                "iteration": ev.iteration,
                "loss": ev.loss,
                "its_per_sec": ev.its_per_sec,
                "time": time.time(),
            }
        )

    def summary(self) -> dict:
        """Steady-state per-scale rates: each scale's FIRST chunk is dropped
        (it absorbs compile/cache-load, target capture, and pipeline fill —
        see :class:`ProgressEvent`), matching bench.py's methodology so
        ``--metrics-out`` summaries and the perf harness agree. Scales with
        a single chunk keep it (better a biased number than none)."""
        by_scale: Dict[int, List[float]] = {}
        for r in self.records:
            by_scale.setdefault(r["scale"], []).append(r["its_per_sec"])
        steady = {k: (v[1:] if len(v) > 1 else v) for k, v in by_scale.items()}
        return {
            "per_scale_its_per_sec": {k: float(np.mean(v)) for k, v in steady.items()},
            "per_scale_chunks_counted": {k: len(v) for k, v in steady.items()},
            "final_loss": self.records[-1]["loss"] if self.records else None,
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"records": self.records, "summary": self.summary()}, f, indent=2)


def fanout(*callbacks: Optional[Callback]) -> Callback:
    """Combine callbacks; Nones are skipped."""
    cbs = [c for c in callbacks if c is not None]

    def cb(ev: ProgressEvent) -> None:
        for c in cbs:
            c(ev)

    return cb
