"""Periodic in-progress image snapshots (reference behavior: SURVEY.md section 5,
"periodic saving of the in-progress image")."""

from __future__ import annotations

import os

from style_transfer_tpu.utils import imgio
from style_transfer_tpu.utils.progress import ProgressEvent


class SnapshotSaver:
    """Saves the in-progress image every N iterations next to the output path.

    ``out.png`` -> ``out_snapshot.png`` (overwritten each time, like the
    reference's periodic save-over behavior).
    """

    def __init__(self, output_path: str, every: int = 100):
        base, ext = os.path.splitext(output_path)
        self.path = f"{base}_snapshot{ext or '.png'}"
        self.every = max(1, every)
        self._last_saved = -1

    def __call__(self, ev: ProgressEvent) -> None:
        # Snapshot on crossing each `every` boundary within a scale, and on the
        # final event. Chunk sizes need not align with `every`.
        boundary = (ev.iteration // self.every) * self.every
        if ev.done or (boundary > self._last_saved and boundary > 0):
            imgio.save_image(ev.get_image(), self.path)
            self._last_saved = boundary
