"""Checkpoint / resume: crash recovery for long multi-scale runs.

The reference's only recovery story is "re-run with --init <last saved
image>" (SURVEY.md section 5, reconstructed). Here a checkpoint captures the
full optimize state — image, optimizer state, schedule position — via
orbax-checkpoint, so ``--resume`` continues mid-schedule with the optimizer's
momentum/history intact.

Optimizer states are arbitrary nested NamedTuples (optax); they are flattened
to an ordered leaf list before saving so restore does not depend on orbax
reconstructing container types — the caller re-creates the structure with
``optimizer.init`` and grafts the saved leaves back on
(:func:`restore_opt_state`).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from style_transfer_tpu.utils.progress import ProgressEvent

_STEP_RE = re.compile(r"^step_(\d+)$")


def flatten_opt_state(opt_state) -> List[np.ndarray]:
    leaves = jax.tree_util.tree_leaves(opt_state)
    return [np.asarray(jax.device_get(l)) for l in leaves]


def restore_opt_state(template, leaves: List[np.ndarray]):
    """Graft saved leaves onto a freshly-initialized optimizer state."""
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} optimizer-state leaves, expected "
            f"{len(t_leaves)} — optimizer config changed since the checkpoint?"
        )
    cast = [np.asarray(l).astype(t.dtype) for l, t in zip(leaves, t_leaves)]
    for l, t in zip(cast, t_leaves):
        if l.shape != t.shape:
            raise ValueError(
                f"checkpoint leaf shape {l.shape} != expected {t.shape} — "
                "resuming at a different resolution/config is not supported"
            )
    return jax.tree_util.tree_unflatten(treedef, cast)


class CheckpointManager:
    """Saves periodic checkpoints; exposes a progress-callback sink.

    Layout: ``<dir>/step_<global_step>/`` orbax directories; ``latest()``
    picks the highest step.
    """

    def __init__(self, directory: str, every: int = 200, keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.every = max(1, every)
        self.keep = max(1, keep)
        self._ckptr = ocp.StandardCheckpointer()
        self._global_step = 0
        self._last_saved = -1

    # ------------------------------------------------------------- saving

    def callback(self, ev: ProgressEvent) -> None:
        if ev.get_state is None:
            return
        self._global_step += len(ev.losses["loss"])
        boundary = (self._global_step // self.every) * self.every
        if ev.done or (boundary > self._last_saved):
            self.save(ev.get_state(), self._global_step)
            self._last_saved = boundary

    def save(self, state: Dict[str, Any], step: int) -> None:
        path = os.path.join(self.directory, f"step_{step}")
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        self._gc()

    def _gc(self) -> None:
        steps = sorted(self._list_steps())
        for s in steps[: -self.keep]:
            import shutil

            shutil.rmtree(os.path.join(self.directory, f"step_{s}"), ignore_errors=True)

    # ------------------------------------------------------------ loading

    def _list_steps(self) -> List[int]:
        out = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                out.append(int(m.group(1)))
        return out

    def latest(self) -> Optional[Dict[str, Any]]:
        """The newest checkpoint as a raw dict (numpy leaves), or None."""
        steps = self._list_steps()
        if not steps:
            return None
        path = os.path.join(self.directory, f"step_{max(steps)}")
        return self._ckptr.restore(path)
