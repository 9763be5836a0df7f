"""Checkpoint/resume tests (SURVEY.md section 5): orbax round-trip, mid-run
resume equivalence, optimizer-state grafting errors."""

import numpy as np
import optax
import pytest

from style_transfer_tpu.api import StyleTransfer, StylizeConfig
from style_transfer_tpu.optim import OptimizerSpec
from style_transfer_tpu.utils.ckpt import (
    CheckpointManager,
    flatten_opt_state,
    restore_opt_state,
)


def _cfg(**kw):
    base = dict(
        size=32,
        min_scale=16,
        iterations=(4, 4),
        chunk_size=2,
        content_layers=("conv2_2",),
        style_layers=("conv1_1", "conv2_1"),
        use_fused=False,
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
    )
    base.update(kw)
    return StylizeConfig(**base)


@pytest.fixture(scope="module")
def images():
    r = np.random.RandomState(1)
    return r.rand(32, 32, 3).astype(np.float32), r.rand(32, 32, 3).astype(np.float32)


def test_opt_state_flatten_restore_roundtrip():
    import jax.numpy as jnp

    opt = optax.adam(0.1)
    state = opt.init({"x": jnp.ones((3, 2)), "y": jnp.zeros(5)})
    leaves = flatten_opt_state(state)
    restored = restore_opt_state(state, leaves)
    for a, b in zip(flatten_opt_state(restored), leaves):
        np.testing.assert_array_equal(a, b)


def test_restore_opt_state_rejects_mismatch():
    import jax.numpy as jnp

    opt = optax.adam(0.1)
    state = opt.init(jnp.ones(4))
    leaves = flatten_opt_state(state)
    with pytest.raises(ValueError, match="leaves"):
        restore_opt_state(state, leaves[:-1])
    bad = [np.zeros((9, 9))] + leaves[1:]
    with pytest.raises(ValueError, match="shape"):
        restore_opt_state(state, bad)


def test_checkpoint_manager_save_latest_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), every=1, keep=2)
    for step in [10, 20, 30]:
        mgr.save({"image": np.full((2, 2), step, np.float32), "iteration": np.asarray(step)}, step)
    latest = mgr.latest()
    assert int(latest["iteration"]) == 30
    assert sorted(mgr._list_steps()) == [20, 30]  # keep=2 pruned step_10


def test_resume_continues_identically(tmp_path, images):
    """Run 1: full 2-scale run with checkpoints. Run 2: resume from the
    mid-run checkpoint — must end bit-identical to the uninterrupted run
    (pure functional core + restored optimizer state)."""
    content, style = images
    cfg = _cfg()

    st = StyleTransfer()
    full = st.stylize(content, style, cfg)

    # checkpoint every 2 iterations; grab the one at scale 1 start
    mgr = CheckpointManager(str(tmp_path / "ck"), every=2, keep=50)
    states = []

    def keeper(ev):
        mgr.callback(ev)
        states.append((ev.scale_index, ev.iteration))

    st2 = StyleTransfer()
    st2.stylize(content, style, cfg, callback=keeper)

    # restore the latest checkpoint strictly before the end and rerun
    latest = mgr.latest()
    st3 = StyleTransfer()
    resumed = st3.stylize(content, style, cfg, resume_state=latest)
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_resume_mid_scale(tmp_path, images):
    content, style = images
    cfg = _cfg(iterations=(6,), min_scale=32)
    st = StyleTransfer()
    mgr = CheckpointManager(str(tmp_path / "ck"), every=2, keep=50)
    events = []

    def cb(ev):
        if ev.iteration == 2 and ev.scale_index == 0:
            mgr.callback(ev)
        events.append(ev.iteration)

    full = st.stylize(content, style, cfg, callback=cb)
    latest = mgr.latest()
    assert int(latest["iteration"]) == 2

    resumed_events = []
    resumed = StyleTransfer().stylize(
        content, style, cfg, resume_state=latest,
        callback=lambda ev: resumed_events.append(ev.iteration),
    )
    assert resumed_events[0] == 4  # resumed at iter 2, first chunk ends at 4
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_resume_rejects_bad_scale(images):
    content, style = images
    bad = {
        "scale_index": np.asarray(99),
        "iteration": np.asarray(0),
        "image": np.zeros((1, 32, 32, 3), np.float32),
        "opt_state_leaves": [],
    }
    with pytest.raises(ValueError, match="scale"):
        StyleTransfer().stylize(content, style, _cfg(), resume_state=bad)
