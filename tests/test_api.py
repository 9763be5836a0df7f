"""End-to-end stylization on fixture weights at tiny sizes (SURVEY.md section 4,
"golden end-to-end"): deterministic, loss decreases, all driver configs'
feature combinations exercised on CPU.
"""

import numpy as np
import pytest

from style_transfer_tpu.api import StyleTransfer, StylizeConfig
from style_transfer_tpu.optim import OptimizerSpec


@pytest.fixture(scope="module")
def st():
    return StyleTransfer()  # fixture weights, CPU fp32


@pytest.fixture(scope="module")
def images(rng=None):
    r = np.random.RandomState(42)
    content = r.rand(48, 40, 3).astype(np.float32)
    style = r.rand(40, 48, 3).astype(np.float32)
    return content, style


def _small_cfg(**kw):
    base = dict(
        size=32,
        min_scale=32,
        iterations=(6,),
        chunk_size=3,
        content_layers=("conv2_2",),
        style_layers=("conv1_1", "conv2_1"),
        use_fused=False,
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
    )
    base.update(kw)
    return StylizeConfig(**base)


def test_single_scale_adam_runs_and_descends(st, images):
    content, style = images
    events = []
    out = st.stylize(content, style, _small_cfg(), callback=events.append)
    assert out.shape == (32, 28, 3)  # long side 32, aspect 48:40 -> rounded even
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    first = float(events[0].losses["loss"][0])
    last = float(events[-1].losses["loss"][-1])
    assert last < first


def test_deterministic_under_seed(st, images):
    content, style = images
    cfg = _small_cfg(init="random", seed=7)
    out1 = st.stylize(content, style, cfg)
    out2 = st.stylize(content, style, cfg)
    np.testing.assert_array_equal(out1, out2)


def test_multi_scale_pyramid(st, images):
    content, style = images
    cfg = _small_cfg(size=64, min_scale=32, iterations=(4, 2))
    events = []
    out = st.stylize(content, style, cfg, callback=events.append)
    assert out.shape == (64, 52, 3)  # 48x40 content -> long side 64, even-rounded
    sizes = sorted({ev.size for ev in events})
    assert len(sizes) == 2  # two scales ran
    assert events[-1].done


def test_multi_style_blending(st, images):
    content, style = images
    r = np.random.RandomState(3)
    style2 = r.rand(32, 32, 3).astype(np.float32)
    cfg = _small_cfg(style_blend_weights=[0.7, 0.3])
    out = st.stylize(content, [style, style2], cfg)
    assert np.isfinite(out).all()
    with pytest.raises(ValueError, match="blend weights"):
        st.stylize(content, [style, style2], _small_cfg(style_blend_weights=[1.0]))


def test_lbfgs_stylization(st, images):
    content, style = images
    cfg = _small_cfg(
        optimizer=OptimizerSpec("lbfgs", memory_size=5),
        iterations=(4,),
        chunk_size=2,
        tv_weight=0.5,
    )
    events = []
    out = st.stylize(content, style, cfg, callback=events.append)
    assert np.isfinite(out).all()
    first = float(events[0].losses["loss"][0])
    last = float(events[-1].losses["loss"][-1])
    assert last <= first


def test_convergence_matched_early_stop(st, images):
    content, style = images
    # tol=1 (100% relative change required to count as progress) stops after
    # stop_patience chunks: 3 + 2 = at most 9 of the planned 30 iterations.
    cfg = _small_cfg(iterations=(30,), stop_tol=1.0, stop_patience=2)
    events = []
    st.stylize(content, style, cfg, callback=events.append)
    assert events[-1].iteration <= 9 < 30


def test_init_modes(st, images):
    content, style = images
    for mode in ("content", "random", "mean"):
        out = st.stylize(content, style, _small_cfg(init=mode, iterations=(2,)))
        assert np.isfinite(out).all()
    with pytest.raises(ValueError, match="init"):
        st.stylize(content, style, _small_cfg(init="nope"))


def test_init_image_override(st, images):
    content, style = images
    r = np.random.RandomState(5)
    seed_img = r.rand(16, 16, 3).astype(np.float32)
    out = st.stylize(content, style, _small_cfg(iterations=(2,)), init_image=seed_img)
    assert out.shape == (32, 28, 3)


def test_custom_layer_weights(st, images):
    content, style = images
    cfg = _small_cfg(
        style_layers=("conv1_1", "conv2_1", "conv3_1"),
        style_layer_weights=(1.0, 2.0, 4.0),
        content_layers=("conv3_2",),
        content_layer_weights=(1.0,),
    )
    out = st.stylize(content, style, cfg)
    assert np.isfinite(out).all()


def test_fused_epilogue_end_to_end(st, images, monkeypatch):
    """The fused-epilogue dispatch (use_fused=True on a TPU) must reproduce
    the oracle stylization. Off-TPU the dispatch is a no-op, so force it —
    the kernels run in Pallas interpreter mode — and compare full runs."""
    from style_transfer_tpu.ops.pallas import epilogue as ep

    content, style = images
    monkeypatch.setattr(
        type(st), "_loss_fns", lambda self, cfg: (
            {"tv_loss_fn": ep.tv_loss, "content_loss_fn": ep.content_loss,
             "style_loss_fn": ep.style_loss}
            if cfg.use_fused else {}
        ),
    )
    st2 = type(st)()  # fresh program cache (st's cache predates the patch)
    out_fused = st2.stylize(content, style, _small_cfg(use_fused=True, iterations=(3,)))
    out_oracle = st2.stylize(content, style, _small_cfg(use_fused=False, iterations=(3,)))
    np.testing.assert_allclose(out_fused, out_oracle, rtol=1e-4, atol=1e-5)


def test_vgg16_stylization():
    """The whole pipeline runs on the VGG-16 family (arch from params)."""
    import numpy as np

    from style_transfer_tpu.api import StyleTransfer, StylizeConfig
    from style_transfer_tpu.models.weights import random_fixture

    r = np.random.RandomState(11)
    content = r.rand(48, 48, 3).astype(np.float32)
    style = r.rand(48, 48, 3).astype(np.float32)
    params, mean, std = random_fixture(0, arch="vgg16")
    st = StyleTransfer(params, mean=mean, std=std)
    assert st.arch == "vgg16"
    cfg = StylizeConfig(
        size=48, min_scale=48, iterations=(4,), chunk_size=2,
        style_layers=("conv1_1", "conv2_1", "conv3_1"),
    )
    out = st.stylize(content, style, cfg)
    assert out.shape == (48, 48, 3) and np.isfinite(out).all()


def test_program_cache_reused_across_calls():
    """Repeated stylize() with an equal config reuses the jitted programs
    (serving loop: no rebuild/retrace) and reproduces the result exactly."""
    import numpy as np

    from style_transfer_tpu.api import StyleTransfer, StylizeConfig

    r = np.random.RandomState(5)
    content = r.rand(32, 32, 3).astype(np.float32)
    style = r.rand(32, 32, 3).astype(np.float32)
    st = StyleTransfer()
    cfg = StylizeConfig(size=32, min_scale=32, iterations=(3,), chunk_size=3,
                        style_layers=("conv1_1", "conv2_1"))
    out1 = st.stylize(content, style, cfg)
    progs1 = dict(st._prog_cache)
    out2 = st.stylize(content, style, cfg)
    assert list(st._prog_cache) == list(progs1)
    assert all(st._prog_cache[k] is progs1[k] for k in progs1)
    np.testing.assert_array_equal(out1, out2)


def test_debug_checks_raise_on_nonfinite():
    import numpy as np
    import pytest

    from style_transfer_tpu.api import StyleTransfer, StylizeConfig
    from style_transfer_tpu.optim import OptimizerSpec

    r = np.random.RandomState(5)
    content = r.rand(32, 32, 3).astype(np.float32)
    style = r.rand(32, 32, 3).astype(np.float32)
    st = StyleTransfer()
    # a huge learning rate diverges to inf within a few Adam steps? Adam is
    # bounded by lr per step; instead poison via a non-finite init image.
    bad_init = np.full((32, 32, 3), np.nan, np.float32)
    cfg = StylizeConfig(size=32, min_scale=32, iterations=(2,), chunk_size=2,
                        style_layers=("conv1_1",), debug_checks=True)
    with pytest.raises(FloatingPointError, match="non-finite"):
        st.stylize(content, style, cfg, init_image=bad_init)


def test_remat_path_matches_default():
    """remat=True recomputes the forward in the backward — same trajectory."""
    import numpy as np

    from style_transfer_tpu.api import StyleTransfer, StylizeConfig

    r = np.random.RandomState(6)
    content = r.rand(32, 32, 3).astype(np.float32)
    style = r.rand(32, 32, 3).astype(np.float32)
    st = StyleTransfer()
    kw = dict(size=32, min_scale=32, iterations=(3,), chunk_size=3,
              style_layers=("conv1_1", "conv2_1"))
    out_plain = st.stylize(content, style, StylizeConfig(remat=False, **kw))
    out_remat = st.stylize(content, style, StylizeConfig(remat=True, **kw))
    # recompute-vs-stored reassociates a few fp32 ops -> ~1e-6 drift
    np.testing.assert_allclose(out_remat, out_plain, atol=5e-6)


def test_iterate_averaging_ema():
    """avg_decay returns the EMA of iterates; matches a manual replay."""
    import numpy as np

    from style_transfer_tpu.api import StyleTransfer, StylizeConfig

    r = np.random.RandomState(8)
    content = r.rand(32, 32, 3).astype(np.float32)
    style = r.rand(32, 32, 3).astype(np.float32)
    st = StyleTransfer()
    kw = dict(size=32, min_scale=32, iterations=(5,), chunk_size=5,
              style_layers=("conv1_1", "conv2_1"))

    # capture the raw trajectory via per-iteration chunks with decay off
    raw_iterates = []
    cfg_raw = StylizeConfig(**{**kw, "chunk_size": 1})
    st.stylize(content, style, cfg_raw,
               callback=lambda ev: raw_iterates.append(ev.get_state()["image"][0]))

    decay = 0.7
    out_ema = st.stylize(content, style, StylizeConfig(avg_decay=decay, **kw))

    # manual EMA starting at the init image (= content)
    ema = content.copy()
    for it in raw_iterates:
        ema = decay * ema + (1 - decay) * it
    np.testing.assert_allclose(out_ema, np.clip(ema, 0, 1), atol=1e-5)

    # decay=0 path returns the raw final iterate
    out_raw = st.stylize(content, style, StylizeConfig(**kw))
    np.testing.assert_allclose(out_raw, np.clip(raw_iterates[-1], 0, 1), atol=1e-5)


def test_early_stop_final_event_is_done(st, images, tmp_path):
    """stop_tol termination on the last scale must still emit done=True so
    snapshot savers and the web UI fire their final action (VERDICT r1 #5)."""
    from style_transfer_tpu.utils.snapshots import SnapshotSaver

    content, style = images
    cfg = _small_cfg(iterations=(30,), stop_tol=1.0, stop_patience=2)
    events = []
    saver = SnapshotSaver(str(tmp_path / "out.png"), every=1000)  # only done fires
    out = st.stylize(
        content, style, cfg, callback=lambda ev: (events.append(ev), saver(ev))
    )
    assert events[-1].iteration < 30  # the run really stopped early
    assert events[-1].done
    assert (tmp_path / "out_snapshot.png").exists()
    snap = np.asarray(__import__("PIL.Image", fromlist=["open"]).open(
        tmp_path / "out_snapshot.png"
    ), dtype=np.float32) / 255.0
    np.testing.assert_allclose(snap, out, atol=1.5 / 255)


def test_get_image_survives_later_chunks(st, images):
    """ProgressEvent.get_image is backed by a private device snapshot: calling
    it after later chunks have donated the live image buffer must still work
    (the web monitor fetches frames from its server thread)."""
    content, style = images
    events = []
    st.stylize(content, style, _small_cfg(), callback=events.append)
    first_img = events[0].get_image()  # fetched long after the run finished
    last_img = events[-1].get_image()
    assert first_img.shape == last_img.shape == (32, 28, 3)
    assert np.isfinite(first_img).all()
    assert not np.array_equal(first_img, last_img)


def test_pipelined_matches_sequential(st, images):
    """The pipelined chunk loop (default) must be bit-identical to the
    sequential loop — same programs in the same order; only host scheduling
    differs (api.py pipelined optimize loop)."""
    content, style = images
    for kw in (
        {},  # plain multi-chunk
        {"avg_decay": 0.9},  # EMA carry (rollback copies include ema)
        {"iterations": (30,), "stop_tol": 0.5, "stop_patience": 1},  # early stop
    ):
        seq = st.stylize(content, style, _small_cfg(pipeline_chunks=False, **kw))
        pipe = st.stylize(content, style, _small_cfg(pipeline_chunks=True, **kw))
        np.testing.assert_array_equal(seq, pipe)


def test_pipelined_event_stream_matches_sequential(st, images):
    """Event ordering, iteration counts, losses, and done flags are
    unaffected by pipelining — including the early-stopped final event."""
    content, style = images
    cfg_kw = dict(iterations=(30,), stop_tol=0.5, stop_patience=1)
    runs = {}
    for pipelined in (False, True):
        events = []
        st.stylize(
            content, style,
            _small_cfg(pipeline_chunks=pipelined, **cfg_kw),
            callback=events.append,
        )
        runs[pipelined] = events
    assert len(runs[False]) == len(runs[True])
    for a, b in zip(runs[False], runs[True]):
        assert (a.scale_index, a.iteration, a.done) == (b.scale_index, b.iteration, b.done)
        np.testing.assert_array_equal(a.losses["loss"], b.losses["loss"])
    assert runs[True][-1].done


def test_pipelined_get_state_is_consistent(st, images):
    """get_state under pipelining reads pre-donation copies: resuming from a
    mid-run checkpoint must reproduce the uninterrupted run exactly."""
    content, style = images
    cfg = _small_cfg(iterations=(9,), chunk_size=3)
    states = []
    full = st.stylize(
        content, style, cfg, callback=lambda ev: states.append(ev.get_state())
    )
    assert len(states) == 3
    mid = states[0]  # after 3 of 9 iterations
    assert int(mid["iteration"]) == 3
    resumed = st.stylize(content, style, cfg, resume_state=mid)
    np.testing.assert_array_equal(full, resumed)


def test_fused_block1_end_to_end(st, images):
    """fused_block1=True (opt-in; interpret mode off-TPU) must reproduce the
    oracle stylization through the full API at tolerance."""
    content, style = images
    cfg_kw = dict(
        iterations=(4,),
        content_layers=("conv3_1",),
        style_layers=("conv1_1", "conv2_1"),
    )
    out_fused = st.stylize(content, style, _small_cfg(fused_block1=True, use_fused=True, **cfg_kw))
    out_oracle = st.stylize(content, style, _small_cfg(fused_block1=False, **cfg_kw))
    np.testing.assert_allclose(out_fused, out_oracle, rtol=1e-3, atol=1e-4)


def test_output_dtype_uint8_matches_float_quantization(st, images):
    """stylize(output_dtype='uint8') quantizes on device exactly like
    imgio.to_uint8 applied to the float result."""
    from style_transfer_tpu.utils.imgio import to_uint8

    content, style = images
    cfg = _small_cfg(iterations=(4,))
    out_f = st.stylize(content, style, cfg)
    out_u = st.stylize(content, style, cfg, output_dtype="uint8")
    assert out_u.dtype == np.uint8 and out_u.shape == out_f.shape
    np.testing.assert_array_equal(out_u, to_uint8(out_f))
    with pytest.raises(ValueError, match="output_dtype"):
        st.stylize(content, style, cfg, output_dtype="float16")


def test_odd_size_warns_about_even_rounding(st, images):
    """An odd requested size is delivered even-rounded (VGG pooling) — the
    user gets a warning naming both sizes rather than a silent shape change."""
    import warnings

    content, style = images
    with pytest.warns(UserWarning, match="rounded"):
        out = st.stylize(content, style, _small_cfg(size=(33, 27), iterations=(2,)))
    assert out.shape[0] % 2 == 0 and out.shape[1] % 2 == 0
    # exact even requests pass through silently
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        st.stylize(content, style, _small_cfg(size=(32, 28), iterations=(2,)))


def test_metrics_summary_drops_first_chunk():
    """MetricsRecorder.summary() uses steady chunks only (first chunk per
    scale absorbs compile + pipeline fill), matching bench.py's methodology."""
    from style_transfer_tpu.utils.progress import MetricsRecorder, ProgressEvent

    rec = MetricsRecorder()
    rates = {0: [1.0, 10.0, 12.0], 1: [2.0]}
    for scale, rs in rates.items():
        for i, r in enumerate(rs):
            rec(
                ProgressEvent(
                    scale_index=scale, num_scales=2, size=(8, 8), iteration=i + 1,
                    total_iterations=len(rs), losses={"loss": np.asarray([1.0])},
                    its_per_sec=r, get_image=lambda: None,
                )
            )
    s = rec.summary()
    # scale 0: first chunk (1.0, compile-laden) dropped -> mean(10, 12)
    assert s["per_scale_its_per_sec"][0] == pytest.approx(11.0)
    assert s["per_scale_chunks_counted"][0] == 2
    # single-chunk scales keep their only sample
    assert s["per_scale_its_per_sec"][1] == pytest.approx(2.0)


def test_packed_block1_end_to_end(st, images):
    """packed_block1=True (forced; interpret mode off-TPU) must reproduce
    the oracle stylization through the full API at tolerance; auto mode
    stays off on the CPU backend."""
    content, style = images
    cfg_kw = dict(
        iterations=(4,),
        content_layers=("conv3_1",),
        style_layers=("conv1_1", "conv2_1"),
    )
    assert not st._packed_block1_eligible(
        StylizeConfig(**{**_small_cfg(**cfg_kw).__dict__, "use_fused": True})
    )  # auto requires the TPU backend
    out_packed = st.stylize(
        content, style, _small_cfg(packed_block1=True, use_fused=True, **cfg_kw)
    )
    out_oracle = st.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_allclose(out_packed, out_oracle, rtol=1e-3, atol=1e-4)


def test_packed_block2_end_to_end(st, images):
    """packed_block1+packed_block2 forced (interpret mode off-TPU) must
    reproduce the oracle stylization through the full API; block 2 engages
    only when the pooled dims are even (size 48 -> pool1 24x21? no — use a
    multiple-of-4 size so the gate opens)."""
    content, style = images
    cfg_kw = dict(
        size=(48, 40),  # pool1 24x20: even -> block-2 gate open
        iterations=(4,),
        content_layers=("conv3_1",),
        style_layers=("conv1_1", "conv2_1"),
    )
    out_packed = st.stylize(
        content, style,
        _small_cfg(packed_block1=True, packed_block2=True, use_fused=True, **cfg_kw),
    )
    out_oracle = st.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_allclose(out_packed, out_oracle, rtol=2e-3, atol=2e-4)


def test_packed_block3_end_to_end(st, images):
    """The full packed chain (blocks 1-3 forced; interpret mode off-TPU)
    must reproduce the oracle stylization through the public API."""
    content, style = images
    cfg_kw = dict(
        size=(48, 40),  # pool2 12x10: even -> block-3 gate open
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1"),
    )
    out_packed = st.stylize(
        content, style,
        _small_cfg(packed_block1=True, packed_block2=True, packed_block3=True,
                   use_fused=True, **cfg_kw),
    )
    out_oracle = st.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_allclose(out_packed, out_oracle, rtol=2e-3, atol=3e-4)


def test_packed_block4_end_to_end(st, images):
    """The full packed chain through block 4's front pair (forced;
    interpret mode off-TPU): conv4_2 content comes from the pair's own
    output, conv4_1's Gram from its override."""
    content, style = images
    cfg_kw = dict(
        size=(48, 40),
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
    )
    out_packed = st.stylize(
        content, style,
        _small_cfg(packed_block1=True, packed_block2=True, packed_block3=True,
                   packed_block4=True, use_fused=True, **cfg_kw),
    )
    out_oracle = st.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_allclose(out_packed, out_oracle, rtol=2e-3, atol=3e-4)


def test_packed_block4_no_deeper_layers(st, images):
    """conv4_2 as the deepest layer: the extract_features call is skipped
    entirely (everything comes from kernels)."""
    content, style = images
    cfg_kw = dict(
        size=(48, 40),
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1"),
    )
    out_packed = st.stylize(
        content, style,
        _small_cfg(packed_block1=True, packed_block2=True, packed_block3=True,
                   packed_block4=True, use_fused=True, **cfg_kw),
    )
    out_oracle = st.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_allclose(out_packed, out_oracle, rtol=2e-3, atol=3e-4)


def test_packed_block4_full_chain_end_to_end(st, images):
    """Even pool3 extents + no block-4-tail feature layers: the chain runs
    through pool4 (front pair then tail pair) and conv5_1 resumes via
    start_block=5. Must reproduce the oracle through the public API."""
    content, style = images
    cfg_kw = dict(
        size=(64, 48),  # pool3 8x6: even -> block-4 tail gate open
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
    )
    out_packed = st.stylize(
        content, style,
        _small_cfg(packed_block1=True, packed_block2=True, packed_block3=True,
                   packed_block4=True, use_fused=True, **cfg_kw),
    )
    out_oracle = st.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_allclose(out_packed, out_oracle, rtol=2e-3, atol=3e-4)


def test_packed_block4_full_chain_dispatches_conv_gram(st, images, monkeypatch):
    """With the block-4 tail chained and conv5_1 the sole remaining
    (style-only) layer, the fused conv+Gram kernel carries it — the whole
    VGG forward runs in Pallas and extract_features is never called."""
    from style_transfer_tpu.models import vgg as vgg_mod
    from style_transfer_tpu.ops.pallas import conv_gram as CG

    calls = []
    real = CG.conv_gram
    monkeypatch.setattr(CG, "conv_gram", lambda *a: calls.append(1) or real(*a))

    # the objective must not fall back to extract_features (the capture
    # programs legitimately use it for the target features)
    real_extract = vgg_mod.extract_features

    def spy_extract(*a, **kw):
        assert kw.get("start_block", 1) == 1, (
            "objective fell back to extract_features mid-chain"
        )
        return real_extract(*a, **kw)

    monkeypatch.setattr(vgg_mod, "extract_features", spy_extract)
    content, style = images
    st2 = StyleTransfer(params=st.params)  # fresh program cache
    out = st2.stylize(
        content, style,
        _small_cfg(
            size=(64, 48), min_scale=64, iterations=(2,),
            content_layers=("conv4_2",),
            style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
            packed_block1=True, packed_block2=True, packed_block3=True,
            packed_block4=True, use_fused=True,
        ),
    )
    assert calls and np.isfinite(out).all()


def test_off_grid_width_falls_back_to_xla_under_mosaic_gates(
    st, images, monkeypatch
):
    """On real TPU (simulated here by pinning ``vmem._mosaic`` True) a
    width off the 16-row sublane grid must route the WHOLE objective to
    the XLA path — no Pallas kernel dispatch, no compile attempt — and
    still reproduce the oracle bit-for-bit (same XLA program). Width 48
    puts packed block 1 at w2=24, off-grid; this pins the round-4
    regression's fallback direction explicitly (vmem.py misalignment
    probe: w=260 fails scoped VMEM, w=264 compiles for 504 s)."""
    from style_transfer_tpu.ops.pallas import block1_packed as B1P
    from style_transfer_tpu.ops.pallas import vmem as VM

    monkeypatch.setattr(VM, "_mosaic", lambda: True)
    calls = []
    real = B1P.block1_packed
    monkeypatch.setattr(
        B1P, "block1_packed", lambda *a: calls.append(1) or real(*a)
    )
    content, style = images
    cfg_kw = dict(size=(64, 48), iterations=(2,), min_scale=64)
    st2 = StyleTransfer(params=st.params)  # fresh program cache
    out_forced = st2.stylize(
        content, style,
        _small_cfg(packed_block1=True, packed_block2=True, use_fused=True,
                   **cfg_kw),
    )
    assert not calls, "off-grid width dispatched a Pallas kernel under Mosaic gates"
    out_oracle = st2.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_array_equal(out_forced, out_oracle)


def test_full_chain_mirror_matches_real_dispatch(st, monkeypatch):
    """_full_chain_dispatches is the auto-remat mirror of the objective's
    kernel-dispatch gates; if the two drift, remat=None could stay off past
    REMAT_AUTO_PIXELS while part of the chain silently falls back to XLA —
    HBM exhaustion at 4K. This traces the REAL dispatch (jax.eval_shape on
    the objective closure — no compile, no compute, dispatch decisions all
    fire at trace time) at the exact regime the mirror unlocks: 4096x4096,
    hardware gate semantics (vmem._mosaic pinned True), and asserts the
    full chain engages — packed block 1, four two-conv segments, the
    conv5_1 conv+Gram — with extract_features never reachable."""
    import jax

    from style_transfer_tpu import api as api_mod
    from style_transfer_tpu.models import vgg as vgg_mod
    from style_transfer_tpu.ops import losses as L
    from style_transfer_tpu.ops.pallas import block1_packed as B1P
    from style_transfer_tpu.ops.pallas import block2 as B2F
    from style_transfer_tpu.ops.pallas import conv_gram as CG
    from style_transfer_tpu.ops.pallas import conv_pair as CP
    from style_transfer_tpu.ops.pallas import conv_single as CSG
    from style_transfer_tpu.ops.pallas import vmem as VM

    monkeypatch.setattr(VM, "_mosaic", lambda: True)
    cfg = _small_cfg(
        use_fused=True, packed_block1=True, packed_block2=True,
        packed_block3=True, packed_block4=True,
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
    )
    all_layers = tuple(
        dict.fromkeys(list(cfg.content_layers) + list(cfg.style_layers))
    )
    obj = st._build_objective(
        cfg,
        c_weights=L.normalize_layer_weights(
            cfg.content_layers, cfg.content_layer_weights
        ),
        s_weights=L.normalize_layer_weights(
            cfg.style_layers, cfg.style_layer_weights
        ),
        all_layers=all_layers,
        gram_fn=st._gram_fn(cfg),
        loss_fns=st._loss_fns(cfg),
        fused_b1=False, packed_b1=True, packed_b2=True,
        packed_b3=True, packed_b4=True,
    )

    events = []

    def _spy(tag, real):
        return lambda *a, **kw: events.append(tag) or real(*a, **kw)

    monkeypatch.setattr(B1P, "block1_packed", _spy("b1", B1P.block1_packed))
    monkeypatch.setattr(
        CSG, "make_pair_of_singles", _spy("seg", CSG.make_pair_of_singles)
    )
    monkeypatch.setattr(CP, "pair_gram", _spy("seg", CP.pair_gram))
    monkeypatch.setattr(CP, "pair_pool", _spy("seg", CP.pair_pool))
    monkeypatch.setattr(B2F, "block2_fused", _spy("seg", B2F.block2_fused))
    monkeypatch.setattr(CG, "conv_gram", _spy("cg", CG.conv_gram))

    def _no_xla_fallback(*a, **kw):
        raise AssertionError(
            "objective fell back to extract_features while the mirror "
            "promised full-chain dispatch"
        )

    monkeypatch.setattr(vgg_mod, "extract_features", _no_xla_fallback)

    H = W = 4096
    assert api_mod._full_chain_dispatches(
        H, W, packed=(True, True, True, True), all_layers=all_layers,
        n_dev=None,
    )
    img = jax.ShapeDtypeStruct((1, H, W, 3), np.float32)
    c_t = {"conv4_2": jax.ShapeDtypeStruct((1, H // 8, W // 8, 512), np.float32)}
    s_t = {
        l: jax.ShapeDtypeStruct((c, c), np.float32)
        for l, c in (("conv1_1", 64), ("conv2_1", 128), ("conv3_1", 256),
                     ("conv4_1", 512), ("conv5_1", 512))
    }
    loss, terms = jax.eval_shape(obj, st.params, img, c_t, s_t)
    assert loss.shape == ()
    assert events.count("b1") == 1, events
    # blocks 2, 3 (two segments), 4 (front + tail) = 5 two-conv segments
    assert events.count("seg") == 5, events
    assert events.count("cg") == 1, events


def test_packed_block4_tail_skipped_when_tail_layer_requested(st, images):
    """A block-4-tail feature layer (conv4_4) forces the front-pair-only
    path (tail activations must materialize in XLA); the result still
    matches the oracle."""
    content, style = images
    cfg_kw = dict(
        size=(64, 48),
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv3_1", "conv4_1", "conv4_4"),
    )
    out_packed = st.stylize(
        content, style,
        _small_cfg(packed_block1=True, packed_block2=True, packed_block3=True,
                   packed_block4=True, use_fused=True, **cfg_kw),
    )
    out_oracle = st.stylize(content, style, _small_cfg(**cfg_kw))
    np.testing.assert_allclose(out_packed, out_oracle, rtol=2e-3, atol=3e-4)


def test_packed_chain_under_remat_is_exact(st, images):
    """remat=True wraps each fused kernel in jax.checkpoint, so residuals
    are recomputed inside that block's backward — the recompute runs the
    identical program, so the result must be BIT-IDENTICAL to the
    non-remat packed run. (A packed-vs-oracle comparison is not pinned
    here: that pairing can hit ReLU knife edges — see tests/test_block2.py.)"""
    content, style = images
    cfg_kw = dict(
        size=(48, 40),
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1"),
        packed_block1=True, packed_block2=True, packed_block3=True,
        use_fused=True,
    )
    out_remat = st.stylize(content, style, _small_cfg(remat=True, **cfg_kw))
    out_plain = st.stylize(content, style, _small_cfg(remat=False, **cfg_kw))
    np.testing.assert_array_equal(out_remat, out_plain)


def test_full_chain_under_remat_is_exact(st, images):
    """Same bit-exactness guarantee for the chain through block 4 and the
    conv5_1 conv+Gram kernel (every kernel call remats independently)."""
    content, style = images
    cfg_kw = dict(
        size=(64, 48), min_scale=64,
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
        packed_block1=True, packed_block2=True, packed_block3=True,
        packed_block4=True, use_fused=True,
    )
    out_remat = st.stylize(content, style, _small_cfg(remat=True, **cfg_kw))
    out_plain = st.stylize(content, style, _small_cfg(remat=False, **cfg_kw))
    np.testing.assert_array_equal(out_remat, out_plain)


def test_full_chain_w_chunked_end_to_end(monkeypatch):
    """The 4096px-scale regime (W-chunked fp32 tap sums, auto-engaged above
    effective width 2048) composed through the api dispatch and remat:
    forcing the chunk count to 2 must reproduce the oracle stylization.

    Two traps this test must dodge (both bitten before): the custom-VJP
    kernel singletons cache traces by shape, so an earlier UNCHUNKED trace
    at the same shape would make the monkeypatch invisible — the size here
    (128px square) is unique in the suite, and a call-counting spy asserts
    the patch actually engaged; and chunk widths must stay even at every
    level for the pooling epilogues (128 -> block-4 width 16, chunks of 8).
    """
    from style_transfer_tpu.ops.pallas import block1_packed as B1P
    from style_transfer_tpu.ops.pallas import conv_pair as CP

    r = np.random.RandomState(0)  # seed with ReLU knife-edge margin
    content = r.rand(128, 128, 3).astype(np.float32)
    style = r.rand(64, 64, 3).astype(np.float32)
    cfg_kw = dict(
        size=128, min_scale=128,
        iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
        packed_block1=True, packed_block2=True, packed_block3=True,
        packed_block4=True,
        # low lr: Adam's m/sqrt(v) normalization amplifies accumulation-
        # order differences near zero-gradient pixels; the kernel-level
        # tests own bit-exactness, this test owns the dispatch wiring
        optimizer=OptimizerSpec("adam", learning_rate=0.01),
    )
    calls = [0]

    def forced_chunks(w, c):
        calls[0] += 1
        return 2

    monkeypatch.setattr(B1P, "_w_chunks", forced_chunks)
    monkeypatch.setattr(CP, "_w_chunks", forced_chunks)
    st2 = StyleTransfer()
    out_chunked = st2.stylize(
        content, style, _small_cfg(remat=True, use_fused=True, **cfg_kw)
    )
    assert calls[0] > 0, "forced _w_chunks never consulted — dispatch not chunked"
    out_oracle = st2.stylize(
        content, style, _small_cfg(remat=True, use_fused=False, **cfg_kw)
    )
    np.testing.assert_allclose(out_chunked, out_oracle, rtol=2e-3, atol=3e-4)


def test_singles_dispatch_end_to_end(monkeypatch):
    """The 4096px-scale VMEM regime routed through the api: forcing every
    two-conv segment onto the singles decomposition (vmem.segment_impl ->
    'singles') must reproduce the oracle stylization, and a spy asserts
    the singles factory actually carried the chain."""
    from style_transfer_tpu.ops.pallas import conv_single as CSG
    from style_transfer_tpu.ops.pallas import vmem as VM

    r = np.random.RandomState(3)
    content = r.rand(96, 96, 3).astype(np.float32)
    style = r.rand(64, 64, 3).astype(np.float32)
    cfg_kw = dict(
        size=96, min_scale=96, iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
        packed_block1=True, packed_block2=True, packed_block3=True,
        packed_block4=True,
        optimizer=OptimizerSpec("adam", learning_rate=0.01),
    )
    made = []
    real_make = CSG.make_pair_of_singles

    def spy(*, pool, gram, mesh=None, axis=None):
        made.append((pool, gram))
        return real_make(pool=pool, gram=gram, mesh=mesh, axis=axis)

    monkeypatch.setattr(VM, "segment_impl", lambda *a, **k: "singles")
    monkeypatch.setattr(CSG, "make_pair_of_singles", spy)
    st = StyleTransfer()
    out_singles = st.stylize(
        content, style, _small_cfg(remat=True, use_fused=True, **cfg_kw)
    )
    # block 2 (pool+gram), fronts of 3+4 (gram), tails of 3+4 (pool)
    assert set(made) == {(True, True), (False, True), (True, False)}
    out_oracle = st.stylize(
        content, style, _small_cfg(remat=True, use_fused=False, **cfg_kw)
    )
    np.testing.assert_allclose(out_singles, out_oracle, rtol=2e-3, atol=3e-4)


def test_xla_block1_chain_end_to_end(monkeypatch):
    """Beyond the packed block-1 envelope (vmem.block1_fits False — the
    4096px scale) block 1 runs on XLA and the Pallas chain starts at
    block 2. Must reproduce the oracle, deliver the conv1_1 Gram through
    the override path, and still chain blocks 2+ (spied)."""
    from style_transfer_tpu.ops.pallas import conv_single as CSG
    from style_transfer_tpu.ops.pallas import vmem as VM

    r = np.random.RandomState(4)
    content = r.rand(96, 96, 3).astype(np.float32)
    style = r.rand(64, 64, 3).astype(np.float32)
    cfg_kw = dict(
        size=96, min_scale=96, iterations=(3,),
        content_layers=("conv4_2",),
        style_layers=("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
        packed_block1=True, packed_block2=True, packed_block3=True,
        packed_block4=True,
        optimizer=OptimizerSpec("adam", learning_rate=0.01),
    )
    made = []
    real_make = CSG.make_pair_of_singles

    def spy(*, pool, gram, mesh=None, axis=None):
        made.append((pool, gram))
        return real_make(pool=pool, gram=gram, mesh=mesh, axis=axis)

    monkeypatch.setattr(VM, "block1_fits", lambda w: False)
    monkeypatch.setattr(VM, "segment_impl", lambda *a, **k: "singles")
    monkeypatch.setattr(CSG, "make_pair_of_singles", spy)
    st = StyleTransfer()
    out = st.stylize(
        content, style, _small_cfg(remat=True, use_fused=True, **cfg_kw)
    )
    assert set(made) == {(True, True), (False, True), (True, False)}
    out_oracle = st.stylize(
        content, style, _small_cfg(remat=True, use_fused=False, **cfg_kw)
    )
    np.testing.assert_allclose(out, out_oracle, rtol=2e-3, atol=3e-4)


# ------------------------- auto-remat threshold selection (round 4)

DEFAULT_LAYERS = (
    "conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1", "conv4_2",
)


def test_full_chain_predicate_true_at_4096():
    """The measured no-remat fit (4096x4096, full chain, v5e) must be
    recognized so remat=None picks the stored-activation backward there."""
    from style_transfer_tpu import api

    assert api._full_chain_dispatches(
        4096, 4096, packed=(True,) * 4, all_layers=DEFAULT_LAYERS, n_dev=None
    )
    # ... and the fused threshold actually covers that shape while the
    # conservative one does not.
    assert api.REMAT_AUTO_PIXELS <= 4096 * 4096 < api.REMAT_AUTO_PIXELS_FUSED


def test_full_chain_predicate_conservative_cases():
    """Anything short of the hardware-measured full-chain case keeps the
    conservative threshold: partial packing, tail-layer requests, odd
    extents, shapes past block 1's validated envelope."""
    from style_transfer_tpu import api

    kw = dict(all_layers=DEFAULT_LAYERS, n_dev=None)
    # any missing packed block
    for i in range(4):
        packed = tuple(j != i for j in range(4))
        assert not api._full_chain_dispatches(4096, 4096, packed=packed, **kw)
    # block-4 tail layer requested -> tail pair skipped -> XLA remainder
    assert not api._full_chain_dispatches(
        4096, 4096, packed=(True,) * 4,
        all_layers=DEFAULT_LAYERS + ("conv4_3",), n_dev=None,
    )
    # extents not clean through pool3
    assert not api._full_chain_dispatches(
        4104, 4096, packed=(True,) * 4, **kw
    )
    # past block 1's validated envelope (eff 8192 at w=8192)
    assert not api._full_chain_dispatches(
        8192, 8192, packed=(True,) * 4, **kw
    )


def test_full_chain_predicate_mesh_rows():
    """On a mesh the predicate demands clean, >=4-row shards at every
    pool depth — per-device pixels are already 1/n_dev so the extended
    threshold rarely matters there, but the gate must not lie."""
    from style_transfer_tpu import api

    kw = dict(packed=(True,) * 4, all_layers=DEFAULT_LAYERS)
    assert api._full_chain_dispatches(4096, 4096, n_dev=8, **kw)
    # pool3 rows (h//8 = 32) shard to 4 rows/device: halo still ok at 4,
    # but 16 rows -> 2 rows/device is below the 4-row halo
    assert not api._full_chain_dispatches(128, 4096, n_dev=8, **kw)


def test_grid_snap_restores_exact_requested_size(st, images):
    """grid_snap=True optimizes at fused-grid sizes but the delivered
    image is the EXACT (even-rounded) requested size, restored by a final
    on-device resize; a snap warning names both sizes. 100px requests a
    96px optimize (32-grid within the 4% tolerance)."""
    import warnings as w

    content, style = images
    cfg = _small_cfg(size=(100, 100), min_scale=100, iterations=(2,),
                     grid_snap=True)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        out = st.stylize(content, style, cfg)
    assert out.shape == (100, 100, 3)
    assert any("snapped to the fused kernel grid" in str(x.message) for x in rec)
    # default (auto) on CPU: no snapping, no snap warning, same shape
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        out2 = st.stylize(content, style, _small_cfg(
            size=(100, 100), min_scale=100, iterations=(2,)))
    assert out2.shape == (100, 100, 3)
    assert not any("fused kernel grid" in str(x.message) for x in rec)


def test_max_pooling_warns_about_fused_chain(st, images, monkeypatch):
    """pooling='max' structurally disqualifies the fused VGG chain (the
    kernels fold 2x2 AVERAGE pooling into their conv epilogues), so a TPU
    run must say it is on the XLA path instead of silently losing the
    kernel tier (VERDICT r4 item 6)."""
    import warnings as w

    import jax

    from style_transfer_tpu import api as api_mod

    monkeypatch.setattr(api_mod.jax, "default_backend", lambda: "tpu")
    content, style = images
    st_max = StyleTransfer(params=st.params, pooling="max")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        out = st_max.stylize(content, style, _small_cfg(
            use_fused=True, iterations=(2,)))
    assert np.isfinite(out).all()
    assert any("disables the fused Pallas VGG chain" in str(x.message)
               for x in rec)
    # average pooling at the same config: no such warning (packed dispatch
    # disabled — the patched "tpu" backend would otherwise route the
    # kernels through the real Mosaic lowering, which CPU cannot run)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        st.stylize(content, style, _small_cfg(
            use_fused=True, iterations=(2,), packed_block1=False))
    assert not any("disables the fused" in str(x.message) for x in rec)


def test_resolution_ceiling_excess_boundary():
    """The pure ceiling predicate mirrors the hardware bisect (round 5):
    5632^2 compiles (block-1 activation 5632^2*64 = 0.945 * 2^31), 5888^2
    crashes (1.033 * 2^31); H-sharding divides the per-device count."""
    from style_transfer_tpu import api as api_mod

    assert api_mod.resolution_ceiling_excess([(5632, 5632)]) is None
    assert api_mod.resolution_ceiling_excess([(5888, 5888)]) == (5888, 5888)
    # exactly at the limit (4096px gram operand analogue): allowed
    assert api_mod.resolution_ceiling_excess([(2 ** 31 // 64 // 4096, 4096)]) is None
    # the mesh divides H: 8 devices lift 8192^2 far under the limit
    assert api_mod.resolution_ceiling_excess([(8192, 8192)]) == (8192, 8192)
    assert api_mod.resolution_ceiling_excess([(8192, 8192)], n_dev=8) is None
    # first offender is reported, in order
    assert api_mod.resolution_ceiling_excess(
        [(512, 512), (6144, 6144), (8192, 8192)]
    ) == (6144, 6144)


def test_stylize_rejects_over_ceiling_size_on_tpu(st, images, monkeypatch):
    """A single-device TPU run whose plan crosses the compile ceiling must
    raise the actionable error BEFORE any compile (round 5; the raw failure
    is an opaque compile-helper crash)."""
    from style_transfer_tpu import api as api_mod

    monkeypatch.setattr(api_mod.jax, "default_backend", lambda: "tpu")
    content, style = images
    with pytest.raises(ValueError, match="resolution ceiling"):
        st.stylize(content, style, _small_cfg(
            size=(5888, 5888), min_scale=5888, packed_block1=False))
    # style_scale can push the STYLE capture over the ceiling even when
    # the optimize sizes are fine
    with pytest.raises(ValueError, match="resolution ceiling"):
        st.stylize(content, style, _small_cfg(
            size=(4096, 4096), min_scale=4096, style_scale=2.0,
            packed_block1=False))
