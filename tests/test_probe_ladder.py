"""Smoke test for the resolution-ladder probe (scripts/probe_ladder.py):
the CPU path must run a tiny two-scale ladder end-to-end, emit one
dispatch record per scale, per-scale timing records, and a summary line
with no error.
"""

import importlib.util
import json
import os


def _load():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "probe_ladder", os.path.join(repo, "scripts", "probe_ladder.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_smoke_tiny_ladder(capsys):
    mod = _load()
    rc = mod.main([
        "--size", "96", "--min-scale", "48",
        "--iterations", "4", "3", "--chunk-size", "2",
    ])
    assert rc == 0
    records = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    dispatch = [r for r in records if "dispatch" in r]
    timings = [r for r in records if "steady_its_per_sec" in r]
    summary = [r for r in records if r.get("metric", "").startswith("ladder_")]
    assert {r["scale"] for r in dispatch} == {48, 96}
    assert {r["scale"] for r in timings} == {48, 96}
    # off-TPU the gates see interpret mode: the probe pins tpu=True, so
    # the dispatch picture matches what a real TPU ladder would do
    by_scale = {r["scale"]: r["dispatch"] for r in dispatch}
    assert by_scale[96]["block1"] == "packed"
    (s,) = summary
    assert s["error"] is None and s["value"] > 0
    assert s["iterations"] == [4, 3]
