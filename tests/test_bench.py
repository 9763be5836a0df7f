"""bench.py smoke test: the driver-facing JSON contract must hold."""

import json
import sys

sys.path.insert(0, ".")


def test_bench_emits_one_json_line(capsys):
    from bench import main

    rc = main(["--size", "64", "--iterations", "2", "--skip-rates"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"stdout must carry exactly the JSON line, got {out}"
    rec = json.loads(out[0])
    assert rec["metric"] == "wallclock_64px_multiscale"
    assert rec["unit"] == "s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert rec["devices"] >= 1


def test_bench_cold_flag(capsys):
    from bench import main

    rc = main(["--size", "64", "--iterations", "2", "--skip-rates", "--cold"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] > 0


def test_model_tflops_per_iter():
    """The closed-form FLOPs model behind the pct_peak_* keys: quadratic
    in size, and the 1024px value must sit in the independently estimated
    1.4-1.6 TFLOP/it band for VGG-19 fwd+frozen-bwd to conv5_1 + Grams
    (VERDICT round 3's roofline sanity estimate)."""
    from bench import model_tflops_per_iter

    t512 = model_tflops_per_iter(512)
    t1024 = model_tflops_per_iter(1024)
    assert 1.4 <= t1024 <= 1.7, t1024
    assert abs(t1024 / t512 - 4.0) < 0.02  # conv/gram work is quadratic


def test_error_record_strips_ansi_and_classifies():
    from bench import _error_record

    e = RuntimeError(
        "INTERNAL: http 500 \x1b[2mnoise\x1b[0m ... Scoped allocation with "
        "size 17.83M and limit 16.00M exceeded scoped vmem limit by 1.83M."
    )
    rec = _error_record("4096px", e)
    assert rec["error_kind"] == "scoped_vmem_overflow"
    assert "17.83M" in rec["detail"]
    assert "\x1b" not in rec["detail"]
