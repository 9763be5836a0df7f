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
