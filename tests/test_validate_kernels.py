"""Smoke test for the on-hardware kernel validation harness
(scripts/validate_kernels.py): the CPU/interpret path must run a kernel
case end-to-end, emit a JSON record per case, and exit 0 on agreement.
"""

import importlib.util
import json
import os
import sys


def _load():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "validate_kernels", os.path.join(repo, "scripts", "validate_kernels.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_smoke_one_block(capsys):
    mod = _load()
    rc = mod.main(["--sizes", "64", "--repeats", "0", "--blocks", "b2"])
    assert rc == 0
    records = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert len(records) == 1
    (rec,) = records
    assert rec["kernel"] == "block2" and rec["ok"]
    assert rec["grad_relmax"] < 1e-4


def test_size_gate():
    mod = _load()
    # 100 is not %16: every case is skipped, nothing fails
    rc = mod.main(["--sizes", "100", "--repeats", "0", "--blocks", "b2"])
    assert rc == 0
