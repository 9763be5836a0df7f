"""Driver-contract tests for __graft_entry__ (VERDICT.md round 1, items 1/4/6).

The driver invokes ``entry()`` (single-chip compile check) and
``dryrun_multichip(N)`` (multi-chip sharding proof) from a fresh process with
no special environment. Round 1 shipped a dryrun that asserted instead of
bootstrapping the fake-device mesh — these tests run the entry points exactly
as the driver does so that regression class can't ship again.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_inline_on_fake_mesh(capsys):
    """With >= n devices already visible (pytest's 8 fake CPU devices), the
    dry run executes inline — including the sharded-vs-unsharded loss check."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out
    assert "matches unsharded" in out


def test_dryrun_multichip_self_bootstraps():
    """Simulate the driver: a fresh subprocess whose backend exposes only ONE
    device (plain CPU here; the single-chip TPU tunnel under the driver).
    ``dryrun_multichip(8)`` must create the 8-device mesh itself by
    re-exec'ing with the CPU fake-device bootstrap."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_ST_TPU_DRYRUN_CHILD", None)
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        # the artifact runs three sharded chain variants in interpret mode
        # (~5 min standalone); leave headroom for a loaded host
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout
    assert "dryrun_multichip ok: 8 devices" in proc.stdout
    assert "matches unsharded" in proc.stdout


def test_entry_returns_jittable_step():
    """entry() must hand the driver a lowerable full training step."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compiler_ir(dialect="stablehlo") is not None
