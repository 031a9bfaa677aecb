"""Budgeted smoke test for the driver's multi-chip entry point.

Round 3 shipped a red MULTICHIP artifact because ``dryrun_multichip``'s
compile cost grew unmeasured and a contended host pushed it past the
driver's timeout. This test runs the REAL entry point (subprocess, the
driver's environment: N virtual CPU devices) under an explicit wall-clock
budget, so any cost regression fails CI instead of the round artifact.
It also warms the persistent XLA compile cache with the dryrun's exact
program keys, making subsequent driver runs finish in seconds-to-a-minute.
"""

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# generous enough for a fully cold single-core compile of the three sharded
# programs; a warm run takes ~1 minute (see __graft_entry__.dryrun_multichip)
BUDGET_S = 540.0


def test_dryrun_multichip_within_budget():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_PLATFORMS", None)  # the entry point forces CPU itself
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=BUDGET_S,
    )
    elapsed = time.perf_counter() - t0
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed after {elapsed:.0f}s\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip ok: 8-device stream mesh" in proc.stdout
    assert elapsed < BUDGET_S
