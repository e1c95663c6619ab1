"""Keeps the on-hardware contract smoke (scripts/tpu_smoke.py) honest.

The smoke is the per-toolchain regression gate for the one hazard class
CPU tests cannot see (excess-precision folding of hi/lo splits —
BASELINE.md "Precision audit"). This test runs the script's FULL check
logic in small interpret mode: the hazard cannot appear off-TPU, but
every oracle, certificate, and tie-planting construction must hold, so
the gate itself cannot bitrot between the (rare) real-chip runs.
Subprocess, like the other script tests, so the script's own CLI +
bootstrap path is what's exercised.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tpu_smoke_small_interpret(tmp_path):
    out = str(tmp_path / "smoke.json")
    proc = subprocess.run(
        [sys.executable, "scripts/tpu_smoke.py", "--platform", "cpu",
         "--small", "--out", out],
        cwd=REPO, capture_output=True, timeout=900, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    res = json.loads(open(out).read())
    assert res["ok"] is True
    checks = res["checks"]
    assert set(checks) == {"select_hi_lo", "ils_hi_lo", "deepk_tie_widen",
                           "bf16_rounded_metric"}
    # Interpret mode has no excess-precision hazard: the splits must sit
    # far inside the claimed bounds here (a near-threshold pass off-TPU
    # would mean the oracle itself is sloppy).
    assert checks["select_hi_lo"]["max_rel_err"] < 1e-5
    assert checks["ils_hi_lo"]["max_rel_err"] < 1e-5
    assert checks["deepk_tie_widen"]["widen_fired"] is True
    assert checks["deepk_tie_widen"]["id_parity"] is True
    assert checks["bf16_rounded_metric"]["id_parity"] is True
