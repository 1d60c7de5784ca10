"""Differentiable QP layer — checks run in a fresh subprocess.

The diff module's custom-vjp compilations, stacked on a full session's
accumulated XLA CPU compilations, crash the compiler (upstream bug; see
tests/diff_checks.py).  A clean interpreter sidesteps it and keeps the
whole suite green in one pytest invocation.
"""

import os
import subprocess
import sys


def test_differentiable_qp_layer_subprocess():
    script = os.path.join(os.path.dirname(__file__), "diff_checks.py")
    out = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=500
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "ALL DIFF CHECKS PASSED" in out.stdout
