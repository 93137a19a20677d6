"""Opt-in reference-scale bit-identity gate (VERDICT r1 task 3).

Skipped unless RUN_REFSCALE is set (needs the C toolchain and, for the
full size, the real TPU).  RUN_REFSCALE=1 runs a ~2 Mbp pair through
tools/refcheck.py; RUN_REFSCALE=50 runs the 50 Mbp acceptance size.

    RUN_REFSCALE=1  python -m pytest tests/test_refcheck.py -s
    RUN_REFSCALE=50 PYTHONPATH=/root/.axon_site python -m pytest \
        tests/test_refcheck.py -s
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(not os.environ.get("RUN_REFSCALE"),
                    reason="set RUN_REFSCALE=<mbp> to run")
def test_refcheck_scale():
    mbp = float(os.environ.get("RUN_REFSCALE", "2"))
    if mbp < 1:
        mbp = 2.0
    engine = os.environ.get("REFSCALE_ENGINE", "jax")
    p = subprocess.run(
        [sys.executable, str(REPO / "tools" / "refcheck.py"),
         "--mbp", str(mbp), "--engine", engine],
        capture_output=True, text=True, timeout=7200)
    sys.stderr.write(p.stdout + p.stderr)
    assert p.returncode == 0, "refcheck mismatch (see output)"
    assert "PASS" in p.stdout
