"""Smoke-test every ``python -m fastga_tpu.cli.<tool>`` entry point.

The reference ships 24 executables (Makefile:7); each of our CLI modules
must be runnable the way a user runs it — as ``python -m``.  Round 4
shipped two shims (gixcp/gixmv) whose ``__main__`` blocks crashed with a
NameError because tests only ever called ``main()`` in-process; this test
execs each module with no arguments and asserts it exits with the usage
protocol (status 0 or 1, a usage/error line on stderr, and no traceback).
"""

import os
import pkgutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

import pytest

import fastga_tpu.cli as cli_pkg

TOOLS = sorted(
    m.name for m in pkgutil.iter_modules(cli_pkg.__path__)
    if not m.name.startswith("_"))


def _run(tool):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, "-m", f"fastga_tpu.cli.{tool}"],
        capture_output=True, text=True, timeout=120, env=env)
    return tool, p


def test_cli_modules_discovered():
    # every reference executable has a module here (SURVEY §2.3/2.4)
    assert len(TOOLS) >= 24, TOOLS


@pytest.mark.parametrize("tool", TOOLS)
def test_cli_entry_no_args(tool, _cli_results={}):
    if not _cli_results:
        with ThreadPoolExecutor(max_workers=8) as ex:
            for name, p in ex.map(_run, TOOLS):
                _cli_results[name] = p
    p = _cli_results[tool]
    assert p.returncode in (0, 1), (tool, p.returncode, p.stderr[-500:])
    assert "Traceback" not in p.stderr, (tool, p.stderr[-800:])
    assert "Traceback" not in p.stdout, (tool, p.stdout[-800:])
