"""Tiny accumulating profiler, enabled with FASTGA_TPU_PROF=1.

Usage:  with prof.span("wave.chunk"): ...   /  prof.add("replay", dt)
`prof.report()` returns {name: (seconds, calls)}; bench.py prints it.
Disabled (the default) the context manager is a no-op with ~ns overhead.
"""

import os
import time
from collections import defaultdict
from contextlib import contextmanager

ENABLED = os.environ.get("FASTGA_TPU_PROF") == "1"
_acc = defaultdict(float)
_cnt = defaultdict(int)


@contextmanager
def span(name):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _acc[name] += time.perf_counter() - t0
        _cnt[name] += 1


def add(name, dt):
    if ENABLED:
        _acc[name] += dt
        _cnt[name] += 1


def count(name, n=1):
    if ENABLED:
        _cnt[name] += n


def report():
    return {k: (round(_acc[k], 3), _cnt[k]) for k in sorted(_acc or _cnt)}


def reset():
    _acc.clear()
    _cnt.clear()
