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
    return {k: (round(_acc[k], 3), _cnt[k])
            for k in sorted(set(_acc) | set(_cnt))}


def reset():
    _acc.clear()
    _cnt.clear()


class PhaseTimer:
    """Reference-style per-phase resource reports (StartTime/TimeTo,
    gene_core.h:178-180): 'u s w %cpu MB' printed after each phase under
    -v / appended to the -L log."""

    def __init__(self, out=None):
        import resource
        self._res = resource
        self.out = out
        self._mark()

    def _mark(self):
        r = self._res.getrusage(self._res.RUSAGE_SELF)
        self._u, self._s = r.ru_utime, r.ru_stime
        self._w = time.perf_counter()

    def phase(self, label=""):
        """Emit resources consumed since the last mark and re-mark."""
        r = self._res.getrusage(self._res.RUSAGE_SELF)
        du = r.ru_utime - self._u
        ds = r.ru_stime - self._s
        dw = time.perf_counter() - self._w
        pct = 100.0 * (du + ds) / dw if dw > 0 else 0.0
        mb = r.ru_maxrss // 1024
        line = (f"\n  Resources for {label or 'phase'}:  {du:.3f}u  "
                f"{ds:.3f}s  {dw:.3f}w  {pct:.1f}%  {mb}MB\n")
        for o in (self.out if isinstance(self.out, (list, tuple))
                  else [self.out]):
            if o is not None:
                o.write(line)
        self._mark()
        return line


def maybe_start_jax_trace():
    """FASTGA_TPU_PROFILE=<dir> starts a jax.profiler trace (the TPU
    analog of the reference's rusage bookkeeping); returns a stop
    callable (no-op when unset)."""
    d = os.environ.get("FASTGA_TPU_PROFILE")
    if not d:
        return lambda: None
    import jax
    jax.profiler.start_trace(d)
    return jax.profiler.stop_trace
