"""Host-side exact trace reconstruction from device wave results.

The device kernel (ops/wave.py) logs per-wave predecessor choices and
walks them back ON DEVICE (WaveEngine._backtrack_fn), shipping only the
per-wave path diagonal to the host.  Given a tube's diagonal sequence,
the final path is recovered by re-extending snakes forward on the host to
obtain the exact per-wave furthest-reach positions; trace points are the
grid crossings of that path (the reference's pebble chains,
align.c:805-870 forward / 1325-1414 reverse, reproduced without
device-side pebbles).
"""

from __future__ import annotations

import ctypes
from typing import List, Tuple

import numpy as np

from .wave_ref import Path, _snake_fwd, _snake_rev


def _native_reach(A, B, anti: int, diags, trimx: int, direction: int):
    """Per-wave furthest-reach positions via the C snake loop (the hot
    part of replay); None -> pure-Python fallback."""
    from .. import native
    lib = native.get_tracerec()
    if lib is None:
        return None
    A8 = np.ascontiguousarray(np.asarray(A, np.int8))
    B8 = np.ascontiguousarray(np.asarray(B, np.int8))
    d32 = np.ascontiguousarray(np.asarray(diags, np.int32))
    ntw = len(d32) - 1
    xs = np.empty(ntw + 1, np.int64)
    rc = lib.trw_path_reach(
        A8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(A8),
        B8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(B8),
        int(anti),
        d32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ntw,
        int(trimx), direction,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise AssertionError((int(xs[ntw]), trimx))
    return xs


def _marks_between(last: int, upto: int, tspace: int, aoff: int,
                   descending: bool = False) -> List[int]:
    """Grid marks (≡ aoff mod tspace) in (last, upto] ascending, or
    [upto, last) descending for the reverse wave."""
    out = []
    if not descending:
        m = last + tspace
        while m <= upto:
            out.append(m)
            m += tspace
    else:
        m = last - tspace
        while m >= upto:
            out.append(m)
            m -= tspace
    return out


def replay_forward(A, B, anti: int, aoff: int, diags, trima: int,
                   trimx: int, trimd: int, path: Path,
                   tspace: int = 100) -> int:
    """Rebuild the forward trace from the per-wave path diagonals
    (diags[w] for w = 0..trim_wave); appends to path, returns the seam
    diagonal."""
    trim_wave = len(diags) - 1

    # forward snake reconstruction (C fast path; Python mirror below)
    d0 = int(diags[0])
    na0 = (((anti + d0) >> 1) + (tspace - aoff)) // tspace * tspace \
        - tspace + aoff
    xs = _native_reach(A, B, anti, diags, trimx, +1)
    if xs is None:
        x = (anti + d0) >> 1
        x, _, _ = _snake_fwd(A, B, x, d0)
        xs = [x]
        for w in range(1, trim_wave + 1):
            dcur, dprev = int(diags[w]), int(diags[w - 1])
            vprev = 2 * xs[-1] - dprev
            c_pre = vprev + (2 if dcur == dprev else 1)
            xp = (c_pre + dcur) >> 1
            xp, _, _ = _snake_fwd(A, B, xp, dcur)
            xs.append(xp)
        assert xs[-1] >= trimx, (xs[-1], trimx)

    # crossings: (diag, mark, wave)
    crossings: List[Tuple[int, int, int]] = []
    last = na0
    for w in range(0, trim_wave + 1):
        for m in _marks_between(last, xs[w], tspace, aoff):
            crossings.append((int(diags[w]), m, w))
            last = m

    # assemble (align.c:805-870)
    trimy = trima - trimx
    k = d0
    b = (anti - d0) >> 1
    e = 0
    for (kc, mark, d) in crossings:
        a = mark - kc
        path.trace.append((d - e, a - b))
        b, e = a, d
        k = kc
    if b + k != trimx:
        path.trace.append((trimd - e, trimy - b))
    elif b != trimy:
        de, ab = path.trace[-1]
        path.trace[-1] = (de + (trimd - e), ab + (trimy - b))
    path.aepos = trimx
    path.bepos = trimy
    path.diffs = trimd
    return d0


def replay_reverse(A, B, anti: int, aoff: int, diags, trima: int,
                   trimx: int, trimd: int, path: Path,
                   tspace: int = 100):
    """Rebuild the reverse trace; prepends to path (align.c:1325-1414)."""
    trim_wave = len(diags) - 1

    d0 = int(diags[0])
    x0 = (anti + d0) >> 1
    na0 = ((x0 + (tspace - aoff) - 1) // tspace - 1) * tspace + aoff
    xs = _native_reach(A, B, anti, diags, trimx, -1)
    if xs is None:
        x, _, _ = _snake_rev(A, B, x0, d0)
        xs = [x]
        for w in range(1, trim_wave + 1):
            dcur, dprev = int(diags[w]), int(diags[w - 1])
            vprev = 2 * xs[-1] - dprev
            c_pre = vprev - (2 if dcur == dprev else 1)
            xp = (c_pre + dcur) >> 1
            xp, _, _ = _snake_rev(A, B, xp, dcur)
            xs.append(xp)
        assert xs[-1] <= trimx, (xs[-1], trimx)

    # pebble 0 of the reverse wave records mark = x0 (pre-snake); the first
    # crossing candidate is na0 itself (align.c:1003: `while (x <= na)`
    # without a prior decrement)
    pebbles: List[Tuple[int, int, int]] = [(d0, x0, 0)]
    last = na0 + tspace
    for w in range(0, trim_wave + 1):
        for m in _marks_between(last, xs[w], tspace, aoff, descending=True):
            pebbles.append((int(diags[w]), m, w))
            last = m

    trimy = trima - trimx
    pre: List[Tuple[int, int]] = []
    k, mark0, _ = pebbles[0]
    b = mark0 - k
    e = 0
    i = 0
    if (b + k) % tspace != aoff:
        i = 1
        if i >= len(pebbles):
            a, d = trimy, trimd
        else:
            kc, mc, d = pebbles[i]
            a = mc - kc
        if path.tlen == 0:
            pre.append((d - e, b - a))
        else:
            de, ab = path.trace[0]
            path.trace[0] = (de + (d - e), ab + (b - a))
        b, e = a, d
        if i >= len(pebbles):
            pebbles = []
        else:
            pebbles = pebbles[i:]
            k = pebbles[0][0]
    if pebbles:
        for (kc, mc, d) in pebbles[1:]:
            a = mc - kc
            pre.append((d - e, b - a))
            b, e = a, d
            k = kc
        if b + k != trimx:
            pre.append((trimd - e, b - trimy))
        elif b != trimy:
            if pre:
                de, ab = pre[-1]
                pre[-1] = (de + (trimd - e), ab + (b - trimy))
            else:
                de, ab = path.trace[0]
                path.trace[0] = (de + (trimd - e), ab + (b - trimy))

    path.trace[:0] = pre[::-1]
    path.abpos = trimx
    path.bbpos = trimy
    path.diffs += trimd
