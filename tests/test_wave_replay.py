"""C replay (native/tracerec.c trw_replay_*) vs the pure-Python mirror.

The replay turns a tube's per-wave path diagonals into trace-point pairs
(align.c:805-870 / 1325-1414 assembly).  The C single-call path must be
bit-identical to the Python implementation on arbitrary inputs —
including the rare grid-aligned seam cases (x0 ≡ aoff mod tspace) that
end-to-end runs only occasionally hit.
"""

import numpy as np
import pytest

from fastga_tpu import native
from fastga_tpu.ops import wave_replay as wrep
from fastga_tpu.ops.wave_ref import Path, _snake_fwd, _snake_rev


def _py_only(monkeypatch):
    monkeypatch.setattr(wrep, "_native_replay_fwd",
                        lambda *a, **k: None)
    monkeypatch.setattr(wrep, "_native_replay_rev",
                        lambda *a, **k: None)


def _mk_case(rng, direction, grid_aligned):
    n = 4000
    A = rng.integers(0, 4, n).astype(np.uint8)
    B = A.copy()
    mut = rng.random(n) < 0.03
    B[mut] = (B[mut] + rng.integers(1, 4, mut.sum())) % 4
    ntw = int(rng.integers(1, 60))
    d0 = int(rng.integers(-40, 40))
    deltas = rng.integers(-1, 2, ntw)
    diags = np.concatenate([[d0], d0 + np.cumsum(deltas)]).astype(np.int32)
    tspace = 100
    aoff = int(rng.integers(0, tspace))
    if direction > 0:
        x0 = int(rng.integers(200, 1200))
        if grid_aligned:
            x0 = (x0 // tspace) * tspace + aoff
        anti = 2 * x0 - d0
        # exact per-wave reaches via the Python snakes
        x, _, _ = _snake_fwd(A, B, x0, d0)
        xs = [x]
        for w in range(1, ntw + 1):
            dcur, dprev = int(diags[w]), int(diags[w - 1])
            c_pre = 2 * xs[-1] - dprev + (2 if dcur == dprev else 1)
            xp = (c_pre + dcur) >> 1
            xp, _, _ = _snake_fwd(A, B, xp, dcur)
            xs.append(xp)
        trimx = int(xs[-1] - rng.integers(0, 3))
    else:
        x0 = int(rng.integers(2000, 3500))
        if grid_aligned:
            x0 = (x0 // tspace) * tspace + aoff
        anti = 2 * x0 - d0
        x, _, _ = _snake_rev(A, B, x0, d0)
        xs = [x]
        for w in range(1, ntw + 1):
            dcur, dprev = int(diags[w]), int(diags[w - 1])
            c_pre = 2 * xs[-1] - dprev - (2 if dcur == dprev else 1)
            xp = (c_pre + dcur) >> 1
            xp, _, _ = _snake_rev(A, B, xp, dcur)
            xs.append(xp)
        trimx = int(xs[-1] + rng.integers(0, 3))
    trimy = trimx - int(diags[-1]) + int(rng.integers(-2, 3))
    trima = trimx + trimy
    trimd = ntw + int(rng.integers(0, 4))
    return A, B, anti, aoff, diags, trima, trimx, trimd, tspace


@pytest.mark.skipif(native.get_tracerec() is None
                    or not hasattr(native.get_tracerec(),
                                   "trw_replay_fwd"),
                    reason="native library unavailable")
@pytest.mark.parametrize("direction", [+1, -1])
def test_c_replay_matches_python(monkeypatch, direction):
    rng = np.random.default_rng(0xD1CE + direction)
    for trial in range(150):
        grid = trial % 3 == 0   # force x0 on the trace grid 1/3 of runs
        case = _mk_case(rng, direction, grid)
        A, B, anti, aoff, diags, trima, trimx, trimd, tspace = case

        pc = Path()
        pp = Path()
        if direction > 0:
            seam_c = wrep._native_replay_fwd(
                A, B, anti, aoff, diags, trima, trimx, trimd, pc, tspace)
            assert seam_c is not None
            with monkeypatch.context() as m:
                _py_only(m)
                seam_p = wrep.replay_forward(
                    A, B, anti, aoff, diags, trima, trimx, trimd, pp,
                    tspace)
            assert seam_c == seam_p
            assert (pc.aepos, pc.bepos, pc.diffs) == \
                (pp.aepos, pp.bepos, pp.diffs)
        else:
            # exercise both the fresh and the merge-into-existing paths
            if trial % 2:
                pc.trace = [(3, 7)]
                pp.trace = [(3, 7)]
            ok = wrep._native_replay_rev(
                A, B, anti, aoff, diags, trima, trimx, trimd, pc, tspace)
            assert ok is not None
            with monkeypatch.context() as m:
                _py_only(m)
                wrep.replay_reverse(
                    A, B, anti, aoff, diags, trima, trimx, trimd, pp,
                    tspace)
            assert (pc.abpos, pc.bbpos, pc.diffs) == \
                (pp.abpos, pp.bbpos, pp.diffs)
        assert [tuple(t) for t in pc.trace] == \
            [tuple(t) for t in pp.trace], f"trial {trial} grid={grid}"
