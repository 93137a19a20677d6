"""The C tracerec library must be bit-exact with the pure-Python oracle
(which is itself byte-verified against the reference converters)."""

import numpy as np
import pytest

from fastga_tpu.ops import tracerec as tr


def _mutate(seq, rate, rng):
    out = []
    for b in seq:
        r = rng.random()
        if r < rate * 0.6:
            out.append(rng.integers(0, 4))
        elif r < rate * 0.8:
            continue
        else:
            out.append(b)
            if r > 1 - rate * 0.2:
                out.append(rng.integers(0, 4))
    return np.array(out, dtype=np.uint8)


@pytest.fixture(scope="module")
def lib():
    from fastga_tpu import native
    lib = native.get_tracerec()
    if lib is None:
        pytest.skip("no C toolchain / native disabled")
    return lib


def test_native_matches_python(lib):
    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(120):
        n = int(rng.integers(80, 500))
        A = rng.integers(0, 4, n).astype(np.uint8)
        B = _mutate(A, float(rng.uniform(0.02, 0.3)), rng)
        bl = len(B)
        if bl < 10:
            continue
        tspace = int(rng.choice([100, 128]))
        tpts = []
        prev = 0
        for ab in list(range(0, n, tspace))[1:] + [n]:
            bb = round(bl * ab / n)
            tpts.append((90, bb - prev))
            prev = bb
        natc, natg = tr._native_compute, tr._native_gap
        try:
            # python reference paths
            tr._native_compute = lambda *a, **k: None
            tr._native_gap = lambda *a, **k: None
            try:
                pt, pd = tr.compute_trace_pts(A, B, 0, n, 0, bl, tpts,
                                              tspace)
                gt, gd = tr.gap_improver(A, B, 0, 0, n, n, bl, list(pt),
                                         pd)
            except (tr.TraceError, IndexError):
                continue
        finally:
            tr._native_compute, tr._native_gap = natc, natg
        r = tr._native_compute(A, B, 0, n, 0, bl, tpts, tspace,
                               tr.GREEDIEST, False)
        assert r is not None
        nt, nd = r
        assert (nt, nd) == (pt, pd)
        r = tr._native_gap(A, B, 0, 0, n, n, bl, list(pt))
        assert r is not None
        ngt, cd = r
        assert (ngt, pd + cd) == (gt, gd)
        checked += 1
    assert checked > 50
