import numpy as np
import pytest

from fastga_tpu.ops import wave_ref as W
from fastga_tpu.utils import dna


def diverged_pair(seed=5150, n=30000):
    """Regenerates the E/F oracle pair used to capture C-reference goldens."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 4, n).astype(np.uint8)
    out = []
    i = 0
    while i < n:
        r = rng.random()
        if r < 0.03:
            out.append((a[i] + rng.integers(1, 4)) % 4)
            i += 1
        elif r < 0.04:
            out.append(rng.integers(0, 4))
        elif r < 0.05:
            i += 1
        else:
            out.append(a[i])
            i += 1
    b = np.array(out, dtype=np.uint8)
    b = np.concatenate([b[:10000], (3 - b[10000:20000])[::-1], b[20000:]])
    return a, b


def path_tuple(p):
    return (p.abpos, p.bbpos, p.aepos, p.bepos, p.diffs, 2 * len(p.trace))


@pytest.fixture(scope="module")
def spec():
    # freq of the generated pair is ~uniform; bias factor 1.0 regardless
    return W.AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))


def test_identity_alignment(spec, rng):
    A = rng.integers(0, 4, 1000).astype(np.uint8)
    p = W.local_alignment(spec, A, A.copy(), 0, 0, 1000)
    assert path_tuple(p)[:5] == (0, 0, 1000, 1000, 0)
    # trace: one interval per 100 A-columns crossed
    assert all(d == 0 for d, _ in p.trace)
    assert sum(b for _, b in p.trace) == p.bepos - p.bbpos


def test_trace_consistency(spec, rng):
    A = rng.integers(0, 4, 3000).astype(np.uint8)
    B = A.copy()
    mut = rng.random(3000) < 0.04
    B[mut] = (B[mut] + rng.integers(1, 4, mut.sum())) % 4
    p = W.local_alignment(spec, A, B, 0, 0, 3000)
    assert sum(b for _, b in p.trace) == p.bepos - p.bbpos
    assert sum(d for d, _ in p.trace) == p.diffs
    assert p.aepos - p.abpos > 2800


def test_golden_vs_c_reference(spec):
    """Golden endpoints captured from the instrumented C reference
    (align.c Local_Alignment) on the regenerated 30kb pair: all three
    calls FastGA makes, incl. the A-complemented one, matched exactly."""
    A, B = diverged_pair()
    fa = np.bincount(A, minlength=4) / len(A)
    sp = W.AlignSpec(0.7, 100, False, tuple(fa))
    cases = [
        # (low, hgh, anti, acomp) -> (abpos,bbpos,aepos,bepos,diffs,tlen16)
        ((1, 35, 171, False), (0, 0, 10025, 10000, 504, 202)),
        ((5, 16, 40136, False), (20008, 20000, 30000, 29988, 491, 200)),
        ((-27, -4, 20161, True), (10025, 9988, 20008, 19988, 488, 202)),
    ]
    for (low, hgh, anti, acomp), want in cases:
        Ause = dna.revcomp(A) if acomp else A
        p = W.local_alignment(sp, Ause, B, low, hgh, anti, -1, -1,
                              selfie=False, acomp=acomp,
                              alen=len(A), blen=len(B))
        assert path_tuple(p) == want, (low, hgh, anti, acomp)


def test_local_not_global(spec, rng):
    # homology only in the middle third: alignment must stay local
    n = 3000
    A = rng.integers(0, 4, n).astype(np.uint8)
    B = np.concatenate([
        rng.integers(0, 4, 1000).astype(np.uint8),
        A[1000:2000],
        rng.integers(0, 4, 1000).astype(np.uint8)])
    p = W.local_alignment(spec, A, B, 0, 0, 3000)
    assert abs(p.abpos - 1000) < 60
    assert abs(p.aepos - 2000) < 60
    assert p.diffs < 30


def test_short_rejected_midpoint(spec, rng):
    # pure random sequences: both passes are short -> degenerate point
    A = rng.integers(0, 4, 500).astype(np.uint8)
    B = rng.integers(0, 4, 500).astype(np.uint8)
    p = W.local_alignment(spec, A, B, 0, 0, 500)
    assert p.abpos == p.aepos and p.bbpos == p.bepos
    assert p.trace == []
