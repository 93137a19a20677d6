import numpy as np
import pytest

from fastga_tpu.ops import syncmer
from fastga_tpu.ops.constants import COMP, KMER, SOFF, TMAP, TMER


def automaton_syncmers(bases):
    """Scalar simulation of the reference's rolling min automaton
    (scan_thread GIXmake.c:506-560): tracks (min4,pos4) over the last 5
    canonical 8-mer hashes; emits on Hit R (new strict min at right end),
    Hit L (old min at left end), Hit RE (tie with min at right end)."""
    n4 = syncmer.pack4(bases)
    v = syncmer.smer_hash(n4)
    out = []
    if len(v) < SOFF + 1:
        return np.array(out, dtype=np.int64)
    # init window over first SOFF entries
    min4, pos4 = 0x10000, 0
    for i in range(SOFF):
        if v[i] < min4:
            min4, pos4 = v[i], i
    for i in range(SOFF, len(v)):
        mz = v[i]
        hit = False
        if mz < min4:
            min4, pos4 = mz, i
            hit = True
        elif pos4 == i - SOFF:
            hit = True
            pos4 += 1
            min4 = v[pos4]
            for j in range(pos4 + 1, i + 1):
                if v[j] < min4:
                    min4, pos4 = v[j], j
        elif mz > min4:
            continue
        else:
            hit = True  # Hit RE: tie at right end
        if hit:
            out.append(i - SOFF)
    return np.array(out, dtype=np.int64)


def test_matches_reference_automaton(rng):
    for trial in range(5):
        bases = rng.integers(0, 4, 3000).astype(np.uint8)
        got = syncmer.syncmer_positions(bases)
        want = automaton_syncmers(bases)
        np.testing.assert_array_equal(got, want)


def test_low_complexity(rng):
    # repetitive sequences exercise the tie cases
    bases = np.tile(np.array([0, 1], dtype=np.uint8), 500)
    got = syncmer.syncmer_positions(bases)
    want = automaton_syncmers(bases)
    np.testing.assert_array_equal(got, want)
    bases = np.zeros(200, dtype=np.uint8)  # poly-A
    np.testing.assert_array_equal(
        syncmer.syncmer_positions(bases), automaton_syncmers(bases))


def test_sampling_density(rng):
    # closed syncmers with s=8,t=12: expected density 2/(t-s+1) = 40%
    bases = rng.integers(0, 4, 200000).astype(np.uint8)
    pos = syncmer.syncmer_positions(bases)
    density = len(pos) / (len(bases) - TMER + 1)
    assert 0.35 < density < 0.45


def test_strand_symmetry(rng):
    # canonical hashing => syncmer starts map to syncmer starts under RC
    bases = rng.integers(0, 4, 5000).astype(np.uint8)
    rc = (3 - bases)[::-1]
    p1 = syncmer.syncmer_positions(bases)
    p2 = syncmer.syncmer_positions(rc)
    n = len(bases)
    mapped = np.sort(n - TMER - p2)
    np.testing.assert_array_equal(p1, mapped)


def test_jnp_matches_numpy(rng):
    import jax.numpy as jnp

    bases = rng.integers(0, 4, 2048).astype(np.uint8)
    length = 1500
    mask = np.asarray(syncmer.syncmer_mask_jnp(jnp.asarray(bases), length))
    want = syncmer.syncmer_positions(bases[:length])
    got = np.flatnonzero(mask)
    np.testing.assert_array_equal(got, want)


def test_index_entries_bounds(rng):
    bases = rng.integers(0, 4, 300).astype(np.uint8)
    fwd, rc = syncmer.index_entries(bases)
    assert fwd.max(initial=-1) <= 300 - KMER
    assert (rc - TMER).min(initial=10**9) >= KMER - TMER
    assert rc.max(initial=-1) <= 300 - TMER + TMER
