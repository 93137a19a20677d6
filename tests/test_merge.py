import numpy as np
import pytest

from fastga_tpu.io import gdb as gdbm
from fastga_tpu.io import gix as gixm
from fastga_tpu.ops import merge as mergem
from fastga_tpu.utils import dna
from tests.conftest import mutate
from tests.test_gdb import write_fasta


def brute_force_seeds(t1, t2, freq=10, soft_mask=False):
    """Oracle: per T1-forward entry, lcp against every T2 entry."""
    kmer = t1.kmer
    out = set()
    k2 = t2.kbytes
    for i in range(t1.n):
        if t1.comp[i]:
            continue
        lcps = mergem._row_lcp(
            np.broadcast_to(t1.kbytes[i], k2.shape).copy(), k2, kmer)
        if len(lcps) == 0:
            continue
        plen = int(lcps.max())
        if plen < 12:
            continue
        members = np.flatnonzero(lcps == plen)
        if len(members) >= freq:
            continue
        mlen = plen if soft_mask else kmer + 1
        if t1.maskb[i] >= mlen:
            continue
        for j in members:
            if t2.maskb[j] >= mlen:
                continue
            out.add((plen, int(t1.cont[i]), int(t1.post[i]),
                     int(t2.cont[j]), int(t2.post[j]), bool(t2.comp[j])))
    return out


@pytest.fixture
def table_pair(tmp_path, rng):
    a = rng.integers(0, 4, 4000).astype(np.uint8)
    b = mutate(rng, a, sub=0.05, ins=0.01, dele=0.01)
    fa = tmp_path / "a.fasta"
    fb = tmp_path / "b.fasta"
    write_fasta(fa, [("a", dna.to_ascii(a, upper=True).decode())])
    write_fasta(fb, [("b", dna.to_ascii(b, upper=True).decode())])
    g1, _ = gdbm.create_gdb(fa, tmp_path / "a")
    g2, _ = gdbm.create_gdb(fb, tmp_path / "b")
    return gixm.build_gix(g1), gixm.build_gix(g2)


def test_matches_bruteforce(table_pair):
    t1, t2 = table_pair
    got = mergem.adaptamer_seeds(t1, t2)
    got_set = set(zip(got.plen.tolist(), got.acont.tolist(), got.apost.tolist(),
                      got.bcont.tolist(), got.bpost.tolist(), got.bcomp.tolist()))
    want = brute_force_seeds(t1, t2)
    assert got_set == want
    assert got.n == len(want)  # no duplicate emissions


def test_freq_cutoff(table_pair):
    t1, t2 = table_pair
    for f in (2, 5):
        got = mergem.adaptamer_seeds(t1, t2, freq=f)
        got_set = set(zip(got.plen.tolist(), got.acont.tolist(),
                          got.apost.tolist(), got.bcont.tolist(),
                          got.bpost.tolist(), got.bcomp.tolist()))
        assert got_set == brute_force_seeds(t1, t2, freq=f)


def test_identical_genomes(tmp_path, rng):
    a = rng.integers(0, 4, 3000).astype(np.uint8)
    fa = tmp_path / "a.fasta"
    write_fasta(fa, [("a", dna.to_ascii(a, upper=True).decode())])
    g1, _ = gdbm.create_gdb(fa, tmp_path / "a")
    t = gixm.build_gix(g1)
    got = mergem.adaptamer_seeds(t, t)
    # every forward entry of a (mostly) unique genome matches itself exactly
    n_fwd = int((~t.comp).sum())
    assert got.n >= n_fwd
    exact = got.plen == 40
    # self-matches present: same cont/post/strand
    self_m = (exact & (got.acont == got.bcont) & (got.apost == got.bpost)
              & ~got.bcomp)
    assert self_m.sum() == n_fwd


def test_chunking_consistent(table_pair):
    t1, t2 = table_pair
    a = mergem.adaptamer_seeds(t1, t2, chunk=64)
    b = mergem.adaptamer_seeds(t1, t2)
    for f in ("plen", "acont", "apost", "bcont", "bpost", "bcomp"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))


def test_seed_positions_are_real_matches(table_pair):
    # spot check: seeds with plen=L imply L equal bases at the posts
    t1, t2 = table_pair
    s = mergem.adaptamer_seeds(t1, t2)
    # reconstruct from kbytes: A fwd kmer starts at apost; B fwd at bpost,
    # B rc kmer ENDS at bpost (GIX post conventions)
    assert s.n > 0
    assert (s.plen >= 12).all()
