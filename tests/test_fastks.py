"""FastKS adaptamer statistics (intended semantics; the reference binary
mis-strides the current .gix layout — see ops/merge.adaptamer_kstats)."""

import numpy as np

from fastga_tpu.io import gdb as gdbm
from fastga_tpu.io import gix as gixm
from fastga_tpu.ops.merge import _row_lcp, adaptamer_kstats


def _gdb(contigs):
    from fastga_tpu.utils.dna import compress
    g = gdbm.GDB()
    boff = 0
    counts = np.zeros(4, np.int64)
    for i, c in enumerate(contigs):
        g.contigs.append(gdbm.Contig(len(c), 0, boff, i))
        g.scaffolds.append(gdbm.Scaffold(len(c), i, i + 1, f"c{i}"))
        pk = compress(c)
        boff += len(pk)
        counts += np.bincount(c, minlength=4)[:4]
        g.maxctg = max(g.maxctg, len(c))
    g.seqtot = int(counts.sum())
    g.freq = counts / g.seqtot
    g._bps = np.concatenate([compress(c) for c in contigs])
    return g


def test_self_stats_all_full_length():
    rng = np.random.default_rng(3)
    g = _gdb([rng.integers(0, 4, 20000).astype(np.uint8)])
    t = gixm.build_gix(g)
    histu, histl, pb = adaptamer_kstats(t, t, want_bytes=True)
    k = t.kmer
    assert histl[k] == t.n
    assert histl[:k].sum() == 0
    # random 20kb: all sampled k-mers distinct -> all unique
    assert histu[k] == t.n
    assert len(pb) == t.n and set(pb) == {k}


def test_stats_against_bruteforce():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 4, 4000).astype(np.uint8)
    b = a.copy()
    mut = rng.random(len(b)) < 0.08
    b[mut] = (b[mut] + rng.integers(1, 4, mut.sum())) % 4
    g1, g2 = _gdb([a]), _gdb([b])
    t1, t2 = gixm.build_gix(g1), gixm.build_gix(g2)
    histu, histl, pb = adaptamer_kstats(t1, t2, want_bytes=True)
    k = t1.kmer

    # brute force: per T1 entry, the max prefix length against ALL of T2
    def prefix(row, j):
        return tuple((row[i // 4] >> (6 - 2 * (i % 4))) & 3
                     for i in range(j))

    t2set = [t2.kbytes[i] for i in range(t2.n)]
    exp_hist = np.zeros(k + 1, np.int64)
    exp_bytes = []
    for i in range(t1.n):
        r1 = t1.kbytes[i]
        best = 0
        for r2 in t2set:
            lcp = 0
            for j in range(k):
                if (r1[j // 4] >> (6 - 2 * (j % 4))) & 3 != \
                   (r2[j // 4] >> (6 - 2 * (j % 4))) & 3:
                    break
                lcp += 1
            best = max(best, lcp)
        if best >= 12:
            exp_hist[best] += 1
            exp_bytes.append(best)
    assert np.array_equal(histl, exp_hist)
    assert list(pb) == exp_bytes
