import numpy as np
import pytest

from fastga_tpu.ops import chain as chainm
from fastga_tpu.ops.merge import SeedBatch

BW = chainm.BUCK_WIDTH


def scalar_tubes(seeds, amax, bmax, alens, K=2000, CMIN=170):
    """Scalar simulation of align_contigs' bucket-pair sweep
    (FastGA.c:3040-3180) as an oracle."""
    diag, anti, dbuck = chainm.seed_geometry(seeds, amax, bmax)
    drem = diag - (dbuck << chainm.BUCK_SHIFT)
    out = []
    groups = {}
    for i in range(seeds.n):
        groups.setdefault(
            (int(seeds.acont[i]), int(seeds.bcont[i]), bool(seeds.bcomp[i])),
            []).append(i)
    for (ac, bc, cm), idx in sorted(groups.items()):
        bucks = sorted({int(dbuck[i]) for i in idx})
        by_buck = {}
        for i in idx:
            by_buck.setdefault(int(dbuck[i]), []).append(i)
        for d in bucks:
            lower = by_buck.get(d, [])
            upper = by_buck.get(d + 1, [])
            new = (d - 1) not in by_buck
            if not new and not upper:
                continue
            ents = ([(int(anti[i]), 0, int(drem[i]), 2 * int(seeds.plen[i]))
                     for i in lower]
                    + [(int(anti[i]), 1, int(drem[i]) + BW,
                        2 * int(seeds.plen[i])) for i in upper])
            ents.sort()
            ahgh = -K
            cov = 0
            mix = 0
            alow = dgmin = dgmax = 0
            chain = []
            for a, tag, dg, l2 in ents + [(1 << 60, 0, 0, 0)]:
                if a < ahgh + K:
                    cps = a + l2
                    if cps > ahgh:
                        cov += l2 if a >= ahgh else cps - ahgh
                        ahgh = cps
                    mix |= (2 if tag else 1)
                    dgmin = min(dgmin, dg)
                    dgmax = max(dgmax, dg)
                else:
                    if cov >= CMIN and (mix != 1 or new) and chain:
                        gmin = dgmin + (d << chainm.BUCK_SHIFT)
                        gmax = dgmax + (d << chainm.BUCK_SHIFT)
                        lo, hi = alow, ahgh
                        if cm:
                            al = int(alens[ac])
                            gmin += al - (amax + bmax)
                            gmax += al - (amax + bmax)
                            lo += al - amax
                            hi += al - amax
                        else:
                            gmin -= bmax
                            gmax -= bmax
                        out.append((ac, bc, cm, gmin, gmax, lo, hi, d))
                    cov = l2
                    ahgh = a + l2
                    mix = 2 if tag else 1
                    alow = a
                    dgmin = dgmax = dg
                    chain = []
                chain.append(a)
    return sorted(out)


def rand_seeds(rng, n, ncont=2, span=50000):
    apost = rng.integers(0, span, n).astype(np.int32)
    # bias bpost near apost so diagonals cluster (chains form)
    bpost = (apost + rng.integers(-200, 200, n)).clip(0, span).astype(np.int32)
    return SeedBatch(
        plen=rng.integers(12, 41, n).astype(np.uint8),
        acont=rng.integers(0, ncont, n).astype(np.int32),
        apost=apost,
        bcont=rng.integers(0, ncont, n).astype(np.int32),
        bpost=bpost,
        bcomp=rng.random(n) < 0.3,
    )


def tubes_as_set(t):
    return sorted(zip(t.acont.tolist(), t.bcont.tolist(), t.comp.tolist(),
                      t.dgmin.tolist(), t.dgmax.tolist(), t.alow.tolist(),
                      t.ahgh.tolist(), t.pairing.tolist()))


def test_matches_scalar_oracle(rng):
    amax = bmax = 50000
    alens = np.array([50000, 48000])
    for trial in range(4):
        s = rand_seeds(rng, 3000)
        got = chainm.chain_tubes(s, amax, bmax, alens)
        want = scalar_tubes(s, amax, bmax, alens)
        assert tubes_as_set(got) == want


def test_sparse_seeds_no_chains(rng):
    # far-apart seeds never reach CHAIN_MIN coverage
    n = 100
    s = SeedBatch(
        plen=np.full(n, 20, np.uint8),
        acont=np.zeros(n, np.int32),
        apost=(np.arange(n) * 10000).astype(np.int32),
        bcont=np.zeros(n, np.int32),
        bpost=(np.arange(n) * 10000 + 5).astype(np.int32),
        bcomp=np.zeros(n, bool),
    )
    t = chainm.chain_tubes(s, 10**6, 10**6, np.array([10**6]))
    assert t.n == 0


def test_dense_diagonal_run(rng):
    # a dense colinear run forms exactly one tube per bucket pairing
    n = 50
    s = SeedBatch(
        plen=np.full(n, 40, np.uint8),
        acont=np.zeros(n, np.int32),
        apost=(1000 + np.arange(n) * 30).astype(np.int32),
        bcont=np.zeros(n, np.int32),
        bpost=(1000 + np.arange(n) * 30).astype(np.int32),
        bcomp=np.zeros(n, bool),
    )
    amax = bmax = 10**6
    t = chainm.chain_tubes(s, amax, bmax, np.array([amax]))
    assert t.n == 1
    assert t.dgmin[0] == t.dgmax[0] == 0  # true diagonal 0
    assert t.alow[0] == 2 * 1000
    assert t.ahgh[0] == 2 * (1000 + 49 * 30) + 80
    want = scalar_tubes(s, amax, bmax, np.array([amax]))
    assert tubes_as_set(t) == want


def test_chain_break_boundary(rng):
    # two runs separated by exactly CHAIN_BREAK in anti: must split
    def run(base, k=10):
        return (base + np.arange(k) * 40).astype(np.int32)
    a1 = run(1000)
    # cps of last entry of run1 = 2*(1000+9*40)+80; next run at gap K
    last_cps = 2 * (1000 + 9 * 40) + 80
    a2_anti = last_cps + 2000  # exactly at the break threshold
    a2 = run(a2_anti // 2)
    ap = np.concatenate([a1, a2])
    s = SeedBatch(
        plen=np.full(20, 40, np.uint8),
        acont=np.zeros(20, np.int32), apost=ap,
        bcont=np.zeros(20, np.int32), bpost=ap,
        bcomp=np.zeros(20, bool))
    amax = bmax = 10**6
    got = chainm.chain_tubes(s, amax, bmax, np.array([amax]))
    want = scalar_tubes(s, amax, bmax, np.array([amax]))
    assert tubes_as_set(got) == want
    assert got.n == 2
