#!/usr/bin/env python
"""P10 stress gate: a large synthetic self-comparison must complete
within host RAM (VERDICT r1 task 6; reference analog: SCAN_MAX windows +
4GB sort panels + seed spill keep FastGA inside commodity memory at Gbp
scale, GIXmake.c:65,1907-1920, FastGA.c:4256-4345).

    python tools/stress_selftest.py --mbp 500

Generates an N-Mbp multi-contig genome with a few seeded repeat pairs,
runs `FastGA A` (self comparison) through align_genomes, and reports
wall time + peak RSS.  Sizes beyond the device caps exercise the host
fallback / panel-streamed paths; correctness at this scale is separately
anchored by tools/refcheck.py (bit-identity) at 50 Mbp.
"""

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=500.0)
    ap.add_argument("--contigs", type=int, default=0)
    ap.add_argument("--engine", default="jax")
    ap.add_argument("--nrepeat", type=int, default=20,
                    help="seeded repeat pairs (so self-seeds exist)")
    args = ap.parse_args()

    from fastga_tpu.io import gdb as gdbm
    from fastga_tpu.models import aligner
    from fastga_tpu.utils.dna import compress

    total = int(args.mbp * 1e6)
    nc = args.contigs or max(8, total // 2_000_000)
    clen = total // nc
    rng = np.random.default_rng(0x5E1F)

    print(f"building {args.mbp} Mbp across {nc} contigs ...", flush=True)
    g = gdbm.GDB()
    boff = 0
    counts = np.zeros(4, np.int64)
    packs = []
    rep_unit = rng.integers(0, 4, 30_000).astype(np.uint8)
    t0 = time.time()
    for i in range(nc):
        c = rng.integers(0, 4, clen).astype(np.uint8)
        if i < args.nrepeat:   # plant a mutated copy of the shared unit
            m = rep_unit.copy()
            mut = rng.random(len(m)) < 0.02
            m[mut] = (m[mut] + rng.integers(1, 4, mut.sum())) % 4
            c[1000:1000 + len(m)] = m
        g.contigs.append(gdbm.Contig(len(c), 0, boff, i))
        g.scaffolds.append(gdbm.Scaffold(len(c), i, i + 1, f"s{i}"))
        pk = compress(c)
        packs.append(pk)
        boff += len(pk)
        counts += np.bincount(c, minlength=4)[:4]
        g.maxctg = max(g.maxctg, len(c))
    g.seqtot = int(counts.sum())
    g.freq = counts / g.seqtot
    g._bps = np.concatenate(packs)
    del packs
    print(f"  genome built in {time.time()-t0:.0f}s "
          f"({g.seqtot:,} bp)", flush=True)

    t0 = time.time()
    ovls, stats = aligner.align_genomes(g, g, engine=args.engine,
                                        verbose=True)
    dt = time.time() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"self-comparison: {len(ovls)} overlaps, "
          f"{stats.get('nseeds', '?')} seeds, {dt:.0f}s wall, "
          f"peak RSS {peak_gb:.1f} GB")
    assert len(ovls) > 0, "expected repeat alignments"
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
