#!/usr/bin/env python
"""Stage-level timing of the device adaptamer merge at bench shapes.

Builds the 192x50kb bench pair's device GIX tables exactly as
device_tubes does, then times jitted prefixes of merge_seeds (the
FASTGA_TPU_MERGE_STAGE trace hooks: merge | scan | count | expand |
full) — stage deltas attribute the merge dispatch's wall time.

    PYTHONPATH=/root/repo:/root/.axon_site \\
        python tools/microbench_merge_stages.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    import bench as benchmod
    from fastga_tpu.io import gdb as gdbm
    from fastga_tpu.ops import device_pipeline as devp
    from fastga_tpu.utils.dna import compress

    rng = np.random.default_rng(0xBE7C4)
    pair = benchmod.make_pair(rng, 192, 50_000)

    def mk(name, contigs):
        g = gdbm.GDB()
        boff = 0
        counts = np.zeros(4, np.int64)
        packs = []
        for i, c in enumerate(contigs):
            g.contigs.append(gdbm.Contig(len(c), 0, boff, i))
            g.scaffolds.append(gdbm.Scaffold(len(c), i, i + 1,
                                             f"{name}{i}"))
            pk = compress(c)
            packs.append(pk)
            boff += len(pk)
            counts += np.bincount(c, minlength=4)[:4]
            g.maxctg = max(g.maxctg, len(c))
        g.seqtot = int(counts.sum())
        g.freq = counts / g.seqtot
        g._bps = np.concatenate(packs)
        return g

    g1 = mk("a", pair["A"])
    g2 = mk("b", pair["B"])
    lens1 = g1.contig_lengths()
    lens2 = g2.contig_lengths()

    with jax.enable_x64():
        N1 = devp._pad_bucket(int(lens1.sum()))
        N2 = devp._pad_bucket(int(lens2.sum()))

        # driver table (genome 1, forward candidates; as device_tubes)
        bps1, coff1, clen1, _, invp1, nc1, _n = devp._prep_genome(
            g1, lens1)
        C1 = devp._cand_jit(N1, len(coff1))(bps1, coff1, clen1, invp1,
                                            nc1)
        E1t = devp._pad_bucket(int(np.asarray(C1[7])))
        T1 = devp._drvtab_jit(N1, min(E1t, N1))(C1)
        C1 = None
        # member table (genome 2, both orientations, sorted)
        bps2, coff2, clen2, _, invp2, nc2, _n = devp._prep_genome(
            g2, lens2)
        Ef = max(1 << 12, N2)
        Tf = devp._gix_jit(N2, len(coff2), Ef)(bps2, coff2, clen2,
                                               invp2, nc2)
        ne = int(np.asarray(Tf[7]))
        Et = min(devp._pad_bucket(ne), Ef)
        T2 = tuple(x[:Et] for x in Tf[:7]) + (Tf[7], Tf[8][:Et])
        Tf = None
        E1 = T1[0].shape[0]
        E2 = T2[0].shape[0]
        print(f"E1={E1} E2={E2} M={E1 + E2}", flush=True)

        NSCAP = max(N1, 1 << 13)
        ACAP = max(N1 // 2, 1 << 12)

        def _sync(r):
            x = r[0] if isinstance(r, (tuple, list)) else r
            np.asarray(jax.device_get(jnp.ravel(x)[0]))

        for s in ("merge", "scan", "count", "expand", ""):
            if s:
                os.environ["FASTGA_TPU_MERGE_STAGE"] = s
            else:
                os.environ.pop("FASTGA_TPU_MERGE_STAGE", None)
            fn = jax.jit(lambda a, b: devp.merge_seeds(
                a, b, NSCAP, freq=10, acap=ACAP, presorted=True))
            t0 = time.time()
            r = fn(T1, T2)
            _sync(r)
            tc = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                r = fn(T1, T2)
            _sync(r)
            dt = (time.time() - t0) / 3
            print(f"stage<{s or 'full':<7s}> {dt * 1e3:8.1f} ms  "
                  f"(first call {tc:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
