#!/usr/bin/env python
"""Seed-phase stage timings on the bench's repeat-rich workload.

Runs device_tubes twice (cold + steady) with FASTGA_DEVPIPE_DEBUG per-
stage ticks; prints wall per stage for the steady pass.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("FASTGA_DEVPIPE_DEBUG", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from fastga_tpu.ops import device_pipeline as devp
    from fastga_tpu.utils import synth

    mbp = float(os.environ.get("BENCH_RR_MBP", 24))
    rng = np.random.default_rng(0xBE7C4)
    pair, masks = synth.repeat_rich_pair(
        rng, int(mbp * 1e6), ncontig=max(8, int(mbp)),
        repeat_frac=0.55, copies_per_subfam=12)
    g1, _ = synth.to_gdb("a", pair["A"])
    g2, _ = synth.to_gdb("b", pair["B"])

    lens1 = g1.contig_lengths()
    perm = np.argsort(-lens1, kind="stable")
    alens_by_rank = lens1[perm]

    for it in range(int(os.environ.get("RUNS", 2))):
        t0 = time.time()
        out = devp.device_tubes(g1, g2, alens_by_rank, freq=10,
                                verbose=True)
        if out is None:
            out = devp.device_tubes_paneled(g1, g2, alens_by_rank,
                                            freq=10, verbose=True)
        dt = time.time() - t0
        tubes, ns, plsum = out
        print(f"pass {it}: {dt:.2f}s ns={ns} ntubes={tubes.n}",
              flush=True)


if __name__ == "__main__":
    main()
