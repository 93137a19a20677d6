#!/usr/bin/env python
"""Wave chunk-kernel ablation timings on a captured real batch.

1. Capture inputs (one bench run writes the first forward batch's
   post-wave0 state):

     FASTGA_TPU_WAVE_SNAPSHOT=/tmp/wave_snap.npz BENCH_RUNS=1 \\
         PYTHONPATH=/root/repo:/root/.axon_site python bench.py

2. Time ablated chunk variants (results are wrong by design; only the
   per-chunk wall matters):

     PYTHONPATH=/root/repo:/root/.axon_site \\
         python tools/microbench_wave.py /tmp/wave_snap.npz
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np

ABLATIONS = [
    (),
    ("noop",),
    ("noop", "nolog"),
    ("nolog",),
    ("nocond",),
    ("nosnake",),
    ("nofetch",),
    ("notrim",),
    ("nored",),
    ("norecenter",),
    ("nosnake", "notrim", "nored", "norecenter"),
]


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fastga_tpu.ops import wave_pallas
    from fastga_tpu.ops.wave import WaveConfig

    snap = np.load(sys.argv[1] if len(sys.argv) > 1
                   else "/tmp/wave_snap.npz")
    pool = jnp.asarray(snap["pool"])
    targs = tuple(jnp.asarray(snap[f"targ{i}"]) for i in range(6))
    st = tuple(jnp.asarray(snap[f"st{i}"]) for i in range(18))
    N, W = st[0].shape
    cfg = WaveConfig(n=N, w=W, chunk=96, max_chunks=512)
    print(f"snapshot: n={int(snap['n'])} N={N} W={W} "
          f"alive={int(np.asarray(snap['st15']).sum())}", flush=True)

    # spec constants as WaveEngine passes them (ave_path/mscore/dscore
    # from the AlignSpec used by the bench: defaults)
    from fastga_tpu.ops.wave_ref import AlignSpec
    spec = AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))
    rep = int(os.environ.get("MB_REP", 3))

    nalive = int(np.asarray(snap['st15']).sum())
    for abl in ABLATIONS:
        fn = wave_pallas.build_chunk_pallas(
            cfg, spec.ave_path, spec.mscore, spec.dscore, +1,
            ablate=abl)
        try:
            st2, chlog, bandlog = fn(pool, targs, st)
            np.asarray(jax.device_get(st2[0].ravel()[0]))
        except Exception as e:
            print(f"{'+'.join(abl) or 'full':<40s} FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        t0 = time.time()
        for _ in range(rep):
            st2, chlog, bandlog = fn(pool, targs, st)
        np.asarray(jax.device_get(st2[0].ravel()[0]))
        dt = (time.time() - t0) / rep
        extra = ""
        if abl == ():
            # DP-cell throughput and rough VPU utilization: each live
            # (tube, wave) advances W band cells, ~150 int ops/cell;
            # v5e VPU peak ~ 4 int-lanes x 8x128 x 0.94 GHz ~ 3.9 Top/s
            cells = nalive * cfg.chunk * W   # upper bound (no deaths)
            gcs = cells / dt / 1e9
            mfu = cells * 150 / dt / 3.9e12
            extra = f"  (<= {gcs:.1f} Gcell/s, ~{mfu * 100:.1f}% VPU)"
        print(f"{'+'.join(abl) or 'full':<40s} {dt * 1e3:8.1f} ms "
              f"/ {cfg.chunk}-wave chunk{extra}", flush=True)

    # per-wave fixed cost: chunk-size sweep on the full kernel
    for cw in (8, 32, 96):
        cfg2 = WaveConfig(n=N, w=W, chunk=cw, max_chunks=512)
        fn = wave_pallas.build_chunk_pallas(
            cfg2, spec.ave_path, spec.mscore, spec.dscore, +1)
        st2, chlog, bandlog = fn(pool, targs, st)
        np.asarray(jax.device_get(st2[0].ravel()[0]))
        t0 = time.time()
        for _ in range(rep):
            st2, chlog, bandlog = fn(pool, targs, st)
        np.asarray(jax.device_get(st2[0].ravel()[0]))
        dt = (time.time() - t0) / rep
        print(f"CW={cw:<3d}  {dt * 1e3:8.1f} ms "
              f"({dt * 1e6 / cw:.0f} us/wave)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
