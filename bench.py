"""Benchmark: end-to-end genome-pair alignment throughput on one chip.

Generates a deterministic synthetic genome pair (multi-contig, ~1%
divergence with inversions — the FastGA design envelope), runs the full
fastga_tpu pipeline with the device wave engine, and prints ONE JSON line:

    {"metric": "aligned_bp_per_s", "value": N, "unit": "bp/s",
     "vs_baseline": R}

vs_baseline compares the alignment-search phase rate against the reference
C FastGA's 8-thread CPU rate on the HAP1/HAP2 example: 380,294 alignments
of avg 1,930 bp in 32.3 s  =>  22.7 Mbp aligned /s
(EXAMPLE/sample_session:51-55; BASELINE.md).
"""

import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> dumps stacks
if os.environ.get("BENCH_STALL_DUMP"):
    faulthandler.dump_traceback_later(
        int(os.environ["BENCH_STALL_DUMP"]), repeat=True)


def make_pair(rng, ncontig, clen, div=0.01):
    genomes = {"A": [], "B": []}
    for i in range(ncontig):
        a = rng.integers(0, 4, clen).astype(np.uint8)
        b = a.copy()
        mut = rng.random(clen) < div * 0.8
        b[mut] = (b[mut] + rng.integers(1, 4, mut.sum())) % 4
        b = np.delete(b, rng.integers(0, len(b), int(div * 0.1 * clen) + 1))
        ins = rng.integers(0, len(b), int(div * 0.1 * clen) + 1)
        b = np.insert(b, ins, rng.integers(0, 4, len(ins)))
        if i % 4 == 3:
            q = len(b) // 3
            b[q:2 * q] = (3 - b[q:2 * q])[::-1]
        genomes["A"].append(a)
        genomes["B"].append(b)
    return genomes


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__) or ".",
                                       ".jax_cache"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from fastga_tpu.io import gdb as gdbm
    from fastga_tpu.io import gix as gixm
    from fastga_tpu.models import aligner
    from fastga_tpu.utils import dna

    ncontig = int(os.environ.get("BENCH_NCONTIG", 192))
    clen = int(os.environ.get("BENCH_CLEN", 50_000))
    engine = os.environ.get("BENCH_ENGINE", "jax")

    rng = np.random.default_rng(0xBE7C4)
    pair = make_pair(rng, ncontig, clen)

    def to_gdb(name, contigs):
        g = gdbm.GDB()
        import numpy as _np
        from fastga_tpu.utils.dna import compress
        packs = []
        boff = 0
        spos = 0
        counts = _np.zeros(4, dtype=_np.int64)
        for i, c in enumerate(contigs):
            g.contigs.append(gdbm.Contig(len(c), 0, boff, i))
            g.scaffolds.append(gdbm.Scaffold(len(c), i, i + 1,
                                             f"{name}{i}"))
            pk = compress(c)
            packs.append(pk)
            boff += len(pk)
            counts += _np.bincount(c, minlength=4)[:4]
            g.maxctg = max(g.maxctg, len(c))
        g.seqtot = int(counts.sum())
        g.freq = counts / g.seqtot
        g._bps = _np.concatenate(packs)
        return g

    t0 = time.time()
    g1 = to_gdb("a", pair["A"])
    g2 = to_gdb("b", pair["B"])
    t_gdb = time.time() - t0

    if engine == "jax":
        aligner.prewarm(g1, g2)   # overlap executable load with gix build

    # cold pass: includes one-time per-process costs (kernel trace/lower,
    # compile-cache load over the axon tunnel, device upload).  The GIX
    # is built on device inside align_genomes (host tables stay unbuilt
    # unless the device pipeline declines and falls back).
    t0 = time.time()
    ovls, stats = aligner.align_genomes(g1, g2, engine=engine)
    t_cold = time.time() - t0

    # steady pass: executables resident — the serving-regime rate (the
    # reference baseline number is likewise steady-state C with no JIT).
    if engine == "jax":
        aligner.wait_engine_warmups()   # chained small-batch compiles
    runs = int(os.environ.get("BENCH_RUNS", 1))
    t_aln = t_cold
    from fastga_tpu.utils import prof
    for _ in range(runs):
        prof.reset()   # report() below covers the last (steady) run only
        t0 = time.time()
        ovls, stats = aligner.align_genomes(g1, g2, engine=engine)
        t_aln = time.time() - t0

    aligned = sum(o.aepos - o.abpos for o in ovls)
    rate = aligned / t_aln if t_aln > 0 else 0.0
    baseline = 22.7e6  # reference 8-thread CPU aligned-bp/s (BASELINE.md)

    print(json.dumps({
        "metric": "aligned_bp_per_s",
        "value": round(rate),
        "unit": "bp/s",
        "vs_baseline": round(rate / baseline, 4),
    }))
    exts = stats.get("device_calls", 0)      # Local_Alignment extensions
    waves = stats.get("wave_device_waves", 0)
    sys.stderr.write(
        f"bench detail: genomes {ncontig}x{clen}bp, engine={engine}; "
        f"gdb {t_gdb:.1f}s cold {t_cold:.1f}s steady {t_aln:.1f}s; "
        f"{len(ovls)} alns, {aligned:,} bp aligned; "
        f"seed-extensions/sec/chip {exts / t_aln:.1f} "
        f"(waves/sec {waves / t_aln:.0f}); "
        f"stats={ {k: v for k, v in stats.items() if isinstance(v, (int, float))} }\n")
    if prof.ENABLED:
        for k, (s, c) in prof.report().items():
            sys.stderr.write(f"  prof {k}: {s:.2f}s x{c}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
