#!/usr/bin/env python
"""Reference-scale bit-identity harness (SURVEY §7 stage 6 acceptance).

Generates a multi-contig synthetic genome pair of the requested size
(default 50 Mbp per side), runs the C reference FastGA (built from
/root/reference into --refbuild) and fastga_tpu on it, and compares the
.1aln alignment payloads record by record (A/R/D/T/X semantics via our
reader, which also proves read-compat with the reference's binary file).

    python tools/refcheck.py --mbp 50            # ~50 Mbp per genome
    python tools/refcheck.py --mbp 2 --quick     # smoke run

Run on the TPU box with PYTHONPATH including /root/.axon_site (the
device pipeline carries the seed phases; the C reference uses -T8).
Exit code 0 = every record identical.
"""

import argparse
import gzip
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path(os.environ.get("FASTGA_REF", "/root/reference"))

REF_TOOLS = {
    "FAtoGDB": ["FAtoGDB.c", "GDB.c", "ONElib.c", "ANO.c", "gene_core.c"],
    "GIXmake": ["GIXmake.c", "MSDsort_lcp.o", "libfastk.c", "GDB.c",
                "ONElib.c", "ANO.c", "gene_core.c"],
    "FastGA": ["FastGA.c", "libfastk.c", "RSDsort.c", "align.c",
               "alncode.c", "GDB.c", "ONElib.c", "ANO.c", "gene_core.c",
               "select.c", "hash.c"],
    "GIXrm": ["GIXrm.c", "gene_core.c", "GDB.c", "ONElib.c", "ANO.c"],
    "ONEview": ["ONEview.c", "ONElib.c", "gene_core.c"],
    "ALNtoPAF": ["ALNtoPAF.c", "align.c", "alncode.c", "GDB.c",
                 "ONElib.c", "ANO.c", "gene_core.c", "select.c",
                 "hash.c"],
}


def build_ref(refbuild: Path):
    refbuild.mkdir(parents=True, exist_ok=True)
    for f in REF.glob("*.c"):
        shutil.copy(f, refbuild)
    for f in REF.glob("*.h"):
        shutil.copy(f, refbuild)
    subprocess.run(
        ["gcc", "-O2", "-fno-strict-aliasing", "-DLCPs", "-c",
         "MSDsort.c", "-o", "MSDsort_lcp.o"], cwd=refbuild, check=True)
    for tool, srcs in REF_TOOLS.items():
        out = refbuild / tool
        if out.exists():
            continue
        subprocess.run(
            ["gcc", "-O2", "-fno-strict-aliasing", "-o", tool, *srcs,
             "-lpthread", "-lm", "-lz"], cwd=refbuild, check=True)
        print(f"  built {out}")


def make_pair(dirpath: Path, total_bp: int, ncontig: int, div: float,
              seed: int):
    rng = np.random.default_rng(seed)
    ACGT = np.array(list("ACGT"))
    clen = total_bp // ncontig

    def write(fn, scafs):
        with gzip.open(fn, "wt") as f:
            for name, s in scafs:
                f.write(f">{name}\n")
                txt = "".join(ACGT[s])
                for i in range(0, len(txt), 70):
                    f.write(txt[i:i + 70] + "\n")

    A, B = [], []
    for i in range(ncontig):
        n = int(clen * rng.uniform(0.7, 1.3))
        a = rng.integers(0, 4, n).astype(np.uint8)
        b = a.copy()
        mut = rng.random(n) < div * 0.8
        b[mut] = (b[mut] + rng.integers(1, 4, mut.sum())) % 4
        b = np.delete(b, rng.integers(0, len(b), int(div * 0.1 * n) + 1))
        ins = rng.integers(0, len(b), int(div * 0.1 * n) + 1)
        b = np.insert(b, ins, rng.integers(0, 4, len(ins)))
        if i % 4 == 3:
            q = len(b) // 3
            b[q:2 * q] = (3 - b[q:2 * q])[::-1]
        A.append((f"ctgA{i}", a))
        B.append((f"ctgB{i}", b))
    write(dirpath / "A.fasta.gz", A)
    write(dirpath / "B.fasta.gz", B)
    return (sum(len(s) for _, s in A), sum(len(s) for _, s in B))


def make_repeat_pair(dirpath: Path, total_bp: int, ncontig: int,
                     seed: int):
    """Repeat-rich haplotype pair (subfamily-structured dispersed
    repeats at the -f cutoff, tandems, inversions, softmasked repeat
    intervals) — exercises dedup/entwine and freq capping at scale."""
    sys.path.insert(0, str(REPO))
    from fastga_tpu.utils import synth
    rng = np.random.default_rng(seed)
    pair, masks = synth.repeat_rich_pair(rng, total_bp,
                                         ncontig=max(8, ncontig))
    synth.write_fasta(str(dirpath / "A.fasta.gz"), pair["A"], "ctgA",
                      masks["A"])
    synth.write_fasta(str(dirpath / "B.fasta.gz"), pair["B"], "ctgB",
                      masks["B"])
    return (sum(len(s) for s in pair["A"]),
            sum(len(s) for s in pair["B"]))


def data_section(path):
    """Bytes between the '$ 0' header terminator and the footer (no
    provenance, no counts): codec-trained record payloads only."""
    blob = Path(path).read_bytes()
    ds = blob.index(b"\n$ 0\n") + 5
    import struct
    foot = struct.unpack("<q", blob[-8:])[0]
    return blob[ds:foot]


def read_records(path):
    sys.path.insert(0, str(REPO))
    from fastga_tpu.io import alncode
    r = alncode.read_aln(str(path))
    out = []
    for o in r.overlaps:
        out.append((o.aread, o.bread, int(o.bcomp), o.abpos, o.aepos,
                    o.bbpos, o.bepos, o.diffs, tuple(map(tuple, o.trace))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=50.0,
                    help="approx Mbp per genome")
    ap.add_argument("--contigs", type=int, default=0,
                    help="contig count (default: one per ~250 kbp, >=8)")
    ap.add_argument("--div", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0xC0FFEE)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--refbuild", default="/tmp/refbuild")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--engine", default="jax")
    ap.add_argument("--repeats", action="store_true",
                    help="repeat-rich workload (dispersed subfamilies "
                         "at the -f cutoff, tandems, softmasks) instead "
                         "of the near-identical pair")
    ap.add_argument("--bytecmp", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also compare the .1aln binary data sections "
                         "byte for byte (trained-codec parity; on by "
                         "default, disable with --no-bytecmp)")
    ap.add_argument("--convert", action="store_true",
                    help="also byte-compare + time ALNtoPAF -x (CIGAR "
                         "reconstruction) on the reference .1aln")
    ap.add_argument("--ref-only", action="store_true",
                    help="stop after the reference run (pre-compute the "
                         "CPU half while e.g. the TPU tunnel is down; "
                         "pair --workdir with --ours-only later)")
    ap.add_argument("--ours-only", action="store_true",
                    help="reuse --workdir: skip generation and the "
                         "reference run when ref.1aln already exists")
    args = ap.parse_args()

    refbuild = Path(args.refbuild)
    build_ref(refbuild)

    wd = Path(args.workdir or tempfile.mkdtemp(prefix="refcheck_"))
    wd.mkdir(parents=True, exist_ok=True)
    total = int(args.mbp * 1e6)
    ncontig = args.contigs or max(8, total // 250_000)
    env = dict(os.environ)
    env["PATH"] = f"{refbuild}:{env['PATH']}"
    reuse = args.ours_only and (wd / "ref.1aln").exists()
    t_ref = 0.0
    if reuse:
        tref_f = wd / "t_ref.txt"
        if tref_f.exists():
            t_ref = float(tref_f.read_text())
        print(f"reusing reference run in {wd} (t_ref={t_ref:.1f}s)")
    else:
        print(f"generating {args.mbp} Mbp x2, {ncontig} contigs, "
              f"div={args.div}{' repeat-rich' if args.repeats else ''} "
              f"in {wd}")
        if args.repeats:
            na, nb = make_repeat_pair(wd, total, min(ncontig, 64), args.seed)
        else:
            na, nb = make_pair(wd, total, ncontig, args.div, args.seed)
        print(f"  A={na:,} bp  B={nb:,} bp")

        t0 = time.time()
        for attempt in (1, 2):      # GIXmake can fail transiently under
            try:                    # memory pressure; precursors persist
                subprocess.run(
                    [str(refbuild / "FastGA"), f"-T{args.threads}", "-1:ref",
                     "A.fasta.gz", "B.fasta.gz"],
                    cwd=wd, env=env, check=True)
                break
            except subprocess.CalledProcessError:
                if attempt == 2:
                    raise
                print("  reference FastGA failed once; retrying ...")
        t_ref = time.time() - t0
        print(f"  reference FastGA: {t_ref:.1f}s")
        (wd / "t_ref.txt").write_text(str(t_ref))
    if args.ref_only:
        print(f"reference half done in {wd}; rerun with --ours-only "
              f"--workdir {wd}")
        return 0

    t0 = time.time()
    sys.path.insert(0, str(REPO))
    from fastga_tpu.cli import fastga as cli
    cwd0 = os.getcwd()
    os.chdir(wd)
    try:
        rc = cli.main(["-v", f"-T{args.threads}", f"-E{args.engine}",
                       "-1:ours", "A.fasta.gz", "B.fasta.gz"])
    finally:
        os.chdir(cwd0)
    assert rc == 0
    t_ours = time.time() - t0
    import resource
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(f"  fastga_tpu: {t_ours:.1f}s "
          f"({t_ref / t_ours:.2f}x the reference); "
          f"peak host RSS {rss_mb} MB")

    ref_recs = read_records(wd / "ref.1aln")
    our_recs = read_records(wd / "ours.1aln")
    print(f"  records: ref {len(ref_recs)}, ours {len(our_recs)}")
    status = 0
    if ref_recs != our_recs:
        status = 1
        nm = 0
        for i, (r, o) in enumerate(zip(ref_recs, our_recs)):
            if r != o:
                print(f"  MISMATCH at record {i}:\n    ref  {r[:8]}\n"
                      f"    ours {o[:8]}")
                nm += 1
                if nm >= 5:
                    break
        if len(ref_recs) != len(our_recs):
            print(f"  record-count mismatch: {len(ref_recs)} vs "
                  f"{len(our_recs)}")
        print("FAIL")
    else:
        print(f"PASS: {len(ref_recs)} alignment records bit-identical")
    sz_ref = (wd / "ref.1aln").stat().st_size
    sz_ours = (wd / "ours.1aln").stat().st_size
    print(f"  .1aln size: ref {sz_ref:,} B, ours {sz_ours:,} B "
          f"({sz_ours / max(sz_ref, 1):.3f}x)")
    if args.bytecmp and status == 0:
        d_ref = data_section(wd / "ref.1aln")
        d_ours = data_section(wd / "ours.1aln")
        if d_ref == d_ours:
            print(f"  data sections byte-identical "
                  f"({len(d_ref):,} B)")
        else:
            k = next((i for i, (a, b) in enumerate(zip(d_ours, d_ref))
                      if a != b), min(len(d_ours), len(d_ref)))
            print(f"  BYTE MISMATCH at data offset {k:,} "
                  f"(ref {len(d_ref):,} B, ours {len(d_ours):,} B)")
            status = 1
    if status == 0 and args.convert:
        # converter parity + throughput at scale (ALNtoPAF.c threading
        # model vs our run_sliced threads; CIGAR mode exercises
        # Compute_Trace_PTS + Gap_Improver per record).  FastGA's
        # Clean_Exit removed the auto-built GDBs; recreate them for
        # sequence access.
        for fa in ("A.fasta.gz", "B.fasta.gz"):
            subprocess.run([str(refbuild / "FAtoGDB"), fa],
                           cwd=wd, env=env, check=True)
        t0 = time.time()
        with open(wd / "ref.paf", "wb") as f:
            subprocess.run([str(refbuild / "ALNtoPAF"), "-x",
                            f"-T{args.threads}", "ref"],
                           cwd=wd, env=env, check=True, stdout=f)
        t_refc = time.time() - t0
        from fastga_tpu.cli import alntopaf as a2p
        t0 = time.time()
        with open(wd / "ours.paf", "w") as f:
            cwd0 = os.getcwd()
            os.chdir(wd)
            try:
                import contextlib
                with contextlib.redirect_stdout(f):
                    rc = a2p.main(["-x", f"-T{args.threads}", "ours"])
            finally:
                os.chdir(cwd0)
        assert rc == 0
        t_ours_c = time.time() - t0
        same = (wd / "ref.paf").read_bytes() == \
            (wd / "ours.paf").read_bytes()
        print(f"  ALNtoPAF -x: ref {t_refc:.1f}s, ours {t_ours_c:.1f}s "
              f"({t_refc / max(t_ours_c, 1e-9):.2f}x); byte-identical: "
              f"{same}")
        if not same:
            status = 1
    if not args.keep and args.workdir is None:
        shutil.rmtree(wd, ignore_errors=True)
    return status


if __name__ == "__main__":
    sys.exit(main())
