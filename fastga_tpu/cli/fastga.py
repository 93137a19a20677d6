"""fastga — the aligner CLI (reference FastGA.c usage surface).

    python -m fastga_tpu.cli.fastga [-v] [-k] [-T<int>] [-f<int>] [-s<int>]
        [-c<int>] [-l<int>] [-i<float>] [-1:<name>] [-paf[:<name>]]
        <sourceA>[.1gdb|.gix|<fa>] [<sourceB>...]

Defaults mirror FastGA.c:4444-4560: -f10 -s1000 -c85 -l100 -i.7 -T8; output
is PAF on stdout unless -1 requests a .1aln.  Precursor GDB/GIX artifacts
are built in memory (persisted only with -k, like the reference's keep
flag inverted semantics of deleting its temporaries).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

from . import _common
from .._version import VERSION
from ..io import alncode, paf
from ..models import aligner

USAGE = ("[-v] [-k] [-T<int(8)>] [-f<int(10)>] [-s<int(1000)>] "
         "[-c<int(85)>] [-l<int(100)>] [-i<float(.7)>] [-1:<name>] "
         "[-paf[:<name>]] <sourceA> [<sourceB>]")


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    opts, pos = _common.parse_args(argv, flags="vkS",
                                   opts="Tfsclip", str_opts="1PE")
    if not 1 <= len(pos) <= 2:
        raise _common.ArgError("fastga", "expects 1 or 2 source arguments",
                               USAGE)

    verbose = opts["v"]
    keep = opts["k"]
    nthreads = _common.opt_int(opts, "T", 8)
    freq = _common.opt_int(opts, "f", 10)
    chain_break = 2 * _common.opt_int(opts, "s", 1000)
    chain_min = 2 * _common.opt_int(opts, "c", 85)
    align_min = _common.opt_int(opts, "l", 100)
    ident = _common.opt_float(opts, "i", 0.7)
    one_name = opts.get("1") or None

    t0 = time.time()
    gdb1, t1 = _common.resolve_genome(pos[0], nthreads, keep, verbose)
    if len(pos) == 2:
        gdb2, t2 = _common.resolve_genome(pos[1], nthreads, keep, verbose)
    else:
        gdb2, t2 = gdb1, t1   # self-comparison (FastGA A)

    params = aligner.FastGAParams(
        freq=freq, chain_break=chain_break, chain_min=chain_min,
        align_min=align_min, align_rate=1.0 - ident)

    engine = opts.get("E") or "jax"   # -Eref selects the exact host engine
    ovls, stats = aligner.align_genomes(gdb1, gdb2, t1, t2, params,
                                        engine=engine, verbose=verbose,
                                        symmetric=bool(opts.get("S")))
    if verbose:
        sys.stderr.write(
            f"\n  Total seeds = {stats['nseeds']}, "
            f"ave. len = {stats['seed_len_avg']:.1f}\n"
            f"  Total hits = {stats['nhits']}, {stats['nlas']} aln's, "
            f"{stats['nlive']} non-redundant aln's\n"
            f"  Wall: {time.time()-t0:.1f}s\n")

    cmd = "fastga " + " ".join(argv)
    if one_name:
        out = one_name if one_name.endswith(".1aln") else one_name + ".1aln"
        selfcmp = len(pos) == 1
        w = alncode.AlnWriter(out, params.tspace,
                              str(Path(pos[0]).resolve()),
                              None if selfcmp
                              else str(Path(pos[1]).resolve()),
                              str(Path.cwd()), command=cmd)
        w.write_skeleton(gdb1)
        if not selfcmp:
            w.write_skeleton(gdb2)
        for o in ovls:
            w.write_overlap(o)
        w.close()
    else:
        paf.write_paf(ovls, gdb1, gdb2, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
