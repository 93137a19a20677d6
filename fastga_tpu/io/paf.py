"""PAF emission from alignment overlaps (ALNtoPAF equivalent, base mode).

Field semantics per ALNtoPAF.c:102-636: coordinates are *scaffold*-space
(contig sbeg offsets applied; complement records map B through
sbeg+clen - pos since stored b coords are in B-complement contig space);
matches/blocklen are the trace-free approximations
iid=(aspan+bspan-diffs)/2, blocklen=(aspan+bspan)/2; `dv:f` uses the
reference's fixed-4-digit integer rounding; `df:i` = diffs.

CIGAR/CS modes (needing trace-point reconstruction) live in ops/trace.py
consumers and are added by the cigar paths of cli/alntopaf.
"""

from __future__ import annotations

from typing import IO, Iterable, List, Optional

from .alncode import Overlap
from .gdb import GDB


def paf_line(o: Overlap, gdb1: GDB, gdb2: GDB, swap: bool = False,
             tags_extra: str = "") -> str:
    c1 = gdb1.contigs[o.aread]
    c2 = gdb2.contigs[o.bread]
    s1 = gdb1.scaffolds[c1.scaf]
    s2 = gdb2.scaffolds[c2.scaf]
    aoff = c1.sbeg
    if o.bcomp:
        boff = c2.sbeg + c2.clen
        b0, b1 = boff - o.bepos, boff - o.bbpos
    else:
        boff = c2.sbeg
        b0, b1 = boff + o.bbpos, boff + o.bepos
    strand = "-" if o.bcomp else "+"
    # the reference prints the full stored header (stoa ALNtoPAF.c:186)
    q = (s1.header, s1.slen, aoff + o.abpos, aoff + o.aepos)
    t = (s2.header, s2.slen, b0, b1)
    if swap:
        q, t = t, q
    aspan = o.aepos - o.abpos
    blocksum = aspan + (o.bepos - o.bbpos)
    iid = (blocksum - o.diffs) // 2
    x = 10000 + (10000 * (aspan - iid)) // aspan if aspan else 10000
    dv = f"0.{(x//1000)%10}{(x//100)%10}{(x//10)%10}{x%10}"
    return (f"{q[0]}\t{q[1]}\t{q[2]}\t{q[3]}\t{strand}\t"
            f"{t[0]}\t{t[1]}\t{t[2]}\t{t[3]}\t"
            f"{iid}\t{blocksum//2}\t255\tdv:f:{dv}\tdf:i:{o.diffs}"
            f"{tags_extra}")


def write_paf(overlaps: Iterable[Overlap], gdb1: GDB, gdb2: GDB,
              out: IO[str], swap: bool = False):
    for o in overlaps:
        out.write(paf_line(o, gdb1, gdb2, swap) + "\n")
