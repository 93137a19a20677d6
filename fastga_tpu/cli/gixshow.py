"""gixshow — dump GIX k-mers and positions (GIXshow.c, new format).

    python -m fastga_tpu.cli.gixshow <source>[.gix] [<address>[-<address>]]

<address> is an integer entry index or a DNA string prefix; a string used
as a range end selects through the last k-mer with that prefix
(Interpret GIXshow.c:520-570).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from . import _common
from ..io import gix as gixm

USAGE = "<source>[.gix] [ <address>[-<address>] ] "

_BASES = "acgt"


def _kmer_string(t, i: int) -> str:
    """Entry i's k-mer as lower-case text."""
    row = t.kmer_codes(i)
    return "".join(_BASES[c] for c in row)


def _interpret(t, x: str, beg: bool) -> int:
    try:
        d = int(x)
    except ValueError:
        d = None
    if d is not None:
        if d >= t.n:
            raise _common.ArgError("gixshow", f"Index {x} is out of bounds")
        return d if beg else d + 1
    x = x.lower()
    if any(c not in "acgt" for c in x):
        raise _common.ArgError("gixshow", f"String {x} is not dna (acgt)")
    if len(x) > t.kmer:
        raise _common.ArgError("gixshow", f"String {x} is longer than "
                               f"k-mer size ({t.kmer})")
    probe = list(x)
    if not beg:
        n = len(probe) - 1
        while n >= 0 and probe[n] == "t":
            n -= 1
        if n < 0:
            return t.n
        probe[n] = _BASES[_BASES.index(probe[n]) + 1]
        probe = probe[:n + 1]
    s = "".join(probe) + "a" * (t.kmer - len(probe))
    codes = np.array([_BASES.index(c) for c in s], np.uint8)
    return t.searchsorted(codes)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    opts, pos = _common.parse_args(argv, flags="")
    if not 1 <= len(pos) <= 2:
        raise _common.ArgError("gixshow", "expects source and optional "
                               "address range", USAGE)
    t = gixm.read_gix(_common._root(Path(pos[0])))
    if len(pos) == 1:
        bidx, eidx = 0, t.n
    else:
        x = pos[1]
        if "-" in x:
            a, b = x.split("-", 1)
            bidx = _interpret(t, a, True)
            eidx = _interpret(t, b, False)
        else:
            bidx = _interpret(t, x, True)
            eidx = _interpret(t, x, False)

    out = sys.stdout
    perm = np.asarray(t.perm)
    out.write(f"  Index: K-mer{'':{t.kmer - 5}} mask lcp sign contig |"
              f"  position\n")
    for i in range(bidx, eidx):
        out.write(f" {i:6d}: {_kmer_string(t, i)}")
        mb = int(t.maskb[i])
        out.write("   *" if mb == 0 else f" {mb:3d}")
        lc = int(t.lcp[i])
        out.write("   *" if lc == t.kmer else f" {lc:3d}")
        sign = "-" if t.comp[i] else "+"
        out.write(f"    {sign}  {perm[int(t.cont[i])]:4d}   "
                  f"| {int(t.post[i]):9d}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
