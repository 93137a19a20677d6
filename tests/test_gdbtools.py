"""GDBshow/GDBstat/GDBtoFA + selection parser vs C-reference goldens.

Goldens in tests/golden/gdbtools were captured from the reference binaries
run on the same deterministic multi-scaffold genome (gaps, soft-mask
blocks, multiple scaffolds) built by the fixture below.
"""

import contextlib
import io
import pathlib

import numpy as np
import pytest

from fastga_tpu.cli import gdbshow, gdbstat, gdbtofa
from fastga_tpu.io import ano as anom
from fastga_tpu.io import gdb as gdbm
from fastga_tpu.utils import select as selm

GOLD = pathlib.Path(__file__).parent / "golden" / "gdbtools"
AL = "acgt"


def _make_fasta(path):
    rng = np.random.default_rng(7)

    def seq(n):
        return "".join(AL[x] for x in rng.integers(0, 4, n))

    s1 = seq(5000) + "N" * 120 + seq(3000).upper() + "N" * 40 + seq(2000)
    s2 = seq(7000).upper()
    s3 = seq(300)

    def wrap(s):
        return "\n".join(s[i:i + 70] for i in range(0, len(s), 70))

    with open(path, "w") as f:
        f.write(">scaf1 extra words here\n" + wrap(s1) + "\n")
        f.write(">scaf2\n" + wrap(s2) + "\n")
        f.write(">scaf3\n" + wrap(s3) + "\n")


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gdbtools")
    _make_fasta(tmp / "G.fasta")
    gdb, masks = gdbm.create_gdb(tmp / "G.fasta", tmp / "PG")
    anom.write_ano(tmp / "PG.1ano", gdb, masks)
    return tmp / "PG"


def run_cli(main, args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    assert rc == 0
    return buf.getvalue()


SHOW_CASES = [
    ("show_all.txt", [], []),
    ("show_h.txt", ["-h"], []),
    ("show_u_w50.txt", ["-u", "-w50"], []),
    ("show_s1.txt", [], ["@1"]),
    ("show_s1rev.txt", [], ["@1-"]),
    ("show_range.txt", [], ["@1.2:100-@1.3:50"]),
    ("show_pos.txt", [], ["@1:4.9k-5.2k"]),
    ("show_name.txt", [], ["@scaf2"]),
    ("show_ctgs.txt", [], [".1-.3"]),
    ("show_ctgrev.txt", [], [".2-"]),
    ("show_multi.txt", [], ["@1-@2,.4"]),
    ("show_last.txt", [], ["@#"]),
    ("show_lastpos.txt", [], [".#:50-#"]),
    ("show_abs.txt", [], ["5k-12k"]),
]


@pytest.mark.parametrize("golden,flags,sel", SHOW_CASES)
def test_gdbshow_matches_reference(pg, golden, flags, sel):
    got = run_cli(gdbshow.main, flags + [str(pg)] + sel)
    assert got == (GOLD / golden).read_text()


def test_gdbshow_masked(pg):
    got = run_cli(gdbshow.main, ["#", str(pg), "@1"])
    assert got == (GOLD / "show_masked.txt").read_text()


@pytest.mark.parametrize("golden,flags", [
    ("stat.txt", []),
    ("stat_h.txt", ["-h"]),
    ("stat_hlog.txt", ["-hlog"]),
    ("stat_hbuck.txt", ["-h500,2000"]),
])
def test_gdbstat_matches_reference(pg, golden, flags):
    got = run_cli(gdbstat.main, flags + [str(pg)])
    assert got == (GOLD / golden).read_text()


def test_gdbtofa_matches_reference(pg):
    got = run_cli(gdbtofa.main, [str(pg)])
    assert got == (GOLD / "tofa.txt").read_text()


def test_gdbtofa_masked_matches_reference(pg):
    got = run_cli(gdbtofa.main, [f"#{pg}.1ano", str(pg)])
    assert got == (GOLD / "tofa_masked.txt").read_text()


def test_gdbtofa_masked_roundtrip(pg):
    """Masked GDBtoFA reproduces the original FASTA content byte-for-byte
    modulo line wrapping."""
    got = run_cli(gdbtofa.main, [f"#{pg}.1ano", str(pg)])

    def seqs(t):
        out, cur = {}, None
        for line in t.splitlines():
            if line.startswith(">"):
                cur = line[1:]
                out[cur] = []
            else:
                out[cur].append(line)
        return {k: "".join(v) for k, v in out.items()}

    orig = (pg.parent / "G.fasta").read_text()
    assert seqs(got) == seqs(orig)


def test_selection_errors(pg):
    gdb = gdbm.read_gdb(pg)
    names = selm.scaffold_names(gdb)
    for bad in ["@0", "@9", ".99", "@1:999M", "@nosuch", "@1:5-bogus"]:
        with pytest.raises(selm.SelectError):
            selm.interpret_range(bad, gdb, names)


def test_selection_contigs(pg):
    gdb = gdbm.read_gdb(pg)
    chord = selm.get_selection_contigs("@1.2:100-@1.3:50", gdb)
    assert [c.order for c in chord] == [0, 1, 1, 0, 0]
    assert chord[1].beg == 100 and chord[1].end == gdb.contigs[1].clen
    assert chord[2].beg == 0 and chord[2].end == 50
