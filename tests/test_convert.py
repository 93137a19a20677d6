"""Converter tests: ALNtoPAF/ALNtoPSL outputs byte-identical to the C
reference on the 30kb E/F pair.

Goldens in tests/golden/ were captured from the reference binaries
(ALNtoPAF [-m -x -s -S -w] / ALNtoPSL on the FastGA-produced EvF.1aln);
they contain no absolute paths so they are environment-independent.
"""

import contextlib
import io
import pathlib

import pytest

from fastga_tpu.cli import alntopaf, alntopsl, fastga
from fastga_tpu.utils import dna
from tests.test_gdb import write_fasta
from tests.test_wave_ref import diverged_pair

GOLD = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def ours_aln(tmp_path_factory, monkeypatch_module=None):
    tmp = tmp_path_factory.mktemp("conv")
    a, b = diverged_pair()
    write_fasta(tmp / "E.fasta", [("e1", dna.to_ascii(a, True).decode())])
    write_fasta(tmp / "F.fasta", [("f1", dna.to_ascii(b, True).decode())])
    out = tmp / "ours.1aln"
    rc = fastga.main(["-Eref", f"-1:{out}", str(tmp / "E.fasta"),
                      str(tmp / "F.fasta")])
    assert rc == 0
    return out


def run_cli(main, args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    assert rc == 0
    return buf.getvalue()


@pytest.mark.parametrize("args,golden", [
    ([], "ref_paf.txt"),
    (["-m"], "ref_paf-m.txt"),
    (["-x"], "ref_paf-x.txt"),
    (["-s"], "ref_paf-s.txt"),
    (["-S"], "ref_paf-S.txt"),
    (["-w"], "ref_paf-w.txt"),
    (["-m", "-s"], "ref_paf-m-s.txt"),
    (["-x", "-S"], "ref_paf-x-S.txt"),
])
def test_alntopaf_matches_reference(ours_aln, args, golden):
    got = run_cli(alntopaf.main, args + [str(ours_aln)])
    assert got == (GOLD / golden).read_text()


def test_alntopsl_matches_reference(ours_aln):
    got = run_cli(alntopsl.main, [str(ours_aln)])
    assert got == (GOLD / "ref_psl.txt").read_text()


# -- ALNshow ------------------------------------------------------------------

from fastga_tpu.cli import alnshow  # noqa: E402


@pytest.mark.parametrize("args,golden", [
    ([], "ref_show_plain.txt"),
    (["-a"], "ref_show_a.txt"),
    (["-r", "-w60"], "ref_show_r_w60.txt"),
    (["-a", "-n"], "ref_show_a_n.txt"),
])
def test_alnshow_matches_reference(ours_aln, args, golden):
    got = run_cli(alnshow.main, args + [str(ours_aln)])
    # the reference prints the .1aln root name in the banner
    want = (GOLD / golden).read_text().replace("\nours:", f"\n{ours_aln.stem}:")
    assert got == want


def test_alnshow_selection_reverse(ours_aln):
    got = run_cli(alnshow.main, [str(ours_aln), "@1-", "@1"])
    want = (GOLD / "ref_show_sel_rev.txt").read_text().replace(
        "\nours:", f"\n{ours_aln.stem}:")
    assert got == want


def test_alnshow_border0(ours_aln):
    got = run_cli(alnshow.main, ["-a", "-b0", str(ours_aln), "@1:0-12k"])
    want = (GOLD / "ref_show_a_b0_sel.txt").read_text().replace(
        "\nours:", f"\n{ours_aln.stem}:")
    assert got == want


def test_paf_psl_names_truncate_at_whitespace():
    """ALNtoPAF/ALNtoPSL truncate GDB headers to the first white-space
    before emitting names (ALNtoPAF.c:763-783, ALNtoPSL.c:489-510);
    verified byte-identical vs the C tools on a spaced-header pair."""
    from fastga_tpu.io.alncode import Overlap
    from fastga_tpu.io.gdb import GDB, Contig, Scaffold
    from fastga_tpu.io.paf import paf_line
    from fastga_tpu.io.psl import psl_line
    import numpy as np

    g = GDB()
    g.contigs.append(Contig(1000, 0, 0, 0))
    g.scaffolds.append(Scaffold(1000, 0, 1, "scaf0 descriptive text"))
    o = Overlap(aread=0, bread=0, abpos=0, aepos=100, bbpos=0, bepos=100,
                diffs=0, bcomp=False, trace=[(0, 100)])
    line = paf_line(o, g, g)
    assert line.startswith("scaf0\t1000\t")
    assert "\tscaf0\t" in line
    seq = np.zeros(1000, dtype=np.uint8)
    pline = psl_line(o, g, g, seq, seq, 100)
    flds = pline.split("\t")
    assert flds[9] == "scaf0" and flds[13] == "scaf0"
