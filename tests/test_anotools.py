"""ANO tool suite + GIX ensemble ops + ALNreset tests.

ANO goldens in tests/golden/ano were captured from the reference binaries
on the same deterministic annotation set built by the fixture.
"""

import contextlib
import io
import pathlib

import pytest

from fastga_tpu.cli import (alnreset, anoshow, anostat, anotobed, bedtoano,
                            gixcp, gixmv, gixrm, gixshow)
from fastga_tpu.io import alncode, ano as anom, gdb as gdbm, gix as gixm
from tests.test_gdbtools import _make_fasta

GOLD = pathlib.Path(__file__).parent / "golden" / "ano"


@pytest.fixture(scope="module")
def rich(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ano")
    _make_fasta(tmp / "G.fasta")
    gdb, masks = gdbm.create_gdb(tmp / "G.fasta", tmp / "PG")
    by_ctg = [[] for _ in range(gdb.ncontig)]
    by_ctg[0] = [anom.AnoRecord(0, 100, 900, 0, "alpha", 7, [100, 300, 900]),
                 anom.AnoRecord(0, 1500, 2500, 1, "beta", 0, None),
                 anom.AnoRecord(0, 2300, 4000, 0, None, 3, None)]
    by_ctg[1] = [anom.AnoRecord(1, 0, 1200, 0, "gamma", 0, None)]
    by_ctg[3] = [anom.AnoRecord(3, 4000, 6500, 0, None, 0,
                                [4000, 5000, 6500])]
    anom.write_ano_records(tmp / "RICH.1ano", gdb, by_ctg,
                           command="make rich")
    return tmp


def run_cli(main, args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    assert rc == 0
    return buf.getvalue()


@pytest.mark.parametrize("sel,golden", [
    ([], "show_all.txt"),
    (["@1"], "show__1.txt"),
    (["@1-"], "show__1_.txt"),
    ([".1:200-600"], "show__1_200_600.txt"),
    (["@2"], "show__2.txt"),
])
def test_anoshow_matches_reference(rich, sel, golden):
    got = run_cli(anoshow.main, [str(rich / "RICH.1ano")] + sel)
    assert got == (GOLD / golden).read_text()


@pytest.mark.parametrize("flags,golden", [
    ([], "stat.txt"),
    (["-h"], "stat_h.txt"),
    (["-hlog"], "stat_hlog.txt"),
    (["-h100,500"], "stat_hb.txt"),
])
def test_anostat_matches_reference(rich, flags, golden):
    got = run_cli(anostat.main, flags + [str(rich / "RICH.1ano")])
    assert got == (GOLD / golden).read_text()


def test_anotobed_matches_reference(rich):
    got = run_cli(anotobed.main, [str(rich / "RICH.1ano")])
    body = [ln for ln in got.splitlines() if not ln.startswith("#")]
    want = (GOLD / "tobed.txt").read_text().splitlines()
    assert body == want


def test_bedtoano_roundtrip(rich):
    """BED -> .1ano -> anoshow equality for intervals that survive the
    (reference-inherited) contig-relative BED coordinate convention."""
    bedp = rich / "S3.bed"
    bedp.write_text("scaf3\t50\t220\tlabl\t9\t+\n"
                    "scaf2\t100\t6400\t\t0\t-\n")
    rc = bedtoano.main([str(bedp), str(rich / "PG")])
    assert rc == 0
    gdb, by_ctg, _ = anom.read_ano_records(rich / "S3.1ano")
    flat = [(m.contig, m.beg, m.end, m.orient, m.label, m.score)
            for recs in by_ctg for m in recs]
    assert flat == [(3, 100, 6400, 1, None, 0),
                    (4, 50, 220, 0, "labl", 9)]


def test_gix_ensemble_ops(rich):
    gdb = gdbm.read_gdb(rich / "PG")
    t = gixm.build_gix(gdb, nthreads=1)
    gixm.write_gix(t, rich / "PGIX", nthreads=1)
    assert gixcp.main([str(rich / "PGIX"), str(rich / "C1")]) == 0
    assert (rich / "C1.gix").exists()
    assert gixmv.main([str(rich / "C1"), str(rich / "C2")]) == 0
    assert (rich / "C2.gix").exists() and not (rich / "C1.gix").exists()
    t2 = gixm.read_gix(rich / "C2")
    assert t2.n == t.n
    assert gixrm.main(["-f", str(rich / "C2")]) == 0
    assert not (rich / "C2.gix").exists()
    assert not list(rich.glob(".C2.ktab.*"))


def test_gixshow_addresses(rich):
    gdb = gdbm.read_gdb(rich / "PG")
    t = gixm.build_gix(gdb, nthreads=1)
    gixm.write_gix(t, rich / "SHOWIX", nthreads=1)
    out = run_cli(gixshow.main, [str(rich / "SHOWIX"), "0-3"])
    lines = out.splitlines()
    assert lines[0].startswith("  Index: K-mer")
    assert len(lines) == 5  # header + entries 0..3 inclusive (GIXshow.c)
    # dna-prefix range selects exactly the kmers with that prefix
    out2 = run_cli(gixshow.main, [str(rich / "SHOWIX"), "acg"])
    body = out2.splitlines()[1:]  # skip the column header
    assert body
    for ln in body:
        assert ln.split(": ")[1].startswith("acg")


def test_alnreset(rich, tmp_path):
    p = tmp_path / "r.1aln"
    w = alncode.AlnWriter(p, 100, "old1", "old2", "/old")
    w.write_overlap(alncode.Overlap(0, 0, 0, 100, 0, 100, 1, False,
                                    [(1, 100)]))
    w.close()
    fa = rich / "G.fasta"
    assert alnreset.main([str(p), str(fa), str(fa)]) == 0
    af = alncode.read_aln(p)
    assert af.db1_name == str(fa) and af.db2_name == str(fa)
    assert len(af.overlaps) == 1 and af.overlaps[0].trace == [(1, 100)]
