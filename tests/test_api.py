"""AlnReader API (ONEaln equivalent) tests over the E/F golden pair."""

import io

import numpy as np
import pytest

from fastga_tpu.api import AlnError, AlnReader
from fastga_tpu.utils import dna
from tests.test_convert import ours_aln  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def reader(ours_aln):  # noqa: F811
    return AlnReader(ours_aln)


def test_counts(reader):
    assert reader.count == 3
    assert reader.trace_spacing == 100
    assert reader.trace_max == 101
    assert reader.trace_count == sum(len(o.trace)
                                     for o in reader._af.overlaps)


def test_gdb_accessors(reader):
    g1 = reader.gdb1
    assert g1.scaffold_count == 1
    assert g1.contig_count == 1
    assert g1.gap_count == 0
    assert g1.scaffold_name(1) == "e1"
    assert g1.scaffold_len(1) == 30000
    assert g1.contig_len(1, 1) == 30000
    assert g1.contig_start(1, 1) == 0
    with pytest.raises(AlnError):
        g1.scaffold_len(2)
    seq = g1.scaffold_seq(1, 100, 150)
    assert len(seq) == 50 and set(seq) <= set("acgt")


def test_records_and_cursor(reader):
    recs = list(reader)
    assert len(recs) == 3
    r0 = recs[0]
    assert (r0.seq1, r0.bpos1, r0.epos1) == (1, 0, 10025)
    assert r0.diffs == 504
    assert sum(r0.tpoints) == r0.epos2 - r0.bpos2
    r1 = recs[1]
    assert r1.complement
    assert r1.bpos2 > r1.epos2   # complemented: descending scaffold coords
    reader.goto(2)
    assert not reader.eof
    rec = reader.alignment()
    assert rec.seq1 == 1 and rec.complement
    assert reader.next() is False
    assert reader.next() is True  # past the last record


def test_cigar_cs_indels(reader):
    rec = reader[0]
    cg = rec.cigar()
    # span consistency: M+I consume seq1, M+D consume seq2
    import re
    # ONEaln's I/D letters mirror the PAF cg:Z convention
    # (verified against the reference's ONEalnTEST): M+D consume
    # seq1, M+I consume seq2
    ops = re.findall(r"(\d+)([MIDX=])", cg)
    a = sum(int(n) for n, op in ops if op in "MX=D")
    b = sum(int(n) for n, op in ops if op in "MX=I")
    assert a == rec.epos1 - rec.bpos1
    assert b == rec.epos2 - rec.bpos2
    cgx = rec.cigar(show_x=True)
    assert "X" in cgx and "=" in cgx and "M" not in cgx
    cs = rec.cs_tag(short_form=True)
    assert cs.startswith(":")
    ind = rec.indel_array()
    assert all(v != 0 for v in ind)
    # indel count == diffs - substitutions
    assert len(ind) == sum(int(n) for n, op in ops if op in "ID")


def test_show_alignment(reader):
    buf = io.StringIO()
    reader[0].show_alignment(buf, width=100, border=10, coord=5)
    text = buf.getvalue()
    assert "|" in text and text.count("\n") > 100


def test_reversed_cigar(reader):
    rec = reader[1]  # complemented record
    fwd = rec.cigar()
    rev = rec.cigar(reversed=True)
    assert fwd != rev
    # role swap exchanges I and D counts
    import re
    cnt = lambda s, op: sum(int(n) for n, o in
                            re.findall(r"(\d+)([MIDX=])", s) if o == op)
    assert cnt(fwd, "I") == cnt(rev, "D")
    assert cnt(fwd, "D") == cnt(rev, "I")


def test_onealn_oracle_parity():
    """Byte parity with the reference's ONEalnTEST (-DTEST ONEaln.c main)
    for every derivation in both directions: cigar, CS, indel array, and
    the reversed BLAST display (incl. a complemented record).  The
    oracle capture lives in tests/golden/onealn/ (regenerate by running
    ONEalnTEST from tools/oracle-built reference sources on
    apigold.1aln)."""
    import json
    from pathlib import Path

    from fastga_tpu.api import AlnReader

    gdir = Path(__file__).parent / "golden" / "onealn"
    gold = json.loads((gdir / "oracle.json").read_text())
    r = AlnReader(gdir / "apigold.1aln")
    assert r.count == len(gold["cig_f"])
    for i in range(r.count):
        rec = r[i]
        assert rec.cigar(show_x=True) == gold["cig_f"][i]
        assert rec.cigar(show_x=True, reversed=True) == gold["cig_r"][i]
        assert rec.cs_tag(False, False) == gold["cs_f"][i]
        assert rec.cs_tag(False, True) == gold["cs_r"][i]
        assert " ".join(map(str, rec.indel_array(False))) == \
            gold["ind_f"][i]
        assert " ".join(map(str, rec.indel_array(True))) == \
            gold["ind_r"][i]
        buf = io.StringIO()
        rec.show_alignment(buf, indent=8, width=100, border=10, coord=9,
                           reversed=True)
        want = gold["show_r"][i].split("\n")
        ours = buf.getvalue().rstrip("\n").split("\n")
        assert ours == want[:len(ours)], f"record {i} reversed display"
