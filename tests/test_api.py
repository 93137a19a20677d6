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
    ops = re.findall(r"(\d+)([MIDX=])", cg)
    a = sum(int(n) for n, op in ops if op in "MX=I")
    b = sum(int(n) for n, op in ops if op in "MX=D")
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
