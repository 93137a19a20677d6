import numpy as np

from fastga_tpu.io import onecode


SCHEMA_TEXT = """\
P 3 tst
D f 4 4 REAL 4 REAL 4 REAL 4 REAL
O S 1 6 STRING
D G 1 3 INT
D C 1 3 INT
D T 1 8 INT_LIST
"""


def test_schema_parse():
    sch = onecode.OneSchema.from_text(SCHEMA_TEXT)["tst"]
    assert sch.lines["S"].is_object
    assert sch.lines["f"].fields == ("REAL",) * 4
    assert sch.lines["T"].fields == ("INT_LIST",)


def test_write_read_roundtrip(tmp_path):
    sch = onecode.OneSchema.from_text(SCHEMA_TEXT)["tst"]
    p = tmp_path / "x.1tst"
    w = onecode.OneWriter(p, sch)
    w.add_provenance("prog", "1.0", "prog -x a b")
    w.add_reference("input.fa", 1)
    w.write("f", 0.25, 0.25, 0.25, 0.25)
    w.write("S", "scaffold one")   # header strings may contain spaces
    w.write("C", 100)
    w.write("G", 50)
    w.write("C", 200)
    w.write("T", [1, 2, 3, 400000])
    w.close()

    r = onecode.OneReader(p)
    assert r.filetype == "tst"
    assert r.provenance[0].program == "prog"
    assert r.provenance[0].command == "prog -x a b"
    assert r.references[0].filename == "input.fa"
    lines = list(r)
    types = [l.type for l in lines]
    assert types == ["f", "S", "C", "G", "C", "T"]
    assert lines[1].fields[0] == "scaffold one"
    assert lines[2].fields[0] == 100
    assert lines[5].fields[0] == [1, 2, 3, 400000]
    # counts present
    assert r.counts["S"]["count"] == 1
    assert r.counts["C"]["count"] == 2
    assert r.counts["T"]["total"] == 4
    # schema reconstructed from '~' lines
    assert r.schema.lines["T"].fields == ("INT_LIST",)


def test_header_matches_one_conventions(tmp_path):
    sch = onecode.OneSchema.from_text(SCHEMA_TEXT)["tst"]
    p = tmp_path / "y.1tst"
    w = onecode.OneWriter(p, sch)
    w.write("C", 1)
    w.close()
    text = p.read_text()
    assert text.startswith("1 3 tst 2 1")
    assert "~ O S 1 6 STRING" in text
    assert "# C 1" in text
