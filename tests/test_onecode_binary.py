"""Binary ONEcode: codecs, round trips, and reference-file decoding.

tests/golden/codec.1aln.gz is a reference-ONEview-produced binary file with
trained 'T'/'X' Huffman codecs; decoding it exercises the full binary path
(ltf ints, compacted int lists, vc codec, footer index/codec parsing).
"""

import gzip
import io
import pathlib

import numpy as np
import pytest

from fastga_tpu.io import alncode, onecode
from fastga_tpu.io import onecode_binary as ob

GOLD = pathlib.Path(__file__).parent / "golden"


def test_ltf_roundtrip():
    rng = np.random.default_rng(1)
    vals = [0, 1, -1, 63, 64, -64, -65, 0x1FFF, 0x2000, -0x2000,
            2**31, -(2**31), 2**62, -(2**62)]
    vals += [int(v) for v in rng.integers(-2**40, 2**40, 200)]
    buf = io.BytesIO(b"".join(ob.ltf_write(v) for v in vals))
    got = [ob.ltf_read(buf) for _ in vals]
    assert got == vals


def test_compact_ints_roundtrip():
    rng = np.random.default_rng(2)
    for scale in (5, 300, 10**6, 10**12):
        vals = list(np.cumsum(rng.integers(-scale, scale, 50)))
        vals = [int(v) for v in vals]
        used, diffs = ob._compact_ints(vals)
        got = ob._decompact_ints(vals[0], diffs, used, len(vals))
        assert got == vals


def test_dna_codec_roundtrip():
    rng = np.random.default_rng(3)
    for n in (1, 4, 5, 1023):
        seq = bytes(rng.choice(list(b"acgt"), n).astype(np.uint8))
        assert ob.dna_decode(ob.dna_encode(seq), n) == seq


def test_binary_writer_reader_roundtrip(tmp_path):
    p = tmp_path / "rt.1aln"
    w = ob.BinaryWriter(p, alncode.ALN_SCHEMA, "aln")
    w.add_provenance("t", "1", "cmd")
    w.add_reference("./src", 1)
    w.write("t", 100)
    rng = np.random.default_rng(4)
    lines = []
    for i in range(37):
        a = ("A", i, 0, 1000 + i, i * 2, 5, 995)
        t = ("T", [int(v) for v in 100 + rng.integers(-9, 10, 11)])
        x = ("X", [int(v) for v in rng.integers(0, 9, 11)])
        lines += [a, ("R",), ("D", int(rng.integers(0, 100))), t, x]
    for ln in lines:
        w.write(ln[0], *ln[1:])
    w.close()

    r = ob.BinaryReader(p)
    got = list(r)
    assert r.filetype == "aln"
    assert [x.filename for x in r.references] == ["./src"]
    assert got[0].type == "t" and got[0].fields == (100,)
    for want, have in zip(lines, got[1:]):
        assert have.type == want[0]
        assert list(have.fields) == [list(f) if isinstance(f, list) else f
                                     for f in want[1:]]
    # object index: one entry per A plus the data-start slot
    assert len(r.indexes["A"]) == 38
    assert r.counts["A"]["count"] == 37
    assert r.counts["T"]["total"] == 37 * 11


def test_reference_codec_file(tmp_path):
    """Decode a reference-produced binary file with trained Huffman codecs."""
    raw = gzip.decompress((GOLD / "codec.1aln.gz").read_bytes())
    p = tmp_path / "codec.1aln"
    p.write_bytes(raw)
    r = ob.BinaryReader(p)
    lines = list(r)
    assert set(r.codecs) == {"T", "X"}
    assert len(lines) == 521
    rng = np.random.default_rng(5)
    k = 1
    for i in range(130):
        assert lines[k].type == "A"
        assert lines[k].fields == (0, i * 1000, i * 1000 + 1000,
                                   0, i * 1000, i * 1000 + 1000)
        assert lines[k + 2].fields[0] == \
            [int(v) for v in 100 + rng.integers(-6, 7, 998)]
        assert lines[k + 3].fields[0] == \
            [int(v) for v in rng.integers(0, 13, 998)]
        k += 4


def test_aln_binary_roundtrip(tmp_path):
    """AlnWriter(binary=True) -> read_aln equality with the ASCII form."""
    ovls = [alncode.Overlap(0, 1, 10, 1010, 20, 1015, 33, True,
                            [(3, 100), (30, 105)]),
            alncode.Overlap(2, 3, 0, 500, 0, 498, 7, False, [(7, 498)])]
    for binary in (True, False):
        p = tmp_path / f"x_{binary}.1aln"
        w = alncode.AlnWriter(p, 100, "db1", "db2", "/cwd", binary=binary)
        for o in ovls:
            w.write_overlap(o)
        w.close()
        af = alncode.read_aln(p)
        assert af.tspace == 100
        assert [(o.aread, o.abpos, o.aepos, o.bread, o.bbpos, o.bepos,
                 o.diffs, o.bcomp, o.trace) for o in af.overlaps] == \
               [(o.aread, o.abpos, o.aepos, o.bread, o.bbpos, o.bepos,
                 o.diffs, o.bcomp, o.trace) for o in ovls]
        assert af.db1_name == "db1" and af.db2_name == "db2"


def test_oneview_roundtrip(tmp_path, capsys):
    from fastga_tpu.cli import oneview
    p = tmp_path / "v.1aln"
    w = alncode.AlnWriter(p, 100, "a", "b", "/c", binary=True)
    w.write_overlap(alncode.Overlap(0, 0, 0, 100, 0, 100, 1, False,
                                    [(1, 100)]))
    w.close()
    assert oneview.main([str(p)]) == 0
    text = capsys.readouterr().out
    assert text.startswith("1 3 aln")
    assert "A 0 0 100 0 0 100" in text
    # binary re-emission readable again
    out2 = tmp_path / "v2.1aln"
    assert oneview.main(["-b", "-o", str(out2), str(p)]) == 0
    af = alncode.read_aln(out2)
    assert len(af.overlaps) == 1 and af.overlaps[0].aepos == 100
