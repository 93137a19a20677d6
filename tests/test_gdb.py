import numpy as np
import pytest

from fastga_tpu.io import gdb as gdbm
from fastga_tpu.utils import dna


def write_fasta(path, entries, width=60):
    with open(path, "w") as f:
        for h, s in entries:
            f.write(f">{h}\n")
            for i in range(0, len(s), width):
                f.write(s[i : i + width] + "\n")


def test_simple_fasta(tmp_path, rng):
    seq = dna.to_ascii(rng.integers(0, 4, 1000).astype(np.uint8)).decode()
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("chr1 test", seq)])
    g, masks = gdbm.create_gdb(fa, tmp_path / "g")
    assert g.nscaff == 1
    assert g.ncontig == 1
    assert g.scaffolds[0].header == "chr1 test"
    assert g.seqtot == 1000
    np.testing.assert_array_equal(g.get_contig(0), dna.from_ascii(seq.encode()))
    assert masks == []  # all lower-case input -> no masks (the `allow` rule)


def test_n_split_and_gaps(tmp_path):
    #   100 acgt, 20 N (>= ncut -> gap), 50 acgt, 3 N (< ncut -> 'a'), 40 acgt,
    #   then trailing 10 N -> dropped
    s = "acgt" * 25 + "N" * 20 + "cg" * 25 + "nnn" + "ta" * 20 + "N" * 10
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("sc", s)])
    g, _ = gdbm.create_gdb(fa, tmp_path / "g", ncut=10)
    assert g.ncontig == 2
    c0, c1 = g.contigs
    assert (c0.clen, c0.sbeg) == (100, 0)
    assert (c1.clen, c1.sbeg) == (50 + 3 + 40, 120)
    assert g.scaffolds[0].slen == 120 + 93  # trailing Ns dropped
    # the short N run became 'a'
    ctg1 = g.get_contig(1)
    np.testing.assert_array_equal(ctg1[50:53], [0, 0, 0])


def test_every_n_splits_by_default(tmp_path):
    s = "acgtacgtacgt" + "N" + "ggggcccc"
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("sc", s)])
    g, _ = gdbm.create_gdb(fa, tmp_path / "g")  # ncut=0 -> all runs split
    assert g.ncontig == 2


def test_soft_masks(tmp_path):
    s = "ACGT" * 10 + "acgtacgt" + "GGCC" * 5
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("sc", s)])
    g, masks = gdbm.create_gdb(fa, tmp_path / "g")
    assert len(masks) == 1
    m = masks[0]
    assert (m.contig, m.beg, m.end) == (0, 40, 48)


def test_write_read_roundtrip(tmp_path, rng):
    s1 = dna.to_ascii(rng.integers(0, 4, 500).astype(np.uint8), upper=True).decode()
    s2a = dna.to_ascii(rng.integers(0, 4, 300).astype(np.uint8), upper=True).decode()
    s2b = dna.to_ascii(rng.integers(0, 4, 200).astype(np.uint8), upper=True).decode()
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("chr1", s1), ("chr2", s2a + "N" * 30 + s2b)])
    g, _ = gdbm.create_gdb(fa, tmp_path / "g")
    g2 = gdbm.read_gdb(tmp_path / "g")
    assert g2.nscaff == 2
    assert g2.ncontig == 3
    assert [c.clen for c in g2.contigs] == [500, 300, 200]
    assert [c.sbeg for c in g2.contigs] == [0, 0, 330]
    assert g2.scaffolds[1].slen == 530
    np.testing.assert_array_equal(g2.get_contig(2), dna.from_ascii(s2b.encode()))
    piece = g2.get_contig_piece(1, 13, 49)
    np.testing.assert_array_equal(piece, dna.from_ascii(s2a.encode())[13:49])


def test_fasta_roundtrip(tmp_path, rng):
    s1 = dna.to_ascii(rng.integers(0, 4, 500).astype(np.uint8), upper=True).decode()
    s2 = dna.to_ascii(rng.integers(0, 4, 250).astype(np.uint8), upper=True).decode()
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("chr1", s1 + "N" * 12 + s2)])
    g, masks = gdbm.create_gdb(fa, tmp_path / "g")
    out = tmp_path / "back.fasta"
    gdbm.gdb_to_fasta(g, out, width=60)
    g2, _ = gdbm.create_gdb(out, tmp_path / "h")
    np.testing.assert_array_equal(g.get_contig(0), g2.get_contig(0))
    np.testing.assert_array_equal(g.get_contig(1), g2.get_contig(1))
    assert [c.sbeg for c in g2.contigs] == [c.sbeg for c in g.contigs]
