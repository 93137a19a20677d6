"""End-to-end pipeline tests with goldens captured from the C reference.

The 30kb E/F pair (tests/test_wave_ref.diverged_pair) was run through the
actual reference FastGA + ONEview during development; the exact .1aln record
values below are from that run.  This test re-derives them through the full
fastga_tpu pipeline (GDB -> GIX -> merge -> chain -> wave -> dedup).
"""

import io
import numpy as np
import pytest

from fastga_tpu.io import alncode, gdb as gdbm, gix as gixm, paf as pafm
from fastga_tpu.models import aligner
from fastga_tpu.utils import dna
from tests.test_gdb import write_fasta
from tests.test_wave_ref import diverged_pair


@pytest.fixture(scope="module")
def ef_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ef")
    a, b = diverged_pair()
    write_fasta(tmp / "E.fasta", [("e1", dna.to_ascii(a, True).decode())])
    write_fasta(tmp / "F.fasta", [("f1", dna.to_ascii(b, True).decode())])
    g1, _ = gdbm.create_gdb(tmp / "E.fasta", tmp / "E")
    g2, _ = gdbm.create_gdb(tmp / "F.fasta", tmp / "F")
    t1 = gixm.build_gix(g1)
    t2 = gixm.build_gix(g2)
    ovls, stats = aligner.align_genomes(g1, g2, t1, t2)
    return g1, g2, ovls, stats, tmp


def test_ef_matches_reference_records(ef_result):
    _, _, ovls, stats, _ = ef_result
    got = [(o.aread, o.abpos, o.aepos, o.bread, o.bbpos, o.bepos,
            o.bcomp, o.diffs) for o in ovls]
    # golden values from reference FastGA on the same pair (ONEview dump)
    want = [
        (0, 0, 10025, 0, 0, 10000, False, 504),
        (0, 10025, 20008, 0, 9988, 19988, True, 488),
        (0, 20008, 30000, 0, 20000, 29988, False, 491),
    ]
    assert got == want
    # trace sums are self-consistent
    for o in ovls:
        assert sum(b for _, b in o.trace) == o.bepos - o.bbpos
        assert sum(d for d, _ in o.trace) == o.diffs


def test_ef_aln_roundtrip(ef_result):
    g1, g2, ovls, _, tmp = ef_result
    out = tmp / "EvF.1aln"
    w = alncode.AlnWriter(out, 100, "E", "F", str(tmp))
    w.write_skeleton(g1)
    w.write_skeleton(g2)
    for o in ovls:
        w.write_overlap(o)
    w.close()
    back = alncode.read_aln(out)
    assert back.tspace == 100
    assert len(back.skeletons) == 2
    assert back.skeletons[0].contigs[0].clen == 30000
    assert len(back.overlaps) == len(ovls)
    for a, b in zip(back.overlaps, ovls):
        assert (a.aread, a.abpos, a.aepos, a.bbpos, a.bepos, a.bcomp,
                a.diffs) == (b.aread, b.abpos, b.aepos, b.bbpos, b.bepos,
                             b.bcomp, b.diffs)
        assert a.trace == b.trace


def test_ef_paf(ef_result):
    g1, g2, ovls, _, _ = ef_result
    buf = io.StringIO()
    pafm.write_paf(ovls, g1, g2, buf)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 3
    f0 = lines[0].split("\t")
    assert f0[0] == "e1" and f0[5] == "f1"
    assert f0[1] == "30000" and f0[6] == "29988"
    assert (f0[2], f0[3], f0[4]) == ("0", "10025", "+")
    # comp record: B coords mapped to forward scaffold space
    f1 = lines[1].split("\t")
    assert f1[4] == "-"
    assert (f1[7], f1[8]) == ("10000", "20000")
    assert "df:i:488" in lines[1]


def test_cli_end_to_end(tmp_path, rng):
    from fastga_tpu.cli import fastga as cli
    from tests.conftest import mutate

    a = rng.integers(0, 4, 20000).astype(np.uint8)
    b = mutate(rng, a, sub=0.02, ins=0.004, dele=0.004)
    write_fasta(tmp_path / "a.fa", [("sA", dna.to_ascii(a, True).decode())])
    write_fasta(tmp_path / "b.fa", [("sB", dna.to_ascii(b, True).decode())])
    import contextlib, os
    out = io.StringIO()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with contextlib.redirect_stdout(out):
            rc = cli.main(["-T1", "a.fa", "b.fa"])
    finally:
        os.chdir(cwd)
    assert rc == 0
    lines = out.getvalue().splitlines()
    assert len(lines) >= 1
    # the homologous pair must be covered nearly fully
    cov = sum(int(l.split("\t")[3]) - int(l.split("\t")[2]) for l in lines)
    assert cov > 19000
