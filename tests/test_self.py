"""Self-comparison (FastGA A) and -S symmetric mode tests.

tests/golden/ref_self.paf was captured from reference `FastGA -T1 S.fasta`
+ ALNtoPAF on the deterministic repeat genome built below.
"""

import contextlib
import io
import pathlib

import numpy as np
import pytest

from fastga_tpu.cli import alntopaf, fastga
from fastga_tpu.io import alncode

GOLD = pathlib.Path(__file__).parent / "golden"
AL = "acgt"


def _wrap(s):
    return "\n".join(s[i:i + 70] for i in range(0, len(s), 70))


@pytest.fixture(scope="module")
def self_genome(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("self")
    rng = np.random.default_rng(777)
    base = rng.integers(0, 4, 30000)
    seg = base[2000:7000]

    def mut(x, r=.03):
        x = x.copy()
        m = rng.random(len(x)) < r
        x[m] = (x[m] + rng.integers(1, 4, m.sum())) % 4
        return x

    g = np.concatenate([base, mut(seg), (3 - mut(seg))[::-1],
                        rng.integers(0, 4, 3000)])
    (tmp / "S.fasta").write_text(
        ">s1\n" + _wrap("".join(AL[x] for x in g)) + "\n")
    return tmp


def run_cli(main, args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    assert rc == 0
    return buf.getvalue()


def test_self_comparison_matches_reference(self_genome):
    out = self_genome / "ours.1aln"
    assert fastga.main(["-Eref", f"-1:{out}",
                        str(self_genome / "S.fasta")]) == 0
    paf = run_cli(alntopaf.main, [str(out)])
    assert paf == (GOLD / "ref_self.paf").read_text()

    # single skeleton + no db2 reference in self mode
    af = alncode.read_aln(out)
    assert len(af.skeletons) == 1
    assert af.db2_name == ""
    # symmetric record set: every (a,b) interval pair mirrored
    ivals = {(o.abpos, o.aepos, o.bbpos, o.bepos, o.bcomp)
             for o in af.overlaps}
    for o in af.overlaps:
        if o.bcomp:
            continue
        assert (o.bbpos, o.bepos, o.abpos, o.aepos, o.bcomp) in ivals


def test_self_no_trivial_diagonal(self_genome):
    """The main diagonal (contig vs itself) must never be reported."""
    out = self_genome / "ours.1aln"
    af = alncode.read_aln(out)
    for o in af.overlaps:
        assert not (o.aread == o.bread and not o.bcomp
                    and o.abpos == o.bbpos and o.aepos == o.bepos)


def test_symmetric_flag_runs(self_genome, tmp_path):
    """-S two-genome mode emits at least the plain record set."""
    rng = np.random.default_rng(31)
    seg = rng.integers(0, 4, 4000)

    def mut(x, r=.02):
        x = x.copy()
        m = rng.random(len(x)) < r
        x[m] = (x[m] + rng.integers(1, 4, m.sum())) % 4
        return x

    g1 = np.concatenate([mut(seg), rng.integers(0, 4, 5000), mut(seg)])
    g2 = np.concatenate([rng.integers(0, 4, 3000), mut(seg)])
    (tmp_path / "X.fasta").write_text(
        ">x1\n" + _wrap("".join(AL[v] for v in g1)) + "\n")
    (tmp_path / "Y.fasta").write_text(
        ">y1\n" + _wrap("".join(AL[v] for v in g2)) + "\n")
    a = tmp_path / "a.1aln"
    b = tmp_path / "b.1aln"
    assert fastga.main(["-Eref", f"-1:{a}", str(tmp_path / "X.fasta"),
                        str(tmp_path / "Y.fasta")]) == 0
    assert fastga.main(["-Eref", "-S", f"-1:{b}", str(tmp_path / "X.fasta"),
                        str(tmp_path / "Y.fasta")]) == 0
    plain = alncode.read_aln(a).overlaps
    sym = alncode.read_aln(b).overlaps
    keys = lambda ovls: {(o.aread, o.abpos, o.aepos, o.bread, o.bbpos,
                          o.bepos, o.bcomp) for o in ovls}
    assert keys(plain) <= keys(sym)
    assert len(sym) >= len(plain)
