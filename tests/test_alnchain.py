"""ALNchain tests vs reference goldens on a rearranged genome pair.

tests/golden/alnchain.json holds the surviving A-records the reference
ALNchain emits for each option set on the same pair (our pipeline's .1aln
is record-identical to the reference's, so record-level comparison is
exact).
"""

import contextlib
import io
import json
import pathlib

import numpy as np
import pytest

from fastga_tpu.cli import alnchain, fastga
from fastga_tpu.io import alncode

GOLD = pathlib.Path(__file__).parent / "golden"
AL = "acgt"


def _wrap(s):
    return "\n".join(s[i:i + 70] for i in range(0, len(s), 70))


@pytest.fixture(scope="module")
def rr_aln(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chain")
    rng = np.random.default_rng(4242)

    def mut(x, r=.04):
        x = x.copy()
        m = rng.random(len(x)) < r
        x[m] = (x[m] + rng.integers(1, 4, m.sum())) % 4
        return x

    segs = [rng.integers(0, 4, n) for n in (8000, 6000, 7000, 5000, 9000)]
    A = np.concatenate(segs)
    Bparts = [mut(segs[2]), mut(segs[0]), (3 - mut(segs[3]))[::-1],
              mut(segs[0]), mut(segs[4]), mut(segs[1][:3000]),
              mut(segs[1][2000:])]
    B = np.concatenate(Bparts)
    (tmp / "A.fasta").write_text(
        ">a1\n" + _wrap("".join(AL[v] for v in A)) + "\n")
    cut = len(B) // 2
    (tmp / "B.fasta").write_text(
        ">b1\n" + _wrap("".join(AL[v] for v in B[:cut])) + "\n>b2\n"
        + _wrap("".join(AL[v] for v in B[cut:])) + "\n")
    out = tmp / "rr.1aln"
    assert fastga.main(["-Eref", f"-1:{out}", str(tmp / "A.fasta"),
                        str(tmp / "B.fasta")]) == 0
    return out


@pytest.mark.parametrize("tag,flags", [
    ("default", []),
    ("s1000", ["-s1000"]),
    ("cf", ["-c0.1", "-f200"]),
    ("n3", ["-n3", "-s500"]),
])
def test_alnchain_matches_reference(rr_aln, tag, flags, tmp_path):
    out = tmp_path / f"{tag}.1aln"
    buf, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(err):
        rc = alnchain.main(flags + [f"-o{out}", str(rr_aln)])
    assert rc == 0
    got = [[o.aread, o.abpos, o.aepos, o.bread, o.bbpos, o.bepos]
           for o in alncode.read_aln(out).overlaps]
    want = json.load(open(GOLD / "alnchain.json"))[tag]
    assert got == want


def test_alnchain_default_output_name(rr_aln):
    buf, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(err):
        rc = alnchain.main([str(rr_aln)])
    assert rc == 0
    out = rr_aln.parent / "rr.chain.1aln"
    assert out.exists()
    assert len(alncode.read_aln(out).overlaps) > 0


# -- PAF importers -------------------------------------------------------------

from fastga_tpu.cli import alntopaf, paftoaln, paftopsl  # noqa: E402


def test_paftoaln_matches_reference(rr_aln, tmp_path):
    paf = tmp_path / "rr.paf"
    paf.write_text(run_cli_out(alntopaf.main, ["-x", str(rr_aln)]))
    fa = rr_aln.parent
    rc = paftoaln.main([str(paf), str(fa / "A.fasta"), str(fa / "B.fasta")])
    assert rc == 0
    got = [[o.aread, o.abpos, o.aepos, o.bread, o.bbpos, o.bepos,
            int(o.bcomp), o.diffs]
           for o in alncode.read_aln(tmp_path / "rr.1aln").overlaps]
    want = json.load(open(GOLD / "paftoaln.json"))
    assert got == want


def test_paftopsl_matches_reference(rr_aln, tmp_path):
    paf = tmp_path / "rr.paf"
    paf.write_text(run_cli_out(alntopaf.main, ["-x", str(rr_aln)]))
    got = run_cli_out(paftopsl.main, [str(paf)])
    assert got == (GOLD / "paftopsl.txt").read_text()


def test_psl_consistency(rr_aln, tmp_path):
    """PSL via .1aln directly == PSL via PAF+CIGAR."""
    from fastga_tpu.cli import alntopsl
    paf = tmp_path / "c.paf"
    paf.write_text(run_cli_out(alntopaf.main, ["-x", str(rr_aln)]))
    assert run_cli_out(alntopsl.main, [str(rr_aln)]) == \
        run_cli_out(paftopsl.main, [str(paf)])


def run_cli_out(main, args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    assert rc == 0
    return buf.getvalue()


# -- ALNplot -------------------------------------------------------------------

from fastga_tpu.cli import alnplot  # noqa: E402


@pytest.mark.parametrize("args,golden", [
    ([], "plot_default.eps"),
    (["-L", "-G"], "plot_LG.eps"),
    (["-S", "-W800"], "plot_SW_sel.eps"),
])
def test_alnplot_matches_reference(rr_aln, args, golden):
    sel = ["@1-", "@1"] if golden == "plot_SW_sel.eps" else []
    got = run_cli_out(alnplot.main, args + [str(rr_aln)] + sel)
    assert got == (GOLD / golden).read_text()
