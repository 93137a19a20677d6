"""FastGA CLI surface parity: format options (-pafx/-pafm/-pafs/-pafS,
-psl), -M soft masking, #mask arguments, and -L logging — all through
the real `python -m fastga_tpu.cli.fastga` entry point.

Reference-oracle byte-identity for these paths was verified against the
C FastGA (see tools/oracle + /verify recipe); these tests pin the CLI
plumbing by comparing the device-default engine against the exact host
engine and asserting structural properties of each format.
"""

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np
import pytest

from fastga_tpu.cli import fastga as cli
from fastga_tpu.io import gdb as gdbm


def _write_fa(path, scafs, mask_ranges=None):
    up = np.array(list("ACGT"))
    lo = np.array(list("acgt"))
    with open(path, "w") as f:
        for i, (name, s) in enumerate(scafs):
            ch = up[s].copy()
            for j, (lo_, hi_) in enumerate((mask_ranges or {}).get(i, [])):
                ch[lo_:hi_] = lo[s[lo_:hi_]]
            txt = "".join(ch)
            f.write(f">{name}\n")
            for k in range(0, len(txt), 70):
                f.write(txt[k:k + 70] + "\n")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("fastga_cli")
    rng = np.random.default_rng(61)
    A, B = [], []
    for i in range(2):
        a = rng.integers(0, 4, 24000).astype(np.uint8)
        b = a.copy()
        mut = rng.random(len(b)) < 0.012
        b[mut] = (b[mut] + rng.integers(1, 4, mut.sum())) % 4
        A.append((f"sA{i}", a))
        B.append((f"sB{i}", b))
    _write_fa(d / "A.fa", A, mask_ranges={0: [(2000, 9000)]})
    _write_fa(d / "B.fa", B)
    return d


def _run(args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(args)
    assert rc == 0
    return buf.getvalue()


def test_paf_formats(pair):
    d = str(pair)
    base = _run(["-T1", f"{d}/A.fa", f"{d}/B.fa"])
    assert base.count("\n") >= 2 and "dv:f:" in base
    x = _run(["-T1", "-pafx", f"{d}/A.fa", f"{d}/B.fa"])
    assert "cg:Z:" in x and "X" in x.split("cg:Z:")[1]
    m = _run(["-T1", "-pafm", f"{d}/A.fa", f"{d}/B.fa"])
    assert "cg:Z:" in m and "X" not in m.split("cg:Z:")[1].split()[0]
    s = _run(["-T1", "-pafs", f"{d}/A.fa", f"{d}/B.fa"])
    assert "cs:Z:" in s
    S = _run(["-T1", "-pafS", f"{d}/A.fa", f"{d}/B.fa"])
    assert "cs:Z:=" in S
    # identical span columns across formats (match/block counts are
    # recomputed from the exact trace in cigar/cs modes, as in the
    # reference's Gap_Improver path)
    core = lambda t: [l.split("\t")[:9] for l in t.strip().split("\n")]
    assert core(base) == core(x) == core(s)


def test_psl_format(pair):
    d = str(pair)
    out = _run(["-T1", "-psl", f"{d}/A.fa", f"{d}/B.fa"])
    rows = [l.split("\t") for l in out.strip().split("\n")]
    assert rows and all(len(r) == 21 for r in rows)
    assert all(r[8] in ("+", "-") for r in rows)


def test_engines_agree(pair):
    d = str(pair)
    jax_out = _run(["-T1", f"{d}/A.fa", f"{d}/B.fa"])
    ref_out = _run(["-T1", "-Eref", f"{d}/A.fa", f"{d}/B.fa"])
    assert jax_out == ref_out


def test_soft_mask_changes_seeding(pair, capsys):
    d = str(pair)
    # -M uses the implicit case-mask .1ano captured from the FASTA; the
    # masked run must agree between engines and differ in seed counts
    plain = _run(["-T1", "-v", f"{d}/A.fa", f"{d}/B.fa"])
    err_plain = capsys.readouterr().err
    masked = _run(["-T1", "-v", "-M", f"{d}/A.fa", f"{d}/B.fa"])
    err_masked = capsys.readouterr().err
    seeds = lambda e: int(e.split("Total seeds = ")[1].split(",")[0])
    assert seeds(err_masked) < seeds(err_plain)
    masked_ref = _run(["-T1", "-M", "-Eref", f"{d}/A.fa", f"{d}/B.fa"])
    assert masked == masked_ref


def test_mask_args_and_log(pair, tmp_path):
    d = str(pair)
    # persist artifacts so a #mask .1ano exists on disk
    _run(["-T1", "-k", f"{d}/A.fa", f"{d}/B.fa"])
    assert Path(f"{d}/A.1ano").exists()
    log = tmp_path / "run.log"
    out = _run(["-T1", f"-L:{log}", f"{d}/A.fa", f"#{d}/A.1ano",
                f"{d}/B.fa"])
    text = log.read_text()
    assert "Total seeds" in text and "fastga" in text
    out_m = _run(["-T1", "-M", f"{d}/A.fa", f"{d}/B.fa"])
    assert out == out_m   # #A.1ano == the implicit case mask
