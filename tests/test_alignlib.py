"""align.c library-API parity: Compute_Trace_MID, Find_Extension,
Alignment_Cartoon, Flip_Alignment, Check_Trace_Points — goldens captured
from a C harness linking the reference align.c (see /tmp-based fuzz
harnesses; these pin a fixed sample of those runs)."""

import io
import json
from pathlib import Path

import numpy as np
import pytest

GOLD = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def gold():
    return json.loads((GOLD / "alignlib.json").read_text())


def test_compute_trace_mid(gold):
    from fastga_tpu.ops import tracerec as tr
    MODES = {0: tr.GREEDIEST, 1: tr.UPPERMOST, -1: tr.LOWERMOST}
    for case in gold["mid"]:
        A = np.array(case["A"], np.uint8)
        B = np.array(case["B"], np.uint8)
        t, d = tr.compute_trace_mid(A, B, 0, len(A), 0, len(B),
                                    [tuple(p) for p in case["tpts"]], 100,
                                    MODES[case["mode"]])
        assert t == case["trace"]
        assert d == case["diffs"]


def test_find_extension(gold):
    from fastga_tpu.ops import wave_ref as wr
    spec = wr.AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))
    for case in gold["ext"]:
        A = np.array(case["A"], np.uint8)
        B = np.array(case["B"], np.uint8)
        p = wr.find_extension(spec, A, B, 0, case["anti"],
                              prefix=bool(case["prefix"]))
        flat = [v for pr in p.trace for v in pr]
        assert [p.abpos, p.aepos, p.bbpos, p.bepos, p.diffs,
                2 * len(p.trace)] == case["path"]
        assert flat == case["trace"]


def test_alignment_cartoon(gold):
    from fastga_tpu.io.show import alignment_cartoon
    for case in gold["cartoon"]:
        (alen, blen, abpos, aepos, bbpos, bepos, diffs, comp, indent,
         coord) = case["case"]
        buf = io.StringIO()
        alignment_cartoon(buf, abpos, aepos, bbpos, bepos, alen, blen,
                          diffs, bool(comp), indent, coord)
        assert buf.getvalue() == case["text"]


def test_flip_alignment(gold):
    from fastga_tpu.ops.tracerec import flip_alignment
    for case in gold["flip"]:
        alen, blen, abpos, aepos, bbpos, bepos, comp = case["case"]
        nab, nae, nbb, nbe, nal, nbl, nt = flip_alignment(
            abpos, aepos, bbpos, bepos, alen, blen, bool(comp),
            case["trace"])
        assert [nab, nae, nbb, nbe, nal, nbl] == case["out"]
        assert nt == case["otrace"]


def test_check_trace_points():
    from fastga_tpu.ops.tracerec import check_trace_points
    assert check_trace_points(5, 250, 0, 240, [(3, 95), (4, 100), (2, 45)],
                              100)
    assert not check_trace_points(5, 250, 0, 241,
                                  [(3, 95), (4, 100), (2, 45)], 100)
    assert not check_trace_points(5, 250, 0, 240, [(3, 95), (4, 145)], 100)
    # tspace == 0: pairs are (a-advance, b-advance)
    assert check_trace_points(0, 50, 0, 40, [(20, 15), (30, 25)], 0)
    assert not check_trace_points(0, 50, 0, 40, [(20, 15), (31, 25)], 0)


def test_wrap_around_alignment(gold):
    from fastga_tpu.ops import wave_ref as wr
    spec = wr.AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))
    for case in gold["wrap"]:
        A = np.array(case["A"], np.uint8)
        B = np.array(case["B"], np.uint8)
        p = wr.wrap_around_alignment(spec, A, B, -5, 5, case["anti"])
        flat = [v for pr in p.trace for v in pr]
        assert [p.abpos, p.aepos, p.bbpos, p.bepos,
                p.diffs] == case["path"]
        assert flat == case["trace"]


def test_compute_alignment(gold):
    from fastga_tpu.ops import exact as ex
    for case in gold["exact"]:
        A = np.array(case["A"], np.uint8)
        B = np.array(case["B"], np.uint8)
        abpos, aepos, bbpos, bepos = case["box"]
        task = case["task"]
        if task == ex.DIFF_ONLY:
            d, _ = ex.compute_alignment(A, B, abpos, aepos, bbpos, bepos,
                                        task, 100)
            assert d == case["diffs"]
            continue
        if task in (ex.PLUS_ALIGN, ex.PLUS_TRACE):
            pd, mid = ex.compute_alignment(A, B, abpos, aepos, bbpos,
                                           bepos, ex.DIFF_ONLY, 100)
            d, res = ex.compute_alignment(A, B, abpos, aepos, bbpos,
                                          bepos, task, 100, mid=mid)
        else:
            d, res = ex.compute_alignment(A, B, abpos, aepos, bbpos,
                                          bepos, task, 100)
            assert d == case["diffs"]
        flat = (res if task in (ex.PLUS_ALIGN, ex.DIFF_ALIGN)
                else [v for pr in res for v in pr])
        assert flat == case["trace"]


def test_compute_trace_irr(gold):
    from fastga_tpu.ops import tracerec as tr
    MODES = {0: tr.GREEDIEST, 1: tr.UPPERMOST, -1: tr.LOWERMOST}
    for case in gold["irr"]:
        A = np.array(case["A"], np.uint8)
        B = np.array(case["B"], np.uint8)
        t, d = tr.compute_trace_irr(A, B, 0, len(A), 0, len(B),
                                    [tuple(p) for p in case["tpts"]],
                                    MODES[case["mode"]])
        assert t == case["trace"]
        assert d == case["diffs"]


def test_transmit_alignment():
    # same bytes as print_alignment, delivered through the callback
    import io

    from fastga_tpu.io import show as sh
    import numpy as np
    rng = np.random.default_rng(5)
    A = rng.integers(0, 4, 120).astype(np.uint8)
    B = A.copy()
    B[40] = (B[40] + 1) % 4
    from fastga_tpu.ops import tracerec as tr
    trc, d = tr.compute_trace_pts(A, B, 0, 120, 0, 120, [(2, 100), (1, 20)],
                                  100)
    buf = io.StringIO()
    a1, b1 = sh.Seq1(A, 0), sh.Seq1(B, 0)
    sh.print_alignment(buf, a1, b1, trc, 0, 120, 0, 120, 0, 100, 10, False,
                       5, False)
    got = []
    sh.transmit_alignment(got.append, a1, b1, trc, 0, 120, 0, 120, 0, 100,
                          10, False, 5, False)
    assert "".join(got) == buf.getvalue()
