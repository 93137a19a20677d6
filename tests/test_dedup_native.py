"""C dedup (trw_dedup_group) vs the Python dedup_group reference.

Synthesizes per-group record sets on a few diagonals — duplicates,
contained records, co-linear fusable pairs (shared trace points), and
fuzzy-box near-duplicates — and checks the two implementations agree on
survivors, fused endpoints, diffs, and traces.
"""

import copy

import numpy as np
import pytest

from fastga_tpu import native
from fastga_tpu.io.alncode import Overlap
from fastga_tpu.models import aligner


def _mk_record(rng, a0, diag, ncol, tspace=100):
    """A colinear record starting at (a0, a0-diag) spanning ncol grid
    columns, with per-interval diffs and b-advance == tspace (so records
    on the same diagonal share trace points exactly)."""
    trace = []
    for _ in range(ncol):
        trace.append((int(rng.integers(0, 9)), tspace))
    bb = a0 - diag
    o = Overlap(aread=0, bread=0, abpos=a0, aepos=a0 + ncol * tspace,
                bbpos=bb, bepos=bb + ncol * tspace,
                diffs=sum(d for d, _ in trace), bcomp=False,
                trace=trace)
    return o


@pytest.mark.skipif(native.get_tracerec() is None
                    or not hasattr(native.get_tracerec(),
                                   "trw_dedup_group"),
                    reason="native library unavailable")
def test_c_dedup_matches_python(monkeypatch):
    rng = np.random.default_rng(0xDED)
    for trial in range(300):
        g = int(rng.integers(1, 12))
        ovls = []
        diags = [int(rng.integers(-3, 4)) * 50 for _ in range(3)]
        for _ in range(g):
            d = diags[int(rng.integers(0, len(diags)))]
            a0 = int(rng.integers(0, 12)) * 100
            ncol = int(rng.integers(1, 10))
            ovls.append(_mk_record(rng, a0, d, ncol))
        # duplicates / overlaps arise naturally from the small grid
        a = copy.deepcopy(ovls)
        b = copy.deepcopy(ovls)

        with monkeypatch.context() as m:
            m.setattr(aligner, "_dedup_group_native",
                      lambda os: None)
            py = aligner.dedup_group(a)
        cc = aligner.dedup_group(b)

        key = lambda o: (o.abpos, o.aepos, o.bbpos, o.bepos, o.diffs,
                         tuple(map(tuple, o.trace)))
        assert [key(o) for o in cc] == [key(o) for o in py], \
            f"trial {trial}"
