"""Fused multi-channel scan kernel == sequential oracle.

Interpret mode on the CPU test mesh; the real-TPU path is exercised by
the bench and tools/refcheck.py.  Covers every op, segmented and plain,
both directions, multi-block streams, and non-block-aligned tails.
"""

import os

import numpy as np

from conftest import INTERPRET
import pytest

jax = pytest.importorskip("jax")


@pytest.mark.parametrize("M", [33024, 128 * 7])
@pytest.mark.parametrize("reverse", [False, True])
def test_fused_scan_matches_oracle(M, reverse):
    if INTERPRET:
        os.environ["FASTGA_TPU_SCAN_INTERPRET"] = "1"
    try:
        import jax.numpy as jnp

        from fastga_tpu.ops import scan_pallas as sp
        rng = np.random.default_rng(M + reverse)
        f0 = (rng.random(M) < 0.02).astype(np.int32)
        f1 = (rng.random(M) < 0.3).astype(np.int32)
        vals = [
            rng.integers(0, 50, M).astype(np.int32),          # sum plain
            rng.integers(-1000, 1000, M).astype(np.int32),    # max seg f0
            rng.integers(-1000, 1000, M).astype(np.int32),    # min seg f1
            rng.integers(0, 2**18, M).astype(np.int32),       # last f1
            rng.integers(0, 50, M).astype(np.int32),          # sum seg f0
            rng.integers(-1000, 1000, M).astype(np.int32),    # max plain
        ]
        spec = (("sum", None), ("max", 0), ("min", 1), ("last", 1),
                ("sum", 0), ("max", None))
        flags = (jnp.asarray(f0), jnp.asarray(f1))
        got = sp.fused_scan(tuple(jnp.asarray(v) for v in vals), spec,
                            flags, reverse=reverse)
        want = sp.fused_scan_ref(vals, spec, (f0, f1), reverse=reverse)
        for c in range(len(spec)):
            np.testing.assert_array_equal(
                np.asarray(got[c]), want[c],
                err_msg=f"channel {c} {spec[c]} reverse={reverse}")
    finally:
        os.environ.pop("FASTGA_TPU_SCAN_INTERPRET", None)
