"""Merge-path Pallas kernel == lax.sort on two sorted streams.

Runs the kernel in interpret mode on the CPU test mesh (the real-TPU
path is exercised by the bench and tools/refcheck.py).  Geometries
cover: balanced, one-sided tiny valid counts, and the 1.5*2^k pad
bucket with full streams (no invalid tail).
"""

import os

import numpy as np

from conftest import INTERPRET
import pytest

jax = pytest.importorskip("jax")

I64MAX = np.int64(0x7FFFFFFFFFFFFFFF)


def _mk_stream(rng, E, nvalid, parity):
    import jax.numpy as jnp
    k1 = np.sort(rng.integers(-2**62, 2**62, nvalid, dtype=np.int64))
    k2 = (rng.integers(0, 2**61, nvalid, dtype=np.int64) // 2) * 2 + parity
    v1 = rng.integers(0, 2**62, nvalid, dtype=np.int64)
    v2 = rng.integers(0, 2**62, nvalid, dtype=np.int64)
    pad = np.full(E - nvalid, I64MAX)
    return tuple(jnp.asarray(np.concatenate([x, pad]))
                 for x in (k1, k2, v1, v2))


@pytest.mark.parametrize("geom", [(8192, 8192, 8000, 8100),
                                  (12288, 8192, 12288, 5)])
def test_merge_kernel_equals_lax_sort(geom):
    if INTERPRET:
        os.environ["FASTGA_TPU_MERGE_INTERPRET"] = "1"
    try:
        import jax.numpy as jnp

        from fastga_tpu.ops import merge_pallas as mp
        with jax.enable_x64():
            E1, E2, n1, n2 = geom
            rng = np.random.default_rng(E1 * 31 + E2)
            A = _mk_stream(rng, E1, n1, 0)
            B = _mk_stream(rng, E2, n2, 1)
            got = mp.merge_sorted_streams(A, B)
            ref = jax.lax.sort(
                tuple(jnp.concatenate([a, b]) for a, b in zip(A, B)),
                num_keys=2)
            nval = n1 + n2
            for i in range(4):
                np.testing.assert_array_equal(np.asarray(got[i])[:nval],
                                              np.asarray(ref[i])[:nval])
    finally:
        os.environ.pop("FASTGA_TPU_MERGE_INTERPRET", None)
