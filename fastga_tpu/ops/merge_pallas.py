"""Pallas TPU kernel: merge two sorted operand streams in one HBM pass.

The seed phase's hot join is a *merge* of two individually sorted entry
streams (device GIX tables are fully sorted by their packed composite
key), but `jax.lax.sort` re-sorts the combined stream from scratch
(~13M rows/s on v5e — it dominated the merge stage).  This kernel is
the classic GPU "Merge Path" scheme mapped to TPU:

1. (XLA) a vectorized binary search finds, for every output block of
   T rows, the split (ia, jb) with ia + jb = k*T such that block k of
   the merged output consumes exactly A[ia_k:ia_{k+1}] and
   B[jb_k:jb_{k+1}]  (Green/McColl/Matsakis merge-path diagonals).
2. (Pallas, grid over blocks) each block DMAs one aligned W-row window
   of A (ascending) and one of pre-reversed B (so its values are
   descending — reversal happens once in XLA; Mosaic needs no flip)
   into VMEM, masks the already-consumed prefixes to +MAX, and runs a
   bitonic merge: the first compare-exchange of concat(A_win, B_desc)
   at stride W leaves the *lower* half containing the block's T output
   rows (every lower element <= every upper element), so only the lower
   W-vector is "cleaned" — 1 + log2(W) compare-exchange stages, all
   `pltpu.roll`-based strided selects on [W/128, 128] int32 tiles.

Operands are int64 on the XLA side (packed keys + payloads); they ride
through the kernel as int32 hi/lo planes (lo compared unsigned via the
sign-flip trick).  With unique live keys — every caller's key embeds
cont/post/comp and a stream tag — the result is exactly
``jax.lax.sort(concat streams, num_keys=2)``; +MAX invalid tails may
permute among themselves (their payloads are never read).

Reference role: this is the TPU replacement for the reference's
adaptamer merge scan over Kmer_Stream cursors (FastGA.c:610-1025) whose
output feeds the same downstream automaton; see ops/device_pipeline.py
merge_seeds.
"""

from __future__ import annotations

from functools import partial

import numpy as np

_I64MAX = np.int64(0x7FFFFFFFFFFFFFFF)
_SIGN32 = np.int32(-0x80000000)

W = 8192            # VMEM window per stream (elements; pow2)
WR = W // 128       # window rows
TR = 56             # output rows per block (multiple of 8 for the TPU
T = TR * 128        # block layout; W - T >= 128 alignment slack)


def _jx():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _split64(jnp, x):
    """int64 -> (hi int32, lo int32 bit-pattern of the unsigned low)."""
    hi = (x >> 32).astype(jnp.int32)
    lo = ((x << 32) >> 32).astype(jnp.int32)   # sign-extended low word
    return hi, lo


def _join64(jnp, hi, lo):
    return ((hi.astype(jnp.int64) << 32)
            | (lo.astype(jnp.int64) & 0xFFFFFFFF))


def _merge_path_splits(jnp, k1a, k2a, k1b, k2b, nblocks):
    """ia[k] = #A rows among the first k*T rows of the merged stream
    (ties — only possible between +MAX invalid rows — place A first)."""
    E1 = k1a.shape[0]
    E2 = k1b.shape[0]
    d = jnp.arange(nblocks, dtype=jnp.int64) * T
    lo = jnp.maximum(jnp.int64(0), d - E2)
    hi = jnp.minimum(d, jnp.int64(E1))
    iters = max(E1, E2).bit_length() + 1
    for _ in range(iters):
        active = lo < hi
        mid = (lo + hi) >> 1
        j = jnp.clip(d - 1 - mid, 0, E2 - 1)
        mc = jnp.clip(mid, 0, E1 - 1)
        a1 = k1a[mc]
        a2 = k2a[mc]
        b1 = k1b[j]
        b2 = k2b[j]
        le = (a1 < b1) | ((a1 == b1) & (a2 <= b2))
        lo = jnp.where(active & le, mid + 1, lo)
        hi = jnp.where(active & ~le, mid, hi)
    return lo.astype(jnp.int32)


def _mk_kernel(nplanes):
    """Kernel body builder; nplanes int32 planes per stream (2 per
    int64 operand, keys first: [k1hi, k1lo, k2hi, k2lo, payload...])."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(*refs):
        # refs: rowA, rowB, offA, endB (SMEM scalar prefetch) |
        #       a_planes (ANY) x nplanes | brev_planes (ANY) x nplanes |
        #       out_planes (VMEM blocks) x nplanes | aw, bw, sems
        rowA, rowB, offA, endB = refs[:4]
        a_refs = refs[4:4 + nplanes]
        b_refs = refs[4 + nplanes:4 + 2 * nplanes]
        outs = refs[4 + 2 * nplanes:4 + 3 * nplanes]
        aw, bw, sems = refs[4 + 3 * nplanes:]

        k = pl.program_id(0)
        ra = rowA[k]
        rb = rowB[k]
        for i in range(nplanes):
            pltpu.make_async_copy(
                a_refs[i].at[pl.ds(ra, WR)], aw.at[i], sems.at[i]).start()
            pltpu.make_async_copy(
                b_refs[i].at[pl.ds(rb, WR)], bw.at[i],
                sems.at[nplanes + i]).start()
        for i in range(nplanes):
            pltpu.make_async_copy(
                a_refs[i].at[pl.ds(ra, WR)], aw.at[i], sems.at[i]).wait()
            pltpu.make_async_copy(
                b_refs[i].at[pl.ds(rb, WR)], bw.at[i],
                sems.at[nplanes + i]).wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 1)
        flat = rows * 128 + lanes

        def rot_right(x, q, t):
            """flat right-rotation by q*128 + t on a [WR, 128] tile."""
            x1 = pltpu.roll(x, q, 0)
            xa = pltpu.roll(x1, t, 1)
            xb = pltpu.roll(xa, 1, 0)
            return jnp.where(lanes >= t, xa, xb)

        # rotate the consumed (excluded) elements to where a +MAX fill
        # preserves monotonicity: A (ascending) excludes its *prefix* ->
        # rotate left by offA so exclusions wrap to the tail; B
        # (descending window of the reversed stream) excludes its
        # *tail* -> rotate right so exclusions wrap to the front.
        WI = jnp.int32(W)
        sa = (WI - offA[k]) & jnp.int32(W - 1)
        sb = (WI - endB[k]) & jnp.int32(W - 1)
        killA = flat >= (WI - offA[k])
        killB = flat < (WI - endB[k])
        MAXHI = jnp.int32(0x7FFFFFFF)
        MAXLO = jnp.int32(-1)

        A = []
        D = []
        saq, sat = sa >> 7, sa & 127
        sbq, sbt = sb >> 7, sb & 127
        for i in range(nplanes):
            mhi = MAXHI if (i % 2 == 0) else MAXLO
            A.append(jnp.where(killA, mhi, rot_right(aw[i], saq, sat)))
            D.append(jnp.where(killB, mhi, rot_right(bw[i], sbq, sbt)))

        def gt(x, y):
            """lexicographic (k1,k2) greater-than on hi/lo planes
            (lo words unsigned via sign flip)."""
            g = x[0] > y[0]
            e = x[0] == y[0]
            xl = x[1] ^ _SIGN32
            yl = y[1] ^ _SIGN32
            g = g | (e & (xl > yl))
            e = e & (xl == yl)
            g = g | (e & (x[2] > y[2]))
            e = e & (x[2] == y[2])
            g = g | (e & ((x[3] ^ _SIGN32) > (y[3] ^ _SIGN32)))
            return g

        # stage 1 of the 2W bitonic merge (stride W): lower half only
        swap = gt(A, D)
        low = [jnp.where(swap, d, a) for a, d in zip(A, D)]

        # clean the bitonic lower half: strides W/2 .. 1
        s = W >> 1
        while s >= 1:
            if s >= 128:
                sr = s // 128
                dn = [pltpu.roll(x, WR - sr, 0) for x in low]
                up = [pltpu.roll(x, sr, 0) for x in low]
                is_lo = ((rows // sr) % 2) == 0
            else:
                dn = [pltpu.roll(x, 128 - s, 1) for x in low]
                up = [pltpu.roll(x, s, 1) for x in low]
                is_lo = (lanes & s) == 0
            swap = (is_lo & gt(low, dn)) | (~is_lo & gt(up, low))
            low = [jnp.where(swap, jnp.where(is_lo, d, u), x)
                   for x, d, u in zip(low, dn, up)]
            s >>= 1

        for i in range(nplanes):
            outs[i][...] = low[i][:TR]

    return kern


_call_cache = {}


def merge_sorted_streams(opsA, opsB, num_keys=2):
    """Merged int64 operand streams (== lax.sort of the concatenation
    for unique live keys).  opsA/opsB: tuples of int64 arrays, the
    first two being the lexicographic sort keys.  Sizes must be
    multiples of 128 and >= W (callers fall back to XLA below that)."""
    jax, jnp = _jx()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E1 = opsA[0].shape[0]
    E2 = opsB[0].shape[0]
    M = E1 + E2
    nops = len(opsA)
    assert num_keys == 2 and nops == len(opsB)
    nplanes = 2 * nops
    nblocks = -(-M // T)

    ia = _merge_path_splits(jnp, opsA[0], opsA[1], opsB[0], opsB[1],
                            nblocks)
    d = (jnp.arange(nblocks, dtype=jnp.int64) * T).astype(jnp.int32)
    jb = d - ia
    rowA = jnp.clip(ia >> 7, 0, E1 // 128 - WR)
    offA = ia - rowA * 128
    e = E2 - jb
    aligned_end = ((e + 127) >> 7) << 7
    rowB = jnp.clip((aligned_end >> 7) - WR, 0, E2 // 128 - WR)
    endB = e - rowB * 128

    planesA = []
    planesB = []
    for x in opsA:
        hi, lo = _split64(jnp, x)
        planesA += [hi.reshape(-1, 128), lo.reshape(-1, 128)]
    for x in opsB:
        hi, lo = _split64(jnp, jnp.flip(x))      # descending stream
        planesB += [hi.reshape(-1, 128), lo.reshape(-1, 128)]

    import os
    import sys
    if sys.getrecursionlimit() < 10000:
        sys.setrecursionlimit(10000)   # MLIR builder recurses over the
                                       # unrolled stage chain
    interp = os.environ.get("FASTGA_TPU_MERGE_INTERPRET") == "1"
    key = (E1, E2, nops, interp)
    call = _call_cache.get(key)
    if call is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * nplanes * 2,
            out_specs=[pl.BlockSpec((TR, 128), lambda k, *_: (k, 0))]
            * nplanes,
            scratch_shapes=[
                pltpu.VMEM((nplanes, WR, 128), jnp.int32),
                pltpu.VMEM((nplanes, WR, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2 * nplanes,)),
            ],
        )
        call = pl.pallas_call(
            _mk_kernel(nplanes),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nblocks * TR, 128),
                                            jnp.int32)] * nplanes,
            interpret=interp,
        )
        _call_cache[key] = call

    # trace the kernel with x64 OFF: under x64, python-int constants in
    # the kernel (static roll shifts, iota arithmetic) become weak int64
    # and Mosaic's int64 convert_element_type lowering recurses forever.
    # Every boundary type is int32, so semantics are unchanged.
    with jax.enable_x64(False):
        outs = call(rowA, rowB, offA, endB, *planesA, *planesB)
    merged = []
    for i in range(nops):
        hi = outs[2 * i].reshape(-1)[:M]
        lo = outs[2 * i + 1].reshape(-1)[:M]
        merged.append(_join64(jnp, hi, lo))
    return tuple(merged)


def supported(E1: int, E2: int) -> bool:
    """Kernel applicability: row-aligned streams big enough for the
    aligned VMEM windows."""
    return (E1 % 128 == 0 and E2 % 128 == 0 and E1 >= W and E2 >= W)
