"""Pallas TPU kernel: fused multi-channel prefix/suffix scans in one pass.

The device seed pipeline leans on long 1-D scans — cumulative sums,
segmented maxima (chain sweeps, LCP window minima) and mark-fills
(transporting a value from the nearest marked row) over 10-40M-row
streams.  Expressed one at a time through XLA (`jnp.cumsum`,
`lax.cummax`, the int64 tag tricks in device_pipeline) each scan is a
multi-pass HBM program at int64 width: ~40-50 ms per scan at bench
shapes, and the merge + chain stages run ~15 of them.

This kernel runs ALL the scans a stage needs in ONE sequential pass:

- channels are int32 [M] streams; each channel declares an associative
  op (`sum`, `max`, `min`, `last`) and optionally one of the shared
  flag streams making it a *segmented* scan (the flagged row restarts
  the running value, inclusive of itself; `last` transports the value
  at the most recent flagged row — no int64 tag packing needed);
- the grid walks row blocks in order (TPU grids are sequential), a
  carry pair per channel + flag lives in VMEM scratch between blocks;
- within a block: log-step scan across lanes (7 rolls), a row-total
  scan across sublanes (log2(BR) rolls of the broadcast column), then
  one combine against the incoming carry — ~18 VPU stages per channel
  per block, one HBM read + one write per plane.

Suffix scans (`reverse=True`) mirror every shift and walk the grid
backwards — no `jnp.flip` round trips.

Reference role: replaces the reference's per-thread linear sweeps over
sorted seed/chain arrays (FastGA.c:2281-2496 chain automaton state,
GIXmake.c LCP neighbor scans) whose running state the TPU formulation
carries as scan channels; see ops/device_pipeline.py.
"""

from __future__ import annotations

import numpy as np

I32MIN = -0x80000000
I32MAX = 0x7FFFFFFF

BR = 256          # block rows: [BR, 128] tiles per grid step
BLK = BR * 128

_IDENT = {"sum": 0, "max": I32MIN, "min": I32MAX, "last": 0}


def _jx():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def supported(M: int) -> bool:
    return M % 128 == 0


def _mk_kernel(spec, nflags, reverse):
    """spec: tuple of (op, flag_id|None).  Kernel signature:
    [flag blocks] x nflags, [value blocks] x nch -> [out blocks] x nch,
    scratch carry [8k, 128]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch = len(spec)
    # carry rows: one per channel (the carried VALUE alone suffices —
    # a segment restart in an earlier block is already folded into it,
    # and 'last' channels carry 0 until the first mark by construction)
    CAR_R = ((nch + 7) // 8) * 8

    def op_of(name):
        if name == "sum":
            return lambda a, b: a + b
        if name == "max":
            return jnp.maximum
        if name == "min":
            return jnp.minimum
        return lambda a, b: b   # 'last': right operand wins (see below)

    def kern(*refs):
        f_refs = refs[:nflags]
        v_refs = refs[nflags:nflags + nch]
        o_refs = refs[nflags + nch:nflags + 2 * nch]
        car = refs[nflags + 2 * nch]

        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            cr = jax.lax.broadcasted_iota(jnp.int32, (CAR_R, 128), 0)
            init = jnp.zeros((CAR_R, 128), jnp.int32)
            for c, (op, _) in enumerate(spec):
                init = jnp.where(cr == c, jnp.int32(_IDENT[op]), init)
            car[:, :] = init

        rows = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 1)

        if not reverse:
            def shl_ane(x, sh, fill):      # combine with element i-sh
                r = pltpu.roll(x, sh, 1)
                return jnp.where(lanes >= sh, r, fill)

            def shrow(x, sh, fill):        # combine with row r-sh
                r = pltpu.roll(x, sh, 0)
                return jnp.where(rows >= sh, r, fill)
            LAST_ROW, LAST_LANE = BR - 1, 127
            TOT_SLICE = slice(127, 128)
        else:
            def shl_ane(x, sh, fill):      # combine with element i+sh
                r = pltpu.roll(x, 128 - sh, 1)
                return jnp.where(lanes < 128 - sh, r, fill)

            def shrow(x, sh, fill):
                r = pltpu.roll(x, BR - sh, 0)
                return jnp.where(rows < BR - sh, r, fill)
            LAST_ROW, LAST_LANE = 0, 0
            TOT_SLICE = slice(0, 1)

        fl = [f_refs[s][:, :] for s in range(nflags)]
        vl = []
        for c, (op, fid) in enumerate(spec):
            v = v_refs[c][:, :]
            if op == "last":
                v = jnp.where(fl[fid] != 0, v, 0)
            vl.append(v)

        # ---- stage 1: lane-level segmented log-step ----
        sh = 1
        while sh < 128:
            fsh = [shl_ane(f, sh, 0) for f in fl]
            for c, (op, fid) in enumerate(spec):
                vsh = shl_ane(vl[c], sh, _IDENT[op])
                comb = op_of(op)(vsh, vl[c])
                if fid is not None:
                    if op == "last":
                        # value rides the flag: combine keeps own value
                        # when own prefix already saw a mark
                        comb = jnp.where(fl[fid] != 0, vl[c], vsh)
                    else:
                        comb = jnp.where(fl[fid] != 0, vl[c], comb)
                vl[c] = comb
            for s in range(nflags):
                fl[s] = fl[s] | fsh[s]
            sh <<= 1

        # ---- stage 2: row totals scanned across sublanes ----
        tf = [jnp.broadcast_to(f[:, TOT_SLICE], (BR, 128)) for f in fl]
        tv = [jnp.broadcast_to(v[:, TOT_SLICE], (BR, 128)) for v in vl]
        sh = 1
        while sh < BR:
            tfsh = [shrow(f, sh, 0) for f in tf]
            for c, (op, fid) in enumerate(spec):
                vsh = shrow(tv[c], sh, _IDENT[op])
                if fid is not None and op == "last":
                    comb = jnp.where(tf[fid] != 0, tv[c], vsh)
                else:
                    comb = op_of(op)(vsh, tv[c])
                    if fid is not None:
                        comb = jnp.where(tf[fid] != 0, tv[c], comb)
                tv[c] = comb
            for s in range(nflags):
                tf[s] = tf[s] | tfsh[s]
            sh <<= 1

        # ---- stage 3: fold row prefixes + block carry into elements ----
        pf = [shrow(f, 1, 0) for f in tf]            # rows before r
        ff = []                                      # full in-block flag
        for s in range(nflags):
            ff.append(fl[s] | pf[s])
        out = []
        for c, (op, fid) in enumerate(spec):
            pv = shrow(tv[c], 1, _IDENT[op])
            if fid is not None and op == "last":
                v2 = jnp.where(fl[fid] != 0, vl[c], pv)
            else:
                v2 = op_of(op)(pv, vl[c])
                if fid is not None:
                    v2 = jnp.where(fl[fid] != 0, vl[c], v2)
            # carry from previous blocks
            cv = car[c, 0]
            if fid is not None:
                v2 = jnp.where(ff[fid] != 0, v2,
                               op_of(op)(jnp.full((BR, 128), cv,
                                                  jnp.int32), v2)
                               if op != "last"
                               else jnp.full((BR, 128), cv, jnp.int32))
            else:
                v2 = op_of(op)(jnp.full((BR, 128), cv, jnp.int32), v2)
            out.append(v2)
            o_refs[c][:, :] = v2

        # ---- stage 4: update carries ----
        for c, (op, fid) in enumerate(spec):
            car[c:c + 1, :] = jnp.full(
                (1, 128), out[c][LAST_ROW, LAST_LANE], jnp.int32)

    return kern, CAR_R


_call_cache = {}


def fused_scan(values, spec, flags=(), reverse=False):
    """Multi-channel inclusive scan over int32 [M] streams (one kernel
    pass).  spec[c] = (op, flag_id|None), op in {sum,max,min,last};
    flag_id indexes `flags`.  Forward: out[i] combines v[j] for j from
    the channel's segment start (the latest flagged row <= i, or 0) up
    to i; `last` yields v at that flagged row (0 before any mark).
    reverse=True mirrors everything (suffix scan / earliest mark >= i).
    M must be a multiple of 128; rows are zero/identity padded up to the
    block size internally."""
    import os

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = values[0].shape[0]
    assert M % 128 == 0, M
    nch = len(values)
    assert len(spec) == nch
    nflags = len(flags)
    spec = tuple((op, fid) for (op, fid) in spec)

    Mp = ((M + BLK - 1) // BLK) * BLK
    nblk = Mp // BLK

    def prep(x, fill):
        x = x.astype(jnp.int32)
        if Mp != M:
            pad = jnp.full(Mp - M, fill, jnp.int32)
            x = jnp.concatenate([x, pad])
        return x.reshape(-1, 128)

    f2 = [prep(f, 0) for f in flags]
    v2 = [prep(v, _IDENT[op]) for v, (op, _) in zip(values, spec)]

    interp = os.environ.get("FASTGA_TPU_SCAN_INTERPRET") == "1"
    key = (Mp, spec, nflags, bool(reverse), interp)
    call = _call_cache.get(key)
    if call is None:
        kern, CAR_R = _mk_kernel(spec, nflags, reverse)
        if reverse:
            imap = lambda k: (nblk - 1 - k, 0)
        else:
            imap = lambda k: (k, 0)
        bspec = pl.BlockSpec((BR, 128), imap, memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=[bspec] * (nflags + nch),
            out_specs=[bspec] * nch,
            out_shape=[jax.ShapeDtypeStruct((Mp // 128, 128), jnp.int32)]
            * nch,
            scratch_shapes=[pltpu.VMEM((CAR_R, 128), jnp.int32)],
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        _call_cache[key] = call

    with jax.enable_x64(False):
        outs = call(*f2, *v2)
    return tuple(o.reshape(-1)[:M] for o in outs)


def fused_scan_ref(values, spec, flags=(), reverse=False):
    """Pure-numpy oracle for tests (O(M) sequential)."""
    M = len(values[0])
    outs = []
    for v, (op, fid) in zip(values, spec):
        v = np.asarray(v, np.int64)
        f = (np.asarray(flags[fid]) != 0) if fid is not None \
            else np.zeros(M, bool)
        idx = range(M) if not reverse else range(M - 1, -1, -1)
        acc = _IDENT[op]
        marked = False
        out = np.zeros(M, np.int64)
        for i in idx:
            if op == "last":
                if f[i]:
                    acc, marked = v[i], True
                out[i] = acc if marked else 0
                continue
            if f[i]:
                acc = v[i]
            else:
                acc = (acc + v[i] if op == "sum"
                       else (max(acc, v[i]) if op == "max"
                             else min(acc, v[i])))
            out[i] = acc
        outs.append(out.astype(np.int32))
    return tuple(outs)
