"""Batched O(nd) wavefront aligner — the TPU device kernel.

Runs the reference's adaptive wave recurrence (align.c forward_wave /
reverse_wave; scalar spec in ops/wave_ref.py) over a *batch* of seed tubes:
state is [N, W] arrays (N tubes x W diagonal slots); each wave is a fixed
set of vector ops — shifted-neighbour furthest-reach max, 16-base
packed-word snake extension, windowed 60-bit match-history updates,
suffix-positive trim-table gathers, WAVE_LAG band pruning.  The dynamic
diagonal band is virtualized onto slots through a per-tube drifting window
(kbase) recentered every wave.

Exactness strategy:
- endpoints / diffs / trim points computed exactly on device;
- the trace-point path is reconstructed on the host from a compact per-wave
  predecessor-choice log (ops/wave_replay.py) — no pebble chains on device;
- tubes exceeding static budgets (band wider than W-4, wave budget,
  degenerate empty band) are flagged `fallback` and re-run on the exact
  host engine by the driver.

Everything is jit-compiled once per (N, W, chunk) configuration.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import numpy as np

from .wave_ref import (PATH_LEN, TRIM_LEN, TRIM_MASK, TRIM_MLAG, WAVE_LAG,
                       AlignSpec)

# choice codes in the replay log
CH_DIAG = 0   # inherited from same diagonal (substitution step)
CH_LOW = 1    # from k-1
CH_HIGH = 2   # from k+1
CH_NONE = 3


class WaveConfig(NamedTuple):
    n: int = 256        # tubes per batch
    w: int = 256        # diagonal slots
    chunk: int = 128    # waves per device call
    max_chunks: int = 64


class WaveResult(NamedTuple):
    """Per-tube device outputs (host numpy [n])."""
    trima: np.ndarray    # trim anti (fwd: aepos+bepos; rev: abpos+bbpos)
    trimx: np.ndarray    # trim A coordinate
    trimd: np.ndarray    # trim diffs
    trim_wave: np.ndarray
    trim_slot: np.ndarray  # trim diagonal
    kbase0: np.ndarray
    nwaves: np.ndarray
    fallback: np.ndarray
    budget: np.ndarray = None   # fallback subset: wave-budget exhausted
    # (still alive) rather than band overflow / empty band


def _ctz2(jnp, x):
    """#matching leading bases = trailing-zero bits / 2 (16 if equal)."""
    z = x | jnp.uint32(0)
    low = z & (~z + jnp.uint32(1))
    tz = _popcount32(jnp, low - jnp.uint32(1))
    return jnp.where(x == 0, 16, tz >> 1).astype(jnp.int32)


def _popcount32(jnp, v):
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _rev2(jnp, v):
    """Reverse 2-bit groups within uint32."""
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333)) << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF)) << 8)
    return (v >> 16) | (v << 16)


def _fetch16(jnp, pool, woff, start):
    """16 bases starting at ``start`` (may be negative; guard words around
    every sequence make out-of-range reads zeros, clamped by callers)."""
    w = start >> 4                    # arithmetic shift: floor
    sh = ((start & 15) << 1).astype(jnp.uint32)
    idx = woff + w
    w0 = pool[idx].astype(jnp.uint32)
    w1 = pool[idx + 1].astype(jnp.uint32)
    lo = jnp.where(sh > 0, w0 >> sh, w0)
    hi = jnp.where(sh > 0, w1 << (jnp.uint32(32) - sh), jnp.uint32(0))
    return lo | hi


def _fetch64_pair(jnp, pool, aw, astart, bw, bstart):
    """Four 16-base words per side for both sequences with ONE pool gather.

    Gathers on TPU run on the scalar core; batching the 10 word reads of a
    64-base double-fetch into one [N, 10*W] gather removes ~10 kernel
    launches per snake step.  Returns (a_words[4], b_words[4]) as uint32
    [N, W] arrays; out-of-range reads hit the pool guard words.
    """
    wa = astart >> 4
    wb = bstart >> 4
    sha = ((astart & 15) << 1).astype(jnp.uint32)
    shb = ((bstart & 15) << 1).astype(jnp.uint32)
    idxa = jnp.stack([aw[:, None] + wa + k for k in range(5)], axis=1)
    idxb = jnp.stack([bw[:, None] + wb + k for k in range(5)], axis=1)
    big = jnp.concatenate([idxa, idxb], axis=1)          # [N, 10, W]
    words = pool[big].astype(jnp.uint32)                 # one gather
    out = []
    for side, sh in ((0, sha), (1, shb)):
        ws = [words[:, side * 5 + k] for k in range(5)]
        row = []
        for k in range(4):
            lo = jnp.where(sh > 0, ws[k] >> sh, ws[k])
            hi = jnp.where(sh > 0,
                           ws[k + 1] << (jnp.uint32(32) - sh),
                           jnp.uint32(0))
            row.append(lo | hi)
        out.append(row)
    return out[0], out[1]


def build_forward_chunk(cfg: WaveConfig, path_ave: int,
                        table: np.ndarray, score: np.ndarray,
                        direction: int = +1):
    """Compile the per-chunk wave stepper for one direction.

    direction=+1: forward wave (maximize anti); -1: reverse (minimize).
    Returns a jitted fn: (pool, targs, state) -> (state, logs).
    """
    import jax
    import jax.numpy as jnp

    N, W, CW = cfg.n, cfg.w, cfg.chunk
    TBL = jnp.asarray(table.astype(np.int32))
    SCR = jnp.asarray(score.astype(np.int32))
    PA = path_ave
    fwd = direction > 0
    BAR = jnp.int32(-1) if fwd else jnp.int32(0x7FFFFFFF)
    wix = jnp.arange(W, dtype=jnp.int32)[None, :]          # [1, W]

    def snake(pool, x, k, aw, alen, bw, blen, thi, tlo, m, active):
        """Match extension, 64 bases per step, one gather per step."""
        def cond(st):
            return st[-1].any()

        def body(st):
            x_, thi_, tlo_, m_, cont = st
            y_ = x_ - k
            if fwd:
                va = jnp.clip(alen - x_, 0, 64)
                vb = jnp.clip(blen - y_, 0, 64)
                was, wbs = _fetch64_pair(jnp, pool, aw, x_, bw, y_)
            else:
                va = jnp.clip(x_, 0, 64)
                vb = jnp.clip(y_, 0, 64)
                was, wbs = _fetch64_pair(jnp, pool, aw, x_ - 64, bw, y_ - 64)
                was = [_rev2(jnp, w) for w in was][::-1]
                wbs = [_rev2(jnp, w) for w in wbs][::-1]
            mm = [_ctz2(jnp, a ^ b) for a, b in zip(was, wbs)]
            run = mm[0]
            full = mm[0] == 16
            for kk in (1, 2, 3):
                run = jnp.where(full, 16 * kk + mm[kk], run)
                full = full & (mm[kk] == 16)
            run = jnp.minimum(jnp.minimum(run, va), vb)
            run = jnp.where(cont, run, 0)
            # window update: the reference checks bit 60 *before* each
            # shift (align.c:698-701), so a run of r matches increments
            # m by r - popcount(bits [61-r, 60] of the pre-run vector);
            # runs up to 64 are applied as four <=16 sub-shifts
            m2, thi2, tlo2 = m_, thi_, tlo_
            for kk in range(4):
                r = jnp.clip(run - 16 * kk, 0, 16)
                ru = r.astype(jnp.uint32)
                out_bits = jnp.where(
                    r > 0,
                    (thi2 >> (jnp.uint32(29) - ru)) & ((jnp.uint32(1) << ru)
                                                       - jnp.uint32(1)),
                    jnp.uint32(0))
                m2 = m2 + r - _popcount32(jnp, out_bits)
                ones = jnp.where(r > 0,
                                 (jnp.uint32(1) << ru) - jnp.uint32(1),
                                 jnp.uint32(0))
                nthi = jnp.where(
                    r > 0,
                    (thi2 << ru) | (tlo2 >> (jnp.uint32(32) - ru)), thi2)
                tlo2 = jnp.where(r > 0, (tlo2 << ru) | ones, tlo2)
                thi2 = nthi
            x2 = x_ + (run if fwd else -run)
            cont2 = cont & (run == 64)
            return x2, thi2, tlo2, m2, cont2

        x, thi, tlo, m, _ = jax.lax.while_loop(
            cond, body, (x, thi, tlo, m, active))
        y = x - k
        if fwd:
            b_sent = (y < 0) | (y >= blen)
            a_sent = ~b_sent & ((x < 0) | (x >= alen))
        else:
            b_sent = (y - 1 < 0) | (y - 1 >= blen)
            a_sent = ~b_sent & ((x - 1 < 0) | (x - 1 >= alen))
        return x, thi, tlo, m, b_sent & active, a_sent & active

    def one_wave(pool, targs, st):
        (V, Thi, Tlo, M, kbase, low, hgh, besta, bestx, lasta,
         trima, trimx, trimd, trim_wave, trim_slot,
         alive, fallback, dif) = st
        aw, alen, bw, blen, minp, maxp = targs

        live = alive[:, None]

        # --- band expansion (minp/maxp clamped) ---
        # diag of slot w = kbase + w; minp/maxp are diagonal bounds
        lowd = kbase + low - 1
        can_low = lowd >= minp
        low2 = jnp.where(alive & can_low, low - 1, low)
        hghd = kbase + hgh + 1
        can_hgh = hghd <= maxp
        hgh2 = jnp.where(alive & can_hgh, hgh + 1, hgh)
        dif2 = jnp.where(alive, dif + 1, dif)

        # fresh edge cells get the barrier value
        is_new_low = (wix == low2[:, None]) & (low2 != low)[:, None]
        is_new_hgh = (wix == hgh2[:, None]) & (hgh2 != hgh)[:, None]
        V1 = jnp.where((is_new_low | is_new_hgh) & live, BAR, V)

        in_band = (wix >= low2[:, None]) & (wix <= hgh2[:, None]) & live
        Vr = jnp.where(in_band, V1, BAR)

        # --- transition: choose from k-1 / k / k+1 ---
        Vm = jnp.concatenate([jnp.full((N, 1), BAR, jnp.int32), Vr[:, :-1]],
                             axis=1)   # V[k-1]
        Vp = jnp.concatenate([Vr[:, 1:], jnp.full((N, 1), BAR, jnp.int32)],
                             axis=1)   # V[k+1]
        am, ac, ap = Vm, Vr, Vp
        if fwd:
            take_p = ((ac < am) & (am < ap)) | (~(ac < am) & (ac < ap))
            take_m = (ac < am) & ~(am < ap)
            c_pre = jnp.where(take_p, ap + 1,
                              jnp.where(take_m, am + 1, ac + 2))
        else:
            take_m = ((ac > ap) & (ap > am)) | (~(ac > ap) & (ac > am))
            take_p = (ac > ap) & ~(ap > am)
            c_pre = jnp.where(take_m, am - 1,
                              jnp.where(take_p, ap - 1, ac - 2))
        choice = jnp.where(take_p, CH_HIGH,
                           jnp.where(take_m, CH_LOW, CH_DIAG)
                           ).astype(jnp.uint8)
        choice = jnp.where(in_band, choice, CH_NONE)

        def pick(A):
            Am = jnp.concatenate([A[:, :1], A[:, :-1]], axis=1)
            Ap = jnp.concatenate([A[:, 1:], A[:, -1:]], axis=1)
            return jnp.where(take_p, Ap, jnp.where(take_m, Am, A))

        thi = pick(Thi)
        tlo = pick(Tlo)
        m = pick(M)

        # edit step: drop one window bit, shift in 0
        m = m - ((thi >> jnp.uint32(28)) & jnp.uint32(1)).astype(jnp.int32)
        thi = (thi << 1) | (tlo >> 31)
        tlo = tlo << 1

        # --- snake extension ---
        k = kbase[:, None] + wix
        x = (c_pre + k) >> 1
        x, thi, tlo, m, b_sent, a_sent = snake(
            pool, x, k, aw, alen[:, None], bw, blen[:, None],
            thi, tlo, m, in_band)
        c = (x << 1) - k

        # --- best / trim updates (descending-k running max semantics) ---
        cm = jnp.where(in_band, c, BAR)
        if fwd:
            # suffix (high-w) exclusive cummax
            rc = jax.lax.cummax(cm[:, ::-1], axis=1)[:, ::-1]
            suff_excl = jnp.concatenate(
                [rc[:, 1:], jnp.full((N, 1), BAR, jnp.int32)], axis=1)
            improver = in_band & (c > jnp.maximum(besta[:, None], suff_excl))
            cbest = rc[:, 0]
            better = alive & (cbest > besta)
        else:
            rc = jax.lax.cummin(cm, axis=1)
            pre_excl = jnp.concatenate(
                [jnp.full((N, 1), BAR, jnp.int32), rc[:, :-1]], axis=1)
            improver = in_band & (c < jnp.minimum(besta[:, None], pre_excl))
            cbest = rc[:, -1]
            better = alive & (cbest < besta)

        # the final (in iteration order) improver = the one with extreme c
        imp_c = jnp.where(improver, c, BAR)
        if fwd:
            best_slot = jnp.argmax(imp_c, axis=1)       # first max slot
        else:
            best_slot = jnp.argmin(imp_c, axis=1)
        rowix = jnp.arange(N)
        besta2 = jnp.where(better, cbest, besta)
        bestx2 = jnp.where(better, x[rowix, best_slot], bestx)

        # lasta: extreme c among improvers with m >= PATH_AVE
        el = improver & (m >= PA)
        el_c = jnp.where(el, c, BAR)
        if fwd:
            l_val = el_c.max(axis=1)
            l_upd = alive & el.any(axis=1) & (l_val > besta)
        else:
            l_val = el_c.min(axis=1)
            l_upd = alive & el.any(axis=1) & (l_val < besta)
        lasta2 = jnp.where(l_upd, l_val, lasta)

        # trim: extreme c among improvers passing m and the score tables
        b15 = (tlo & jnp.uint32(TRIM_MASK)).astype(jnp.int32)
        b30 = (((tlo >> jnp.uint32(15)) | (thi << jnp.uint32(17)))
               & jnp.uint32(TRIM_MASK)).astype(jnp.int32)
        tok = (TBL[b15] >= 0) & (TBL[b30] + SCR[b15] >= 0)
        et = el & tok
        et_c = jnp.where(et, c, BAR)
        if fwd:
            t_val = et_c.max(axis=1)
            t_slot = jnp.argmax(et_c, axis=1)
            t_upd = alive & et.any(axis=1) & (t_val > besta)
        else:
            t_val = et_c.min(axis=1)
            t_slot = jnp.argmin(et_c, axis=1)
            t_upd = alive & et.any(axis=1) & (t_val < besta)
        trima2 = jnp.where(t_upd, t_val, trima)
        trimx2 = jnp.where(t_upd, x[rowix, t_slot], trimx)
        trimd2 = jnp.where(t_upd, dif2, trimd)
        trim_wave2 = jnp.where(t_upd, dif2, trim_wave)
        trim_slot2 = jnp.where(t_upd, (kbase + t_slot).astype(jnp.int32),
                               trim_slot)

        # write back state (in-band only)
        V2 = jnp.where(in_band, c, V1)
        Thi2 = jnp.where(in_band, thi, Thi)
        Tlo2 = jnp.where(in_band, tlo, Tlo)
        M2 = jnp.where(in_band, m, M)

        # --- sentinel clipping (align.c:757-782 / mirrored) ---
        hit = (a_sent | b_sent).any(axis=1)
        more = ~hit
        # best point off-boundary rescues `more`
        by = besta2 - bestx2
        if fwd:
            b_in = (by >= 0) & (by < blen)
            a_in = (bestx2 >= 0) & (bestx2 < alen)
        else:
            b_in = (by - 1 >= 0) & (by - 1 < blen)
            a_in = (bestx2 - 1 >= 0) & (bestx2 - 1 < alen)
        more = more | (b_in & a_in)

        big = jnp.int32(1 << 30)
        if fwd:
            aclip = jnp.where(a_sent, wix, big).min(axis=1)      # lowest slot
            bclip = jnp.where(b_sent, wix, -big).max(axis=1)     # highest
            hgh3 = jnp.where(hit & (hgh2 >= aclip), aclip - 1, hgh2)
            low3 = jnp.where(hit & (low2 <= bclip), bclip + 1, low2)
        else:
            aclip = jnp.where(a_sent, wix, -big).max(axis=1)     # highest
            bclip = jnp.where(b_sent, wix, big).min(axis=1)      # lowest
            low3 = jnp.where(hit & (low2 <= aclip), aclip + 1, low2)
            hgh3 = jnp.where(hit & (hgh2 >= bclip), bclip - 1, hgh2)

        # --- WAVE_LAG band prune ---
        if fwd:
            thr = besta2 - WAVE_LAG
            ok = in_band & (V2 >= thr[:, None])
        else:
            thr = besta2 + WAVE_LAG
            ok = in_band & (V2 <= thr[:, None])
        ok = ok & (wix >= low3[:, None]) & (wix <= hgh3[:, None])
        anyok = ok.any(axis=1)
        hgh4 = jnp.where(ok, wix, -big).max(axis=1)
        low4 = jnp.where(ok, wix, big).min(axis=1)
        empty = alive & ~anyok
        hgh4 = jnp.where(anyok, hgh4, low3 - 1)
        low4 = jnp.where(anyok, low4, low3)

        # --- liveness / budgets ---
        if fwd:
            going = more & (lasta2 >= besta2 - TRIM_MLAG)
        else:
            going = more & (lasta2 <= besta2 + TRIM_MLAG)
        width = hgh4 - low4 + 1
        # budget overruns only matter for tubes that would keep going
        over = alive & going & (width > W - 4)
        fallback2 = fallback | over | (alive & going & empty)
        alive2 = alive & going & ~over & ~empty

        # --- recenter band in slot space (only when near the slot edges;
        # the band drifts <=1 slot/wave so this triggers rarely) ---
        need = (alive2 & ((low4 <= 2) | (hgh4 >= W - 3))).any()

        def do_recenter(args):
            V2, Thi2, Tlo2, M2, kbase, low4, hgh4, alive2 = args
            center = (low4 + hgh4) >> 1
            shift = jnp.where(alive2, center - W // 2, 0)
            src = wix + shift[:, None]
            srcc = jnp.clip(src, 0, W - 1)

            def regather(A, fill):
                G = jnp.take_along_axis(A, srcc, axis=1)
                return jnp.where((src >= 0) & (src < W), G, fill)

            return (regather(V2, BAR), regather(Thi2, jnp.uint32(0)),
                    regather(Tlo2, jnp.uint32(0)),
                    regather(M2, jnp.int32(0)),
                    kbase + shift, low4 - shift, hgh4 - shift)

        def no_recenter(args):
            V2, Thi2, Tlo2, M2, kbase, low4, hgh4, alive2 = args
            return (V2, Thi2, Tlo2, M2, kbase, low4, hgh4)

        (V3, Thi3, Tlo3, M3, kbase2, low5, hgh5) = jax.lax.cond(
            need, do_recenter, no_recenter,
            (V2, Thi2, Tlo2, M2, kbase, low4, hgh4, alive2))

        st2 = (V3, Thi3, Tlo3, M3, kbase2, low5, hgh5, besta2, bestx2,
               lasta2, trima2, trimx2, trimd2, trim_wave2, trim_slot2,
               alive2, fallback2, dif2)
        logrow = (choice, jnp.stack([low2, hgh2, kbase, dif2], axis=1))
        return st2, logrow

    def chunk_fn(pool, targs, st):
        def body(i, carry):
            st, chlog, bandlog = carry
            st2, (choice, band) = one_wave(pool, targs, st)
            chlog = jax.lax.dynamic_update_slice(chlog, choice[None],
                                                 (i, 0, 0))
            bandlog = jax.lax.dynamic_update_slice(bandlog, band[None],
                                                   (i, 0, 0))
            return st2, chlog, bandlog

        chlog0 = jnp.full((CW, N, W), CH_NONE, dtype=jnp.uint8)
        bandlog0 = jnp.zeros((CW, N, 4), dtype=jnp.int32)
        st, chlog, bandlog = jax.lax.fori_loop(
            0, CW, body, (st, chlog0, bandlog0))
        return st, chlog, bandlog

    return jax.jit(chunk_fn), snake


def build_wave0(cfg: WaveConfig, direction: int = +1):
    """Compile the wave-0 initializer: state from tube descriptors.

    Wave 0 (align.c:414-510 / mirrored): snakes from x=(anti+k)>>1 on every
    band diagonal; T/M initialized to the full-match window regardless of
    actual matches; trim/best = furthest reach; then the sentinel clip block.
    """
    import jax
    import jax.numpy as jnp

    N, W = cfg.n, cfg.w
    fwd = direction > 0
    BAR = jnp.int32(-1) if fwd else jnp.int32(0x7FFFFFFF)
    wix = jnp.arange(W, dtype=jnp.int32)[None, :]

    def snake0(pool, x, k, aw, alen, bw, blen, active):
        def cond(st):
            return st[-1].any()

        def body(st):
            x_, cont = st
            y_ = x_ - k
            if fwd:
                va = jnp.clip(alen - x_, 0, 64)
                vb = jnp.clip(blen - y_, 0, 64)
                was, wbs = _fetch64_pair(jnp, pool, aw, x_, bw, y_)
            else:
                va = jnp.clip(x_, 0, 64)
                vb = jnp.clip(y_, 0, 64)
                was, wbs = _fetch64_pair(jnp, pool, aw, x_ - 64, bw, y_ - 64)
                was = [_rev2(jnp, w) for w in was][::-1]
                wbs = [_rev2(jnp, w) for w in wbs][::-1]
            mm = [_ctz2(jnp, a ^ b) for a, b in zip(was, wbs)]
            run = mm[0]
            full = mm[0] == 16
            for kk in (1, 2, 3):
                run = jnp.where(full, 16 * kk + mm[kk], run)
                full = full & (mm[kk] == 16)
            run = jnp.minimum(jnp.minimum(run, va), vb)
            run = jnp.where(cont, run, 0)
            x2 = x_ + (run if fwd else -run)
            return x2, cont & (run == 64)

        x, _ = jax.lax.while_loop(cond, body, (x, active))
        y = x - k
        if fwd:
            b_sent = (y < 0) | (y >= blen)
            a_sent = ~b_sent & ((x < 0) | (x >= alen))
        else:
            b_sent = (y - 1 < 0) | (y - 1 >= blen)
            a_sent = ~b_sent & ((x - 1 < 0) | (x - 1 >= alen))
        return x, b_sent & active, a_sent & active

    def wave0(pool, targs, dgmin, dgmax, anti):
        aw, alen, bw, blen, minp, maxp = targs
        kbase = dgmin + ((dgmax - dgmin) >> 1) - W // 2
        low = dgmin - kbase
        hgh = dgmax - kbase
        k = kbase[:, None] + wix
        in_band = (wix >= low[:, None]) & (wix <= hgh[:, None])

        x0 = (anti[:, None] + k) >> 1
        x, b_sent, a_sent = snake0(pool, x0, k, aw, alen[:, None],
                                   bw, blen[:, None], in_band)
        c = (x << 1) - k

        besta0 = anti
        bestx0 = (anti + (kbase + hgh)) >> 1

        cm = jnp.where(in_band, c, BAR)
        rowix = jnp.arange(N)
        if fwd:
            rc = jax.lax.cummax(cm[:, ::-1], axis=1)[:, ::-1]
            suff = jnp.concatenate([rc[:, 1:],
                                    jnp.full((N, 1), BAR, jnp.int32)], axis=1)
            improver = in_band & (c > jnp.maximum(besta0[:, None], suff))
            cbest = rc[:, 0]
            better = cbest > besta0
            imp_c = jnp.where(improver, c, BAR)
            bslot = jnp.argmax(imp_c, axis=1)
        else:
            rc = jax.lax.cummin(cm, axis=1)
            pre = jnp.concatenate([jnp.full((N, 1), BAR, jnp.int32),
                                   rc[:, :-1]], axis=1)
            improver = in_band & (c < jnp.minimum(besta0[:, None], pre))
            cbest = rc[:, -1]
            better = cbest < besta0
            imp_c = jnp.where(improver, c, BAR)
            bslot = jnp.argmin(imp_c, axis=1)

        besta = jnp.where(better, cbest, besta0)
        bestx = jnp.where(better, x[rowix, bslot], bestx0)
        lasta = besta
        trima = besta
        trimx = bestx
        trimd = jnp.zeros(N, jnp.int32)
        trim_wave = jnp.zeros(N, jnp.int32)
        trim_slot = jnp.where(better, kbase + bslot, kbase + hgh)

        # sentinel clip block
        hit = (a_sent | b_sent).any(axis=1)
        more = ~hit
        by = besta - bestx
        if fwd:
            b_in = (by >= 0) & (by < blen)
            a_in = (bestx >= 0) & (bestx < alen)
        else:
            b_in = (by - 1 >= 0) & (by - 1 < blen)
            a_in = (bestx - 1 >= 0) & (bestx - 1 < alen)
        more = more | (b_in & a_in)

        big = jnp.int32(1 << 30)
        if fwd:
            aclip = jnp.where(a_sent, wix, big).min(axis=1)
            bclip = jnp.where(b_sent, wix, -big).max(axis=1)
            hgh = jnp.where(hit & (hgh >= aclip), aclip - 1, hgh)
            low = jnp.where(hit & (low <= bclip), bclip + 1, low)
        else:
            aclip = jnp.where(a_sent, wix, -big).max(axis=1)
            bclip = jnp.where(b_sent, wix, big).min(axis=1)
            low = jnp.where(hit & (low <= aclip), aclip + 1, low)
            hgh = jnp.where(hit & (hgh >= bclip), bclip - 1, hgh)

        V = jnp.where(in_band, c, BAR)
        Thi = jnp.where(in_band, jnp.uint32((1 << 28) - 1), jnp.uint32(0))
        Tlo = jnp.where(in_band, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        M = jnp.where(in_band, jnp.int32(PATH_LEN), jnp.int32(0))

        alive = more
        fallback = jnp.zeros(N, bool)
        dif = jnp.zeros(N, jnp.int32)
        st = (V, Thi, Tlo, M, kbase, low, hgh, besta, bestx, lasta,
              trima, trimx, trimd, trim_wave, trim_slot, alive, fallback, dif)
        return st, kbase

    return jax.jit(wave0)



def _np_fetch64(pool, woff, start):
    """Host mirror of the device 64-base fetch: 4 funnel-shifted words.

    Uses a 64-bit funnel (identical results to the device's guarded
    lo|hi splice) and clamps pool indices exactly like XLA's gather."""
    w = start >> 4
    sh = ((start & 15) << 1).astype(np.uint64)
    P = len(pool)
    ws = [pool[np.clip(woff + w + k, 0, P - 1)].astype(np.uint64)
          for k in range(5)]
    out = []
    for k in range(4):
        pairv = ws[k] | (ws[k + 1] << np.uint64(32))
        out.append(((pairv >> sh) & np.uint64(0xFFFFFFFF))
                   .astype(np.uint32))
    return out


def host_wave0(pool_np, targs, dgmin, dgmax, anti, cfg: WaveConfig,
               direction: int = +1):
    """Numpy wave-0 initializer: exact mirror of build_wave0.

    The one-off init wave is trivial host work; the jitted version cost
    seconds per call on TPU plus a multi-minute uncached compile.  Returns
    (state tuple of numpy arrays, kbase0)."""
    N, W = cfg.n, cfg.w
    fwd = direction > 0
    BAR = np.int32(-1) if fwd else np.int32(0x7FFFFFFF)
    wix = np.arange(W, dtype=np.int32)[None, :]
    aw, alen, bw, blen, minp, maxp = [np.asarray(t, np.int32) for t in targs]
    dgmin = np.asarray(dgmin, np.int32)
    dgmax = np.asarray(dgmax, np.int32)
    anti = np.asarray(anti, np.int32)

    kbase = dgmin + ((dgmax - dgmin) >> 1) - W // 2
    low = dgmin - kbase
    hgh = dgmax - kbase
    k = kbase[:, None] + wix
    in_band = (wix >= low[:, None]) & (wix <= hgh[:, None])

    alen2, blen2 = alen[:, None], blen[:, None]
    x = (anti[:, None] + k) >> 1
    # snake over the shrinking active subset only: full-run lanes halve
    # each round but long perfect stretches mean 100+ rounds, so the
    # device-style full-grid sweep is ~100x more work than needed
    ar, ac = np.nonzero(in_band)
    xs = x[ar, ac]
    ks = k[ar, ac]
    aws, bws = aw[ar], bw[ar]
    als, bls = alen[ar], blen[ar]
    with np.errstate(over="ignore"):
        while len(ar):
            ys = xs - ks
            if fwd:
                va = np.clip(als - xs, 0, 64)
                vb = np.clip(bls - ys, 0, 64)
                was = _np_fetch64(pool_np, aws, xs)
                wbs = _np_fetch64(pool_np, bws, ys)
            else:
                va = np.clip(xs, 0, 64)
                vb = np.clip(ys, 0, 64)
                was = _np_fetch64(pool_np, aws, xs - 64)
                wbs = _np_fetch64(pool_np, bws, ys - 64)
                was = [_rev2(np, w) for w in was][::-1]
                wbs = [_rev2(np, w) for w in wbs][::-1]
            mm = [_ctz2(np, a ^ b) for a, b in zip(was, wbs)]
            run = mm[0]
            full = mm[0] == 16
            for kk in (1, 2, 3):
                run = np.where(full, 16 * kk + mm[kk], run)
                full = full & (mm[kk] == 16)
            run = np.minimum(np.minimum(run, va), vb)
            xs = xs + (run if fwd else -run)
            x[ar, ac] = xs
            keep = run == 64
            if not keep.all():
                ar, ac, xs, ks = ar[keep], ac[keep], xs[keep], ks[keep]
                aws, bws = aws[keep], bws[keep]
                als, bls = als[keep], bls[keep]

    y = x - k
    if fwd:
        b_sent = (y < 0) | (y >= blen2)
        a_sent = ~b_sent & ((x < 0) | (x >= alen2))
    else:
        b_sent = (y - 1 < 0) | (y - 1 >= blen2)
        a_sent = ~b_sent & ((x - 1 < 0) | (x - 1 >= alen2))
    b_sent = b_sent & in_band
    a_sent = a_sent & in_band
    c = ((x << 1) - k).astype(np.int32)

    besta0 = anti
    bestx0 = (anti + (kbase + hgh)) >> 1

    cm = np.where(in_band, c, BAR)
    rowix = np.arange(N)
    if fwd:
        rc = np.maximum.accumulate(cm[:, ::-1], axis=1)[:, ::-1]
        suff = np.concatenate(
            [rc[:, 1:], np.full((N, 1), BAR, np.int32)], axis=1)
        improver = in_band & (c > np.maximum(besta0[:, None], suff))
        cbest = rc[:, 0]
        better = cbest > besta0
        imp_c = np.where(improver, c, BAR)
        bslot = np.argmax(imp_c, axis=1)
    else:
        rc = np.minimum.accumulate(cm, axis=1)
        pre = np.concatenate(
            [np.full((N, 1), BAR, np.int32), rc[:, :-1]], axis=1)
        improver = in_band & (c < np.minimum(besta0[:, None], pre))
        cbest = rc[:, -1]
        better = cbest < besta0
        imp_c = np.where(improver, c, BAR)
        bslot = np.argmin(imp_c, axis=1)

    besta = np.where(better, cbest, besta0).astype(np.int32)
    bestx = np.where(better, x[rowix, bslot], bestx0).astype(np.int32)
    lasta = besta.copy()
    trima = besta.copy()
    trimx = bestx.copy()
    trimd = np.zeros(N, np.int32)
    trim_wave = np.zeros(N, np.int32)
    trim_slot = np.where(better, kbase + bslot, kbase + hgh).astype(np.int32)

    hit = (a_sent | b_sent).any(axis=1)
    more = ~hit
    by = besta - bestx
    if fwd:
        b_in = (by >= 0) & (by < blen)
        a_in = (bestx >= 0) & (bestx < alen)
    else:
        b_in = (by - 1 >= 0) & (by - 1 < blen)
        a_in = (bestx - 1 >= 0) & (bestx - 1 < alen)
    more = more | (b_in & a_in)

    big = np.int32(1 << 30)
    if fwd:
        aclip = np.where(a_sent, wix, big).min(axis=1)
        bclip = np.where(b_sent, wix, -big).max(axis=1)
        hgh = np.where(hit & (hgh >= aclip), aclip - 1, hgh)
        low = np.where(hit & (low <= bclip), bclip + 1, low)
    else:
        aclip = np.where(a_sent, wix, -big).max(axis=1)
        bclip = np.where(b_sent, wix, big).min(axis=1)
        low = np.where(hit & (low <= aclip), aclip + 1, low)
        hgh = np.where(hit & (hgh >= bclip), bclip - 1, hgh)

    V = np.where(in_band, c, BAR).astype(np.int32)
    Thi = np.where(in_band, np.uint32((1 << 28) - 1), np.uint32(0))
    Tlo = np.where(in_band, np.uint32(0xFFFFFFFF), np.uint32(0))
    M = np.where(in_band, np.int32(PATH_LEN), np.int32(0))

    st = (V, Thi, Tlo, M, kbase.astype(np.int32), low.astype(np.int32),
          hgh.astype(np.int32), besta, bestx, lasta, trima, trimx, trimd,
          trim_wave, trim_slot, more, np.zeros(N, bool),
          np.zeros(N, np.int32))
    return st, kbase.astype(np.int32)


_PAGES_CACHE = []   # [(pool, page-groups)] shared across engines


class WaveEngine:
    """Host orchestrator: compiles the wave-0/chunk steppers per direction
    and runs batches to completion, collecting choice logs for replay."""

    def __init__(self, spec: AlignSpec, cfg: WaveConfig = WaveConfig()):
        import os

        import jax
        import jax.numpy as jnp
        self.spec = spec
        self.cfg = cfg
        self._pool_np = None
        self._warm_evt = None   # set while a background warmup is running
        self._chunk_pred = {}   # batch fingerprint -> chunks-to-death
        self.n_chunk_calls = 0  # dispatched chunk programs (occupancy)
        # the Pallas in-VMEM kernel is the TPU path; the XLA graph stepper
        # remains as the CPU/fallback implementation
        mode = os.environ.get("FASTGA_TPU_WAVE", "auto")
        on_tpu = jax.devices()[0].platform == "tpu"
        self._pallas = mode == "pallas" or (mode == "auto" and on_tpu)
        self._interp = not on_tpu
        if self._pallas:
            from . import wave_pallas
            self.fwd_chunk = wave_pallas.build_chunk_pallas(
                cfg, spec.ave_path, spec.mscore, spec.dscore, +1,
                interpret=not on_tpu)
            self.rev_chunk = wave_pallas.build_chunk_pallas(
                cfg, spec.ave_path, spec.mscore, spec.dscore, -1,
                interpret=not on_tpu)
        else:
            self.fwd_chunk, _ = build_forward_chunk(
                cfg, spec.ave_path, np.asarray(spec.table),
                np.asarray(spec.score), +1)
            self.rev_chunk, _ = build_forward_chunk(
                cfg, spec.ave_path, np.asarray(spec.table),
                np.asarray(spec.score), -1)

    def begin_warmup(self, pool_len: int):
        """Start a background warmup; run() blocks on it before its
        first chunk call.  Serializing all pallas traces here matters:
        concurrent tracing of the same kernels perturbs Mosaic kernel
        naming, which changes the persistent-cache key and forces a cold
        remote compile every run."""
        import threading
        evt = threading.Event()
        self._warm_evt = evt
        self._warm_exc = None

        def _go():
            try:
                self.warmup(pool_len)
            except Exception as e:   # surfaced by run() after the wait
                self._warm_exc = e
            finally:
                evt.set()

        threading.Thread(target=_go, daemon=True).start()

    def warmup(self, pool_len: int):
        """Compile/load the chunk executables for a ``pool_len``-word
        pool (call from a background thread to overlap the one-time
        per-process executable load with host-side seeding work)."""
        import jax
        import jax.numpy as jnp
        cfg = self.cfg
        pool = self._chunk_pool(jnp.zeros(pool_len, jnp.uint32))
        z = jnp.zeros((cfg.n,), jnp.int32)
        znw = jnp.zeros((cfg.n, cfg.w), jnp.int32)
        znwu = jnp.zeros((cfg.n, cfg.w), jnp.uint32)
        st = ((znw, znwu, znwu, znw) + tuple(z for _ in range(11))
              + (z > 1, z > 1, z))
        targs = tuple(z for _ in range(6))
        for chunk in (self.fwd_chunk, self.rev_chunk):
            st2, chlog, bandlog = chunk(pool, targs, st)
            jax.block_until_ready(self._backtrack_fn(1)(
                [chlog], [bandlog], st2))
        if self._pallas and os.environ.get(
                "FASTGA_TPU_WAVE_FUSED", "0") == "1":
            for d in (+1, -1):
                jax.block_until_ready(
                    self._fused_fn(d)(pool, targs, st)[0])

    def _fused_fn(self, direction: int):
        """Single-dispatch runner: the whole chunk loop as a device
        lax.while_loop with the backtrack walk fused behind it.

        The chunked host loop costs ~2-3 blocking tunnel round trips per
        engine.run (aliveness polls + the backtrack fetch); over a remote
        TPU at ~180 ms RTT that latency dominates the wave phase.  Here
        chunks write their choice/kbase logs into a [KMAX, CW, N, W]
        device ring, the loop condition reads aliveness on device, and
        the packed result (fields + path deltas) is the ONLY transfer.
        Tubes still alive after KMAX chunks are resumed by the classic
        chunked loop from the returned state (rare; the returned log
        buffers seed its backtrack).  FASTGA_TPU_WAVE_KMAX overrides the
        chunk budget (new values pay one cold compile)."""
        key = ("fused", direction)
        fn = getattr(self, "_fused_cache", None)
        if fn is None:
            self._fused_cache = {}
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp
        from . import wave_pallas

        cfg = self.cfg
        CW, N, W = cfg.chunk, cfg.n, cfg.w
        KMAX = int(os.environ.get("FASTGA_TPU_WAVE_KMAX", "32"))
        KMAX = max(1, min(KMAX, cfg.max_chunks))
        G = KMAX * CW
        chunk = self.fwd_chunk if direction > 0 else self.rev_chunk
        walk = wave_pallas.build_backtrack_walk(
            cfg, G, interpret=self._interp) if G % 8 == 0 else None
        assert walk is not None

        def fused(pool, targs, st):
            logbuf = jnp.zeros((KMAX, CW, N, W), jnp.uint8)
            kbbuf = jnp.zeros((KMAX, CW, N), jnp.int32)

            def cond(c):
                st, lb, kb, k = c
                return st[15].any() & (k < KMAX)

            def body(c):
                st, lb, kb, k = c
                st2, chlog, bandlog = chunk(pool, targs, st)
                lb = jax.lax.dynamic_update_slice(
                    lb, chlog[None], (k, 0, 0, 0))
                kb = jax.lax.dynamic_update_slice(
                    kb, bandlog[:, :, 2][None], (k, 0, 0))
                return st2, lb, kb, k + 1

            st, lb, kb, k = jax.lax.while_loop(
                cond, body, (st, logbuf, kbbuf, jnp.int32(0)))
            ch = lb.reshape(G, N, W)
            kbf = kb.reshape(G, N)
            d0, Ds = walk(jnp.transpose(ch, (0, 2, 1)), kbf,
                          st[14], st[13])
            D = jnp.concatenate([d0[None], Ds], axis=0)
            delta = (D[1:] - D[:-1] + 1).astype(jnp.uint32)
            KP = G // 16
            sh = (2 * jnp.arange(16, dtype=jnp.uint32))[:, None]
            packed = (delta.reshape(KP, 16, N) << sh[None]).sum(
                axis=1, dtype=jnp.uint32)
            fields = jnp.stack(
                [st[10], st[11], st[12], st[13], st[14],
                 st[15].astype(jnp.int32), st[16].astype(jnp.int32),
                 st[17]])
            out = jnp.concatenate(
                [fields, d0[None],
                 jax.lax.bitcast_convert_type(packed, jnp.int32)],
                axis=0)
            return out, st, lb, kb

        fn = jax.jit(fused)
        self._fused_cache[key] = fn
        return fn

    def _chunk_pool(self, pool):
        """Kernel-ready pool operand: for the Pallas path, the prebuilt
        overlapping page-group array (cached per pool object — building
        it is a 2x-pool HBM copy that once dominated per-chunk cost).

        Page groups are zero-padded up to power-of-two tiers so the
        kernel programs see a FIXED pool shape per tier: without this,
        every distinct pool bucket changes the pallas operand shape and
        forces a cold Mosaic recompile of every kernel (the dominant
        cold-start cost across workload sizes)."""
        if not self._pallas:
            return pool
        if pool.ndim == 3:
            return pool        # already page groups
        for p, pg in _PAGES_CACHE:
            if p is pool:
                return pg
        import jax
        import jax.numpy as jnp
        from . import wave_pallas
        fns = getattr(self, "_pages_fns", None)
        if fns is None:
            fns = self._pages_fns = {}

        def build_padded(p, ng):
            pages = wave_pallas.build_pool_pages(jnp, p)
            pad = ng - pages.shape[0]
            if pad > 0:
                pages = jnp.concatenate(
                    [pages, jnp.zeros((pad,) + pages.shape[1:],
                                      pages.dtype)], axis=0)
            return pages

        m = pool.shape[0] // wave_pallas.PGS
        raw_ng = -(-(m - 1 + 7) // 8) if m > 1 else 1
        ng = max(256, 1 << (raw_ng - 1).bit_length())   # pow2 tiers
        key = (pool.shape[0], ng)
        fn = fns.get(key)
        if fn is None:
            fn = fns[key] = jax.jit(lambda p: build_padded(p, ng))
        pages = fn(pool)
        _PAGES_CACHE.append((pool, pages))
        del _PAGES_CACHE[:-2]   # keep the two most recent pools
        return pages

    def _pool_host(self, pool):
        """Host copy of the device pool, cached per pool object (a strong
        reference to the pool is kept so id() cannot be reused by a new
        object while the cache entry lives)."""
        if self._pool_np is None or self._pool_np[0] is not pool:
            self._pool_np = (pool, np.asarray(pool))
        return self._pool_np[1]

    def _backtrack_fn(self, k: int):
        """Device path-walk over k chunks of logs: from each tube's trim
        point, follow the per-wave predecessor choices back to wave 0 and
        emit the path diagonal per wave.  Replaces the host choice walk
        and shrinks the per-run transfer from ~2 MB/chunk of packed
        choices to one [waves+1, N] diagonal array."""
        key = ("bt", k)
        fn = getattr(self, "_bt_cache", None)
        if fn is None:
            self._bt_cache = {}
        fn = self._bt_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp
        CW, N, W = self.cfg.chunk, self.cfg.n, self.cfg.w

        G = k * CW
        walk = None
        if self._pallas and G % 8 == 0:
            from . import wave_pallas
            walk = wave_pallas.build_backtrack_walk(
                self.cfg, G, interpret=self._interp)

        def bt(chs, bls, st):
            trim_diag, trim_wave = st[14], st[13]
            ch = jnp.concatenate(chs, axis=0)        # [k*CW, N, W]
            # bls entries: [CW, N, 4] band logs (chunked path) or bare
            # [CW, N] kbase rows (fused-resume path)
            kb = jnp.concatenate(
                [b[:, :, 2] if b.ndim == 3 else b for b in bls], axis=0)

            if walk is not None:
                # in-VMEM pallas walk over [G, W, N] logs (one transposed
                # HBM copy; the walk itself never touches HBM per wave)
                d0, Ds = walk(jnp.transpose(ch, (0, 2, 1)), kb,
                              trim_diag, trim_wave)
                D = jnp.concatenate([d0[None], Ds], axis=0)
                delta = (D[1:] - D[:-1] + 1).astype(jnp.uint32)
                KP = G // 16
                sh = (2 * jnp.arange(16, dtype=jnp.uint32))[:, None]
                packed = (delta.reshape(KP, 16, N) << sh[None]).sum(
                    axis=1, dtype=jnp.uint32)
            else:
                rows = jnp.arange(N)

                def body(diag, w):
                    wv = w + 1
                    active = wv <= trim_wave
                    slot = jnp.clip(diag - kb[w], 0, W - 1)
                    cc = ch[w, rows, slot]
                    nd = jnp.where(active & (cc == CH_LOW), diag - 1,
                                   jnp.where(active & (cc == CH_HIGH),
                                             diag + 1, diag))
                    return nd, diag                  # emit diag AT wave wv

                d0, Ds = jax.lax.scan(
                    body, trim_diag,
                    jnp.arange(G - 1, -1, -1, dtype=jnp.int32))
                D = jnp.concatenate([d0[None], jnp.flip(Ds, 0)], axis=0)
                # per-wave deltas are in {-1,0,1}: ship 2 bits each
                delta = (D[1:] - D[:-1] + 1).astype(jnp.uint32)  # [kCW, N]
                KP = G // 16
                sh = (2 * jnp.arange(16, dtype=jnp.uint32))[:, None]
                packed = (delta.reshape(KP, 16, N) << sh[None]).sum(
                    axis=1, dtype=jnp.uint32)
            # one transfer: result fields + wave-0 diagonal + deltas —
            # built in-jit so the host issues a single op per run
            fields = jnp.stack(
                [st[10], st[11], st[12], st[13], st[14],
                 st[15].astype(jnp.int32), st[16].astype(jnp.int32),
                 st[17]])
            return jnp.concatenate(
                [fields, d0[None],
                 jax.lax.bitcast_convert_type(packed, jnp.int32)],
                axis=0)

        fn = jax.jit(bt)
        self._bt_cache[key] = fn
        return fn

    # -- pipelined API: submit dispatches everything speculatively (no
    # polls); collect blocks on the packed result and handles the rare
    # under-predicted continuation.  Chunk-count predictions are exact
    # after the first batch (the packed result carries per-tube wave
    # counts), so steady state runs p o l l - f r e e: one async
    # host transfer per batch, overlapped with later batches' compute.

    def _unpack_fn(self):
        """One-upload state splitter: the submit path ships a single
        [N, 4W+20] int32 array (one tunnel transfer instead of ~24) and
        splits it into the state/targs tuples on device."""
        fn = getattr(self, "_unpack_cache", None)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp
        W = self.cfg.w

        def up(big):
            V = big[:, :W]
            Thi = jax.lax.bitcast_convert_type(big[:, W:2 * W],
                                               jnp.uint32)
            Tlo = jax.lax.bitcast_convert_type(big[:, 2 * W:3 * W],
                                               jnp.uint32)
            M = big[:, 3 * W:4 * W]
            s = [big[:, 4 * W + j] for j in range(20)]
            st = (V, Thi, Tlo, M) + tuple(s[:11]) + (s[11] > 0,
                                                     s[12] > 0, s[13])
            targs = tuple(s[14:20])
            return st, targs

        fn = jax.jit(up)
        self._unpack_cache = fn
        return fn

    def _prep(self, pool, tubes, direction, pack=False):
        """Common prologue: wave-0 init on host, state upload.  With
        ``pack`` the upload is a single packed array + device split."""
        import jax.numpy as jnp
        if self._warm_evt is not None:
            self._warm_evt.wait()
            if getattr(self, "_warm_exc", None) is not None:
                exc, self._warm_exc = self._warm_exc, None
                raise RuntimeError("wave engine warmup failed") from exc
        cfg = self.cfg
        n = len(tubes["aw"])
        assert n <= cfg.n

        def padn(x, fill=0):
            a = np.full(cfg.n, fill, dtype=np.int32)
            a[:n] = x
            return a

        targs_np = (padn(tubes["aw"]), padn(tubes["alen"], 1),
                    padn(tubes["bw"]), padn(tubes["blen"], 1),
                    padn(tubes.get("minp", np.full(n, -(1 << 30)))),
                    padn(tubes.get("maxp", np.full(n, 1 << 30))))
        from ..utils import prof
        with prof.span("wave.wave0"):
            st_np, kbase0 = host_wave0(
                self._pool_host(pool), targs_np, padn(tubes["dgmin"]),
                padn(tubes["dgmax"]), padn(tubes["anti"]), cfg, direction)
        alive0 = st_np[15].copy()
        alive0[n:] = False
        snap = os.environ.get("FASTGA_TPU_WAVE_SNAPSHOT")
        if snap and direction > 0 and not globals().get("_SNAPPED") \
                and n == cfg.n:   # full main-engine batch only
            globals()["_SNAPPED"] = True
            full_st = st_np[:15] + (alive0,) + st_np[16:]
            np.savez(snap, pool=self._pool_host(pool), n=n,
                     **{f"targ{i}": t for i, t in enumerate(targs_np)},
                     **{f"st{i}": np.asarray(s)
                        for i, s in enumerate(full_st)})
        with prof.span("wave.upload"):
            if pack:
                N, W = cfg.n, cfg.w
                big = np.empty((N, 4 * W + 20), np.int32)
                big[:, :W] = st_np[0]
                big[:, W:2 * W] = st_np[1].view(np.int32)
                big[:, 2 * W:3 * W] = st_np[2].view(np.int32)
                big[:, 3 * W:4 * W] = st_np[3]
                for j in range(11):
                    big[:, 4 * W + j] = st_np[4 + j]
                big[:, 4 * W + 11] = alive0
                big[:, 4 * W + 12] = st_np[16]
                big[:, 4 * W + 13] = st_np[17]
                for j, t in enumerate(targs_np):
                    big[:, 4 * W + 14 + j] = t
                st, targs = self._unpack_fn()(jnp.asarray(big))
            else:
                st = tuple(jnp.asarray(a)
                           for a in (st_np[:15] + (alive0,)
                                     + st_np[16:]))
                targs = tuple(jnp.asarray(t) for t in targs_np)
        return n, st, targs, kbase0, bool(alive0.any())

    def _pkey(self, tubes, direction, n):
        return (direction, n,
                int(np.asarray(tubes["anti"], np.int64).sum()),
                int(np.asarray(tubes["aw"], np.int64).sum()),
                int(np.asarray(tubes["dgmin"], np.int64).sum()),
                int(np.asarray(tubes["dgmax"], np.int64).sum()),
                int(np.asarray(tubes["bw"], np.int64).sum()),
                int(np.asarray(tubes["blen"], np.int64).sum()))

    def _zero_log_pair(self, like_ch, like_bl):
        zkey = tuple(like_bl.shape)
        if getattr(self, "_zero_logs", None) is None:
            self._zero_logs = {}
        if zkey not in self._zero_logs:
            import jax.numpy as jnp
            self._zero_logs[zkey] = (jnp.zeros_like(like_ch),
                                     jnp.zeros_like(like_bl))
        return self._zero_logs[zkey]

    def _dispatch_backtrack(self, chs, bls, st):
        """Pad chunk logs to a pow2 count and dispatch the device walk;
        returns the packed result array (device)."""
        kpad = 1 << (len(chs) - 1).bit_length()
        z = self._zero_log_pair(chs[0], bls[0])
        chs = list(chs)
        bls = list(bls)
        while len(chs) < kpad:
            chs.append(z[0])
            bls.append(z[1])
        return self._backtrack_fn(kpad)(chs, bls, st)

    def submit(self, pool, tubes: dict, direction: int,
               pred_hint: int = None):
        """Dispatch one batch fully async: wave-0 + predicted chunk
        count + backtrack walk + host copy.  No blocking transfers.
        Returns an opaque handle for collect().

        ``pred_hint``: caller's expected chunk count for this batch
        (e.g. from per-item wave hints, or the forward pass's measured
        wave counts for the reverse batch); overrides the fingerprint/
        default predictors.  Under-prediction costs a synchronous
        continuation, so callers should bias up."""
        import threading

        from ..utils import prof
        cfg = self.cfg
        n, st, targs, kbase0, any_alive = self._prep(pool, tubes,
                                                     direction,
                                                     pack=True)
        chunk = self.fwd_chunk if direction > 0 else self.rev_chunk
        cpool = self._chunk_pool(pool)
        pkey = self._pkey(tubes, direction, n)
        pred = self._chunk_pred.get(pkey)
        if pred is None:
            if pred_hint is not None:
                pred = pred_hint
            else:
                pred = getattr(self, "_pred_default",
                               {}).get(direction, 2)
        # speculative-burst cap: each dispatched chunk holds its choice
        # log (+ a transient bandlog output) in HBM until collect, and
        # the walk concatenates kpad of them — deep bursts with several
        # batches in flight exhaust HBM.  Rare longer batches finish via
        # collect's doubling continuation instead.
        cap = int(os.environ.get("FASTGA_TPU_PRED_CAP", "8"))
        pred = max(1, min(int(pred), cap, cfg.max_chunks))
        chs, bls = [], []
        h = dict(n=n, st=st, targs=targs, chs=chs, bls=bls,
                 kbase0=kbase0, packed_dev=None, pool=cpool,
                 direction=direction, pkey=pkey, fetcher=None)
        if any_alive:
            with prof.span("wave.chunk_dispatch"):
                for _ in range(pred):
                    st, chlog, bandlog = chunk(cpool, targs, st)
                    chs.append(chlog)
                    bls.append(bandlog)
            self.n_chunk_calls += len(chs)
            h["st"] = st
            with prof.span("wave.bt_dispatch"):
                packed_dev = self._dispatch_backtrack(chs, bls, st)
            h["packed_dev"] = packed_dev

            # the device->host transfer blocks for a tunnel round trip
            # on remote TPUs; a fetcher thread eats that latency while
            # the main thread keeps submitting/assembling other batches
            # (device_get releases the GIL)
            def _fetch():
                try:
                    h["packed_np"] = np.asarray(packed_dev)
                except Exception as e:
                    h["fetch_exc"] = e

            t = threading.Thread(target=_fetch, daemon=True)
            t.start()
            h["fetcher"] = t
        return h

    # -- paired fwd+rev submission: the reverse pass chains behind the
    # forward walk ON DEVICE (seam diagonal never visits the host), so a
    # whole Local_Alignment batch costs ONE host fetch.  Requires the
    # Pallas path (device wave-0 init).

    def _init_fn(self, direction: int):
        key = ("init", direction)
        cache = getattr(self, "_initfn_cache", None)
        if cache is None:
            cache = self._initfn_cache = {}
        fn = cache.get(key)
        if fn is None:
            import jax

            from . import wave_pallas
            fn = jax.jit(wave_pallas.build_wave0_pallas(
                self.cfg, direction, interpret=self._interp))
            cache[key] = fn
        return fn

    def _unpack12_fn(self):
        fn = getattr(self, "_u12_cache", None)
        if fn is None:
            import jax
            fn = self._u12_cache = jax.jit(
                lambda big: tuple(big[:, j] for j in range(10)))
        return fn

    @property
    def supports_pair(self) -> bool:
        return self._pallas

    def _concat_fn(self):
        fn = getattr(self, "_cc_cache", None)
        if fn is None:
            import jax
            import jax.numpy as jnp
            fn = self._cc_cache = jax.jit(
                lambda a, b: jnp.concatenate([a, b], axis=0))
        return fn

    def _start_fetch(self, h, dev):
        import threading

        def _fetch():
            try:
                h["packed_np"] = np.asarray(dev)
            except Exception as e:
                h["fetch_exc"] = e

        t = threading.Thread(target=_fetch, daemon=True)
        t.start()
        h["fetcher"] = t

    def _run_chunks(self, chunk, cpool, targs, st, k):
        chs, bls = [], []
        for _ in range(k):
            st, chlog, bandlog = chunk(cpool, targs, st)
            chs.append(chlog)
            bls.append(bandlog)
        self.n_chunk_calls += k
        return st, chs, bls

    def _pair_prog(self, k: int, pages_shape):
        """ONE jitted program for a whole paired batch: fwd init + k
        chunks (lax.scan) + walk + rev init from the fwd seam + k chunks
        + walk -> a SINGLE packed [2*(9+G/16), N] int32 output.

        Motivation (measured on the remote-tunnel platform): each device
        call carries a ~3-10 ms runtime fixed cost and multi-output jits
        degrade unpredictably, so the classic per-chunk dispatch paid
        ~10 ms x ~15 calls per batch.  Here the whole batch is one
        program with one output; the fixed cost is paid once and the
        result crosses the tunnel once."""
        key = ("pairprog", k, tuple(pages_shape))
        cache = getattr(self, "_pairprog_cache", None)
        if cache is None:
            cache = self._pairprog_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp
        from . import wave_pallas
        cfg = self.cfg
        CW, N, W = cfg.chunk, cfg.n, cfg.w
        G = k * CW
        assert G % 8 == 0
        walk = wave_pallas.build_backtrack_walk(
            cfg, G, interpret=self._interp)
        walk_e = wave_pallas.build_backtrack_walk(
            cfg, G, interpret=self._interp, kb_embedded=True)
        init_f = wave_pallas.build_wave0_pallas(
            cfg, +1, interpret=self._interp)
        init_r = wave_pallas.build_wave0_pallas(
            cfg, -1, interpret=self._interp)
        spec = self.spec
        mega_f = wave_pallas.build_chunk_pallas(
            cfg, spec.ave_path, spec.mscore, spec.dscore, +1,
            interpret=self._interp, mega_k=k) if self._pallas else None
        mega_r = wave_pallas.build_chunk_pallas(
            cfg, spec.ave_path, spec.mscore, spec.dscore, -1,
            interpret=self._interp, mega_k=k) if self._pallas else None
        fwd_chunk, rev_chunk = self.fwd_chunk, self.rev_chunk
        sh16 = (2 * np.arange(16, dtype=np.uint32))[:, None]

        def run_dir(chunk, mega, cpool, targs, st):
            if mega is not None:
                # ONE early-exit pallas call for all G waves (dead
                # blocks stop; this platform charges a multi-ms fixed
                # cost per program execution); per-wave kbase rides in
                # the choice log's spare bits
                st, ch, _ = mega(cpool, targs, st)
                d0, Ds = walk_e(jnp.transpose(ch, (0, 2, 1)),
                                st[14], st[13])
            else:
                def body(st, _):
                    st2, chlog, bandlog = chunk(cpool, targs, st)
                    return st2, (chlog, bandlog[:, :, 2])

                st, (chs, kbs) = jax.lax.scan(body, st, None, length=k)
                ch = chs.reshape(G, N, W)
                kb = kbs.reshape(G, N)
                d0, Ds = walk(jnp.transpose(ch, (0, 2, 1)), kb,
                              st[14], st[13])
            D = jnp.concatenate([d0[None], Ds], axis=0)
            delta = (D[1:] - D[:-1] + 1).astype(jnp.uint32)
            packed = (delta.reshape(G // 16, 16, N)
                      << jnp.asarray(sh16)[None]).sum(
                axis=1, dtype=jnp.uint32)
            fields = jnp.stack(
                [st[10], st[11], st[12], st[13], st[14],
                 st[15].astype(jnp.int32), st[16].astype(jnp.int32),
                 st[17]])
            return jnp.concatenate(
                [fields, d0[None],
                 jax.lax.bitcast_convert_type(packed, jnp.int32)],
                axis=0)

        def prog(cpool, big):
            cols = tuple(big[:, j] for j in range(10))
            targs = cols[:6]
            dgmin, dgmax, anti, valid = cols[6:10]
            st_f = init_f(cpool, targs, dgmin, dgmax, anti, valid)
            pf = run_dir(fwd_chunk, mega_f, cpool, targs, st_f)
            seam = pf[8]
            st_r = init_r(cpool, targs, seam, seam, anti, valid)
            pr = run_dir(rev_chunk, mega_r, cpool, targs, st_r)
            return jnp.concatenate([pf, pr], axis=0)

        fn = jax.jit(prog)
        cache[key] = fn
        return fn

    @staticmethod
    def _pair_k_class(pred: int) -> int:
        """Round a chunk budget up to {4, 16, 64}: each class is a
        separately compiled (and persistently cached) program, and the
        mega kernel's per-block early exit makes generous budgets
        nearly free, so a tiny class set beats fine-grained ones."""
        p = max(1, pred)
        return 4 if p <= 4 else (16 if p <= 16 else 64)

    def _collect_pair_fused(self, h, wait: bool, requeue: bool):
        """collect_pair for fused single-program handles.  Stragglers
        are either marked for requeue (wide engine) or re-run from
        scratch with a doubled k class (total work <= 2x the final
        budget; rare).  Rows still alive at the class cap keep their
        fallback flag and are replayed exactly on the host."""
        from ..utils import prof
        cfg = self.cfg
        CW = cfg.chunk
        n = h["n"]
        kcap = min(int(os.environ.get(
            "FASTGA_TPU_PAIR_FUSED_MAX",
            "16" if cfg.n > 128 else "64")), cfg.max_chunks)
        while True:
            with prof.span("wave.collect_fetch"):
                if h["fetcher"] is not None:
                    h["fetcher"].join()
                if "fetch_exc" in h:
                    raise h["fetch_exc"]
                packed = h.get("packed_np")
                if packed is None:
                    raise RuntimeError(
                        "fused pair handle lost its fetch: keys="
                        + ",".join(sorted(map(str, h))))
            pf = packed[:h["rows_f"]]
            pr = packed[h["rows_f"]:]
            alive = (pf[5][:n] != 0) | (pr[5][:n] != 0)
            if not alive.any():
                break
            if requeue:
                h["requeue"] = alive.copy()
                break
            k2 = h["k"] * 4
            if k2 > kcap:
                # beyond the fused class cap: chain to the classic
                # incremental path (re-runs from scratch once, then
                # extends chunk-by-chunk up to cfg.max_chunks) instead
                # of stranding tubes on the scalar host fallback
                h2 = self.submit_pair(
                    h["cpool"], h["tubes"],
                    pred_hint=min(k2, cfg.max_chunks),
                    pred_cap=cfg.max_chunks, force_classic=True)
                h["chain"] = h2
                if not wait:
                    prof.count("wave.pair_continuations")
                    return None
                return self.collect_pair(h2, wait=True)
            with prof.span("wave.pair_extend"):
                out = self._pair_prog(k2, h["cpool"].shape)(
                    h["cpool"], h["big"])
                self.n_chunk_calls += 2 * k2
                h["k"] = k2
                h["rows_f"] = 9 + (k2 * CW) // 16
                h["packed_dev"] = out
                self._start_fetch(h, out)
            if not wait:
                prof.count("wave.pair_continuations")
                return None
        req = h.get("requeue")
        if req is not None and n:
            fin = ~req
            nwf = pf[7][:n][fin]
            nwr = pr[7][:n][fin]
            mx = max(int(nwf.max()) if nwf.size else 1,
                     int(nwr.max()) if nwr.size else 1)
        else:
            mx = max(int(pf[7][:n].max()) if n else 1,
                     int(pr[7][:n].max()) if n else 1)
        need = max(1, int(-(-mx // CW)))
        prof.count("wave.pair_pred_chunks", 2 * h["k"])
        prof.count("wave.pair_need_chunks", need * 2)
        if len(self._chunk_pred) > 4096:
            self._chunk_pred.clear()
        self._chunk_pred[h["pkey"]] = need
        dflt = getattr(self, "_pred_default", None)
        if dflt is None:
            dflt = self._pred_default = {}
        dflt[+2] = max(need, dflt.get(+2, 2))
        kb0 = h["kbase0"]
        return (self._unpack_result(pf, n, kb0),
                self._unpack_result(pr, n, np.zeros_like(kb0)))

    def submit_pair(self, pool, tubes: dict, pred_hint: int = None,
                    pred_cap: int = None, force_classic: bool = False):
        """Dispatch forward AND reverse passes of one batch, fully on
        device: packed upload -> fwd init -> fwd chunks -> fwd walk ->
        rev init from the walk's seam row -> rev chunks -> rev walk ->
        one concatenated result fetch."""
        from ..utils import prof
        if self._warm_evt is not None:
            self._warm_evt.wait()
            if getattr(self, "_warm_exc", None) is not None:
                exc, self._warm_exc = self._warm_exc, None
                raise RuntimeError("wave engine warmup failed") from exc
        import jax.numpy as jnp
        cfg = self.cfg
        n = len(tubes["aw"])
        assert n <= cfg.n

        def padn(x, fill=0):
            a = np.full(cfg.n, fill, dtype=np.int32)
            a[:n] = x
            return a

        with prof.span("wave.upload"):
            big = np.zeros((cfg.n, 10), np.int32)
            big[:, 0] = padn(tubes["aw"])
            big[:, 1] = padn(tubes["alen"], 1)
            big[:, 2] = padn(tubes["bw"])
            big[:, 3] = padn(tubes["blen"], 1)
            big[:, 4] = padn(tubes.get("minp",
                                       np.full(n, -(1 << 30))))
            big[:, 5] = padn(tubes.get("maxp", np.full(n, 1 << 30)))
            big[:, 6] = padn(tubes["dgmin"])
            big[:, 7] = padn(tubes["dgmax"])
            big[:, 8] = padn(tubes["anti"])
            big[:n, 9] = 1
            big_dev = jnp.asarray(big)
        cpool = self._chunk_pool(pool)
        kbase0 = (big[:, 6]
                  + ((big[:, 7] - big[:, 6]) >> 1) - cfg.w // 2)

        snap = os.environ.get("FASTGA_TPU_WAVE_SNAPSHOT")
        if snap and not globals().get("_SNAPPED") and n == cfg.n:
            # pair-mode twin of _prep's snapshot hook: capture the host
            # wave-0 state for tools/microbench_wave.py
            targs_np = tuple(big[:, j] for j in range(6))
            st_np, _ = host_wave0(
                self._pool_host(pool), targs_np, big[:, 6], big[:, 7],
                big[:, 8], cfg, +1)
            alive0 = st_np[15].copy()
            alive0[n:] = False
            globals()["_SNAPPED"] = True
            full_st = st_np[:15] + (alive0,) + st_np[16:]
            np.savez(snap, pool=self._pool_host(pool), n=n,
                     **{f"targ{i}": t for i, t in enumerate(targs_np)},
                     **{f"st{i}": np.asarray(s)
                        for i, s in enumerate(full_st)})
        pkey = self._pkey(tubes, +2, n)   # +2: pair-mode namespace
        pred = self._chunk_pred.get(pkey)
        if pred is None:
            pred = pred_hint if pred_hint is not None else \
                getattr(self, "_pred_default", {}).get(+2, 2)
        cap = pred_cap if pred_cap is not None else \
            int(os.environ.get("FASTGA_TPU_PRED_CAP", "8"))
        pred = max(1, min(int(pred), cap, cfg.max_chunks))

        kcap = int(os.environ.get(
            "FASTGA_TPU_PAIR_FUSED_MAX",
            "16" if cfg.n > 128 else "64"))
        k = self._pair_k_class(pred)
        if not force_classic and k <= min(kcap, cfg.max_chunks):
            # fused single-program path: one dispatch, one output
            with prof.span("wave.pair_dispatch"):
                out = self._pair_prog(k, cpool.shape)(cpool, big_dev)
            self.n_chunk_calls += 2 * k
            h = dict(pair=True, fused=True, n=n, k=k, tubes=tubes,
                     cpool=cpool, big=big_dev,
                     rows_f=9 + (k * cfg.chunk) // 16,
                     kbase0=kbase0, pkey=pkey, fetcher=None,
                     packed_dev=out)
            self._start_fetch(h, out)
            return h

        cols = self._unpack12_fn()(big_dev)
        targs = cols[:6]
        dgmin, dgmax, anti, valid = cols[6], cols[7], cols[8], cols[9]
        with prof.span("wave.pair_dispatch"):
            st_f = self._init_fn(+1)(cpool, targs, dgmin, dgmax, anti,
                                     valid)
            st_f, chs_f, bls_f = self._run_chunks(
                self.fwd_chunk, cpool, targs, st_f, pred)
            packed_f = self._dispatch_backtrack(chs_f, bls_f, st_f)
            seam = packed_f[8]
            st_r = self._init_fn(-1)(cpool, targs, seam, seam, anti,
                                     valid)
            st_r, chs_r, bls_r = self._run_chunks(
                self.rev_chunk, cpool, targs, st_r, pred)
            packed_r = self._dispatch_backtrack(chs_r, bls_r, st_r)
            both = self._concat_fn()(packed_f, packed_r)
        h = dict(pair=True, n=n, targs=targs, dgmin=dgmin, dgmax=dgmax,
                 anti=anti, valid=valid, cpool=cpool,
                 st_f=st_f, chs_f=chs_f, bls_f=bls_f,
                 st_r=st_r, chs_r=chs_r, bls_r=bls_r,
                 rows_f=int(packed_f.shape[0]), kbase0=kbase0,
                 pkey=pkey, fetcher=None, packed_dev=both)
        self._start_fetch(h, both)
        return h

    def _unpack_result(self, packed, n, kbase0):
        cfg = self.cfg
        d0h = packed[8]
        # rows beyond the batch's deepest trim wave are never read by
        # the replay; and int8->int32 mixed-dtype cumsum hits a numpy
        # slow path (~30 ms per batch at G=1536) — slice first, cumsum
        # in int32
        gneed = int(packed[3][:n].max()) + 1 if n else 1
        kp = min((gneed + 15) // 16, packed.shape[0] - 9)
        pk = packed[9:9 + kp].view(np.uint32)
        unsh = (2 * np.arange(16, dtype=np.uint32))
        deltas = ((pk[:, None, :] >> unsh[None, :, None]) & 3) \
            .reshape(-1, cfg.n).astype(np.int32)
        deltas -= 1
        diags = np.concatenate(
            [d0h[None], d0h[None] + np.cumsum(deltas, 0,
                                              dtype=np.int32)],
            axis=0)
        alive = packed[5] != 0
        fallback = (packed[6] != 0) | alive
        res = WaveResult(
            trima=packed[0][:n], trimx=packed[1][:n],
            trimd=packed[2][:n], trim_wave=packed[3][:n],
            trim_slot=packed[4][:n],
            kbase0=kbase0[:n],
            nwaves=packed[7][:n],
            fallback=fallback[:n],
            budget=alive[:n])
        return res, diags

    def collect_pair(self, h, wait: bool = False,
                     requeue: bool = False):
        """Finish a paired batch -> ((res_f, diags_f), (res_r,
        diags_r)); None (re-queue) when stragglers forced an extension
        and wait is False.

        ``requeue``: straggler decapitation — instead of extending the
        whole wide batch (a forward extension redoes the entire reverse
        pass, and one 10k-wave tube can drag 512 lanes through 100+
        chunks), mark still-alive tubes in h["requeue"] and return; the
        caller resubmits them on the narrow sibling engine."""
        from ..utils import prof
        cfg = self.cfg
        CW = cfg.chunk
        n = h["n"]
        while "chain" in h:   # over-budget fused handles chain to a
            h = h["chain"]    # fresh classic handle (fetcher threads
            # write into the dict they were started with, so the chain
            # is followed by reference, never by dict mutation)
        if h.get("fused"):
            return self._collect_pair_fused(h, wait, requeue)
        while True:
            with prof.span("wave.collect_fetch"):
                h["fetcher"].join()
                if "fetch_exc" in h:
                    raise h["fetch_exc"]
                packed = h["packed_np"]
            pf = packed[:h["rows_f"]]
            pr = packed[h["rows_f"]:]
            f_alive = bool(pf[5][:n].any())
            r_alive = bool(pr[5][:n].any())
            if not f_alive and not r_alive:
                break
            if len(h["chs_f"]) >= cfg.max_chunks \
                    and len(h["chs_r"]) >= cfg.max_chunks:
                break   # budget exhausted: rows flagged fallback
            if requeue:
                h["requeue"] = ((np.asarray(pf[5][:n]) != 0)
                                | (np.asarray(pr[5][:n]) != 0))
                break
            with prof.span("wave.pair_extend"):
                if f_alive and len(h["chs_f"]) < cfg.max_chunks:
                    # extend fwd, then REDO the whole reverse pass from
                    # the corrected seam
                    step = h["step"] = max(2, h.get("step",
                                                    len(h["chs_f"])))
                    st_f, chs2, bls2 = self._run_chunks(
                        self.fwd_chunk, h["cpool"], h["targs"],
                        h["st_f"],
                        min(step, cfg.max_chunks - len(h["chs_f"])))
                    h["st_f"] = st_f
                    h["chs_f"] += chs2
                    h["bls_f"] += bls2
                    h["step"] = step * 2
                    packed_f = self._dispatch_backtrack(
                        h["chs_f"], h["bls_f"], st_f)
                    seam = packed_f[8]
                    st_r = self._init_fn(-1)(
                        h["cpool"], h["targs"], seam, seam, h["anti"],
                        h["valid"])
                    st_r, chs_r, bls_r = self._run_chunks(
                        self.rev_chunk, h["cpool"], h["targs"], st_r,
                        max(1, len(h["chs_r"])))
                    h["st_r"], h["chs_r"], h["bls_r"] = (st_r, chs_r,
                                                         bls_r)
                    packed_r = self._dispatch_backtrack(chs_r, bls_r,
                                                        st_r)
                else:
                    # only the reverse pass lags: extend it
                    stepr = h["stepr"] = max(2, h.get("stepr",
                                                      len(h["chs_r"])))
                    st_r, chs2, bls2 = self._run_chunks(
                        self.rev_chunk, h["cpool"], h["targs"],
                        h["st_r"],
                        min(stepr, cfg.max_chunks - len(h["chs_r"])))
                    h["st_r"] = st_r
                    h["chs_r"] += chs2
                    h["bls_r"] += bls2
                    h["stepr"] = stepr * 2
                    packed_f = None
                    packed_r = self._dispatch_backtrack(
                        h["chs_r"], h["bls_r"], st_r)
                if packed_f is None:
                    import jax.numpy as jnp
                    packed_f = jnp.asarray(pf)
                both = self._concat_fn()(packed_f, packed_r)
                h["rows_f"] = int(packed_f.shape[0])
                h["packed_dev"] = both
                self._start_fetch(h, both)
            if not wait:
                prof.count("wave.pair_continuations")
                return None
        # predictions: exact per-shape need for the next identical
        # batch (requeued stragglers excluded — their counts saturate at
        # the budget); per-mode default drifts toward the straggler max
        req = h.get("requeue")
        if req is not None and n:
            fin = ~req
            nwf_f = pf[7][:n][fin]
            nwr_f = pr[7][:n][fin]
            mx = max(int(nwf_f.max()) if nwf_f.size else 1,
                     int(nwr_f.max()) if nwr_f.size else 1)
        else:
            mx = max(int(pf[7][:n].max()) if n else 1,
                     int(pr[7][:n].max()) if n else 1)
        need = max(1, int(-(-mx // CW)))
        prof.count("wave.pair_pred_chunks",
                   len(h["chs_f"]) + len(h["chs_r"]))
        prof.count("wave.pair_need_chunks", need * 2)
        _blog = os.environ.get("FASTGA_TPU_BATCH_LOG")
        if _blog and n:
            nwf = np.asarray(pf[7][:n])
            nwr = np.asarray(pr[7][:n])
            with open(_blog, "a") as f:
                f.write(f"n={n} chs_f={len(h['chs_f'])} "
                        f"chs_r={len(h['chs_r'])} "
                        f"nwf_max={int(nwf.max())} "
                        f"nwf_p50={int(np.median(nwf))} "
                        f"nwr_max={int(nwr.max())} "
                        f"nwr_p50={int(np.median(nwr))}\n")
        if len(self._chunk_pred) > 4096:
            self._chunk_pred.clear()
        self._chunk_pred[h["pkey"]] = need
        dflt = getattr(self, "_pred_default", None)
        if dflt is None:
            dflt = self._pred_default = {}
        # non-decreasing within a run: an under-prediction redoes
        # the whole reverse pass, a dead chunk is nearly free
        dflt[+2] = max(need, dflt.get(+2, 2))
        kb0 = h["kbase0"]
        return (self._unpack_result(pf, n, kb0),
                self._unpack_result(pr, n, np.zeros_like(kb0)))

    def collect(self, h, wait: bool = True):
        """Finish a submitted batch; returns (WaveResult, diags).

        With wait=False, an under-predicted batch (stragglers still
        alive after the speculative chunks) dispatches a doubled
        extension + fresh fetch and returns None — the caller re-queues
        the handle and keeps the pipeline moving instead of blocking."""
        import threading

        from ..utils import prof
        cfg = self.cfg
        CW = cfg.chunk
        n = h["n"]
        chunk = self.fwd_chunk if h["direction"] > 0 else self.rev_chunk
        st = h["st"]
        chs, bls = h["chs"], h["bls"]
        packed = None
        if h["packed_dev"] is not None:
            with prof.span("wave.collect_fetch"):
                if h["fetcher"] is not None:
                    h["fetcher"].join()
                    if "fetch_exc" in h:
                        raise h["fetch_exc"]
                    packed = h["packed_np"]
                else:
                    packed = np.asarray(h["packed_dev"])
            # under-predicted: extend with a doubled chunk budget so
            # stragglers finish in O(log) rounds
            while packed[5].any() and len(chs) < cfg.max_chunks:
                step = h["step"] = max(2, h.get("step", len(chs)))
                with prof.span("wave.chunk_dispatch"):
                    for _ in range(min(step,
                                       cfg.max_chunks - len(chs))):
                        st, chlog, bandlog = chunk(h["pool"], h["targs"],
                                                   st)
                        chs.append(chlog)
                        bls.append(bandlog)
                        self.n_chunk_calls += 1
                h["step"] = step * 2
                h["st"] = st
                packed_dev = self._dispatch_backtrack(chs, bls, st)
                h["packed_dev"] = packed_dev
                if not wait:
                    def _fetch():
                        try:
                            h["packed_np"] = np.asarray(packed_dev)
                        except Exception as e:
                            h["fetch_exc"] = e

                    t = threading.Thread(target=_fetch, daemon=True)
                    t.start()
                    h["fetcher"] = t
                    prof.count("wave.continuations")
                    return None
                with prof.span("wave.backtrack"):
                    packed = np.asarray(packed_dev)
            # exact prediction for the next batch of this shape: the
            # packed result carries per-tube wave-at-death counts
            need = max(1, int(-(-int(packed[7][:n].max()) // CW))) \
                if n else 1
            prof.count("wave.pred_chunks", len(chs))
            prof.count("wave.need_chunks", need)
            if len(self._chunk_pred) > 4096:
                self._chunk_pred.clear()
            self._chunk_pred[h["pkey"]] = need
            dflt = getattr(self, "_pred_default", None)
            if dflt is None:
                dflt = self._pred_default = {}
            prev = dflt.get(h["direction"], 2)
            # drift toward the observed need, biased upward (an under-
            # estimate costs a sync continuation; an overestimate only
            # wastes cheap mostly-dead chunks)
            dflt[h["direction"]] = max(need, prev - 1)
            d0h = packed[8]
            gneed = int(packed[3][:n].max()) + 1 if n else 1
            kp = min((gneed + 15) // 16, packed.shape[0] - 9)
            pk = packed[9:9 + kp].view(np.uint32)
            unsh = (2 * np.arange(16, dtype=np.uint32))
            deltas = ((pk[:, None, :] >> unsh[None, :, None]) & 3) \
                .reshape(-1, cfg.n).astype(np.int32)
            deltas -= 1
            diags = np.concatenate(
                [d0h[None],
                 d0h[None] + np.cumsum(deltas, 0, dtype=np.int32)],
                axis=0)
        else:
            import jax.numpy as jnp
            with prof.span("wave.result_xfer"):
                fields = jnp.stack(
                    [st[10], st[11], st[12], st[13], st[14],
                     st[15].astype(jnp.int32), st[16].astype(jnp.int32),
                     st[17]])
                packed = np.asarray(jnp.concatenate(
                    [fields, st[14][None]], axis=0))
            diags = packed[8:]
        alive = packed[5] != 0
        fallback = (packed[6] != 0) | alive
        res = WaveResult(
            trima=packed[0][:n], trimx=packed[1][:n],
            trimd=packed[2][:n], trim_wave=packed[3][:n],
            trim_slot=packed[4][:n],
            kbase0=h["kbase0"][:n],
            nwaves=packed[7][:n],
            fallback=fallback[:n],
            budget=alive[:n])
        return res, diags

    def run(self, pool, tubes: dict, direction: int, overlap=None):
        """tubes: dict of int32 [n<=N] arrays: aw, alen, bw, blen, dgmin,
        dgmax, anti, minp, maxp.  Returns (WaveResult, diags) where
        diags[w, tube] is the path diagonal at wave w.

        ``overlap``: optional callable invoked exactly once while the
        first speculative chunks occupy the device (host-side work —
        e.g. the previous pass's trace replays — rides the device
        window for free)."""
        import jax
        import jax.numpy as jnp
        # serialize against the background warmup BEFORE any jax work:
        # concurrent tracing perturbs lowered-module naming, changing the
        # persistent-cache key and forcing cold compiles
        if self._warm_evt is not None:
            self._warm_evt.wait()
            if getattr(self, "_warm_exc", None) is not None:
                exc, self._warm_exc = self._warm_exc, None
                raise RuntimeError("wave engine warmup failed") from exc
        cfg = self.cfg
        n = len(tubes["aw"])
        assert n <= cfg.n

        def padn(x, fill=0):
            a = np.full(cfg.n, fill, dtype=np.int32)
            a[:n] = x
            return a

        targs_np = (padn(tubes["aw"]), padn(tubes["alen"], 1),
                    padn(tubes["bw"]), padn(tubes["blen"], 1),
                    padn(tubes.get("minp", np.full(n, -(1 << 30)))),
                    padn(tubes.get("maxp", np.full(n, 1 << 30))))
        chunk = self.fwd_chunk if direction > 0 else self.rev_chunk
        cpool = self._chunk_pool(pool)
        # wave 0 runs on the host (a single wave; the jitted version cost
        # seconds per call and an uncacheable multi-minute TPU compile)
        from ..utils import prof
        with prof.span("wave.wave0"):
            st_np, kbase0 = host_wave0(
                self._pool_host(pool), targs_np, padn(tubes["dgmin"]),
                padn(tubes["dgmax"]), padn(tubes["anti"]), cfg, direction)
        # padding rows: deactivate
        alive0 = st_np[15].copy()
        alive0[n:] = False
        snap = os.environ.get("FASTGA_TPU_WAVE_SNAPSHOT")
        if snap and direction > 0 and not getattr(self, "_snapped", False):
            # capture real chunk inputs for tools/microbench_wave.py
            self._snapped = True
            full_st = st_np[:15] + (alive0,) + st_np[16:]
            np.savez(snap, pool=self._pool_host(pool), n=n,
                     **{f"targ{i}": t for i, t in enumerate(targs_np)},
                     **{f"st{i}": np.asarray(s)
                        for i, s in enumerate(full_st)})
        with prof.span("wave.upload"):
            st = tuple(jnp.asarray(a)
                       for a in (st_np[:15] + (alive0,) + st_np[16:]))
            targs = tuple(jnp.asarray(t) for t in targs_np)

        # pipelined chunk loop: chunks are dispatched (async) ahead of
        # the aliveness read; the aliveness bytes start their tunnel
        # crossing as soon as a chunk completes (async copy), so reads
        # overlap later chunks' compute.  A dead-state chunk is an
        # identity on every output field and its logs are inert in the
        # backtrack (masked by trim_wave), so we only POLL every
        # `spec_k` chunks: each poll costs a tunnel round trip
        # (~180 ms on the remote dev setup) while a wasted speculative
        # chunk costs ~30 ms of device compute.  FASTGA_TPU_WAVE_SPEC
        # tunes the depth (1 = poll every chunk).
        chs = []
        bls = []
        packed = None
        spec_k = max(1, int(os.environ.get("FASTGA_TPU_WAVE_SPEC", "4")))
        # Opt-in: one dispatch per direction (while_loop + in-device
        # walk, single fetch).  Measured on the remote-tunnel dev setup
        # the speculative chunked dispatch still wins (~0.5 s/run): the
        # host-queued chunk programs pipeline their DMA prologues across
        # program boundaries, which the while_loop serializes — and its
        # polls already overlap compute.  Kept for deployments that need
        # minimal host involvement per batch.
        use_fused = (self._pallas
                     and os.environ.get("FASTGA_TPU_WAVE_FUSED", "0")
                     == "1")

        def start_alive_copy(s):
            try:
                s[15].copy_to_host_async()
            except Exception:
                pass
        if bool(alive0.any()) and use_fused:
            # single dispatch: chunk while_loop + backtrack on device,
            # one blocking fetch.  Falls through to the chunked loop
            # only when tubes outlive the KMAX budget.
            with prof.span("wave.fused"):
                out, st2, lb, kb = self._fused_fn(direction)(
                    cpool, targs, st)
                if overlap is not None:
                    overlap()
                    overlap = None
                packed = np.asarray(out)
            if packed[5].any():
                st = st2
                K = lb.shape[0]
                chs = [lb[i] for i in range(K)]
                bls = [kb[i] for i in range(K)]
                packed = None
        if packed is None and bool(alive0.any()):
            # steady-state chunk-count prediction: repeated workloads
            # (serving the same pair, the bench's second run) die at the
            # same chunk as last time, so speculate straight to that
            # depth and poll ONCE — each poll costs a tunnel round trip
            # while a wasted speculative chunk is ~30 ms of device time
            pkey = (direction, n,
                    int(np.asarray(tubes["anti"], np.int64).sum()),
                    int(np.asarray(tubes["aw"], np.int64).sum()),
                    int(np.asarray(tubes["dgmin"], np.int64).sum()),
                    int(np.asarray(tubes["dgmax"], np.int64).sum()),
                    int(np.asarray(tubes["bw"], np.int64).sum()),
                    int(np.asarray(tubes["blen"], np.int64).sum()))
            pred = self._chunk_pred.get(pkey)

            def _poll_now(k, last):
                if last:
                    return True
                if pred is not None:
                    # one probe below pred lets a stale overestimate
                    # shrink by spec_k per run instead of ratcheting
                    if k == max(1, pred - spec_k):
                        return True
                    return k >= pred and (k - pred) % spec_k == 0
                return k % spec_k == 0
            remaining = cfg.max_chunks - len(chs)
            if remaining > 0 and (not chs
                                  or bool(np.asarray(st[15]).any())):
                with prof.span("wave.chunk_dispatch"):
                    st, chlog, bandlog = chunk(cpool, targs, st)
                start_alive_copy(st)
                chs.append(chlog)
                bls.append(bandlog)
                for ci in range(remaining - 1):
                    with prof.span("wave.chunk_dispatch"):
                        st2, chlog, bandlog = chunk(cpool, targs, st)
                    start_alive_copy(st2)
                    chs.append(chlog)
                    bls.append(bandlog)
                    if overlap is not None and len(chs) >= spec_k:
                        # the device has a queue to chew through: run
                        # the caller's host-side work under it
                        overlap()
                        overlap = None
                    if _poll_now(len(chs), ci == remaining - 2):
                        with prof.span("wave.alive_sync"):
                            # st is one chunk behind st2: the copy has
                            # been in flight since before st2's dispatch
                            any_alive = bool(np.asarray(st[15]).any())
                        if not any_alive:
                            # st2 (and up to spec_k-1 logged chunks) were
                            # speculative identities; the logs are inert
                            if len(self._chunk_pred) > 4096:
                                self._chunk_pred.clear()
                            self._chunk_pred[pkey] = len(chs)
                            break
                    st = st2

        if overlap is not None:
            overlap()   # dead batch / short loop: still exactly-once
            overlap = None

        self.n_chunk_calls += len(chs)
        if packed is None and chs:
            # pad the chunk count to a power of two so the backtrack
            # compiles for O(log) distinct shapes only (waves beyond a
            # tube's trim point are inactive in the walk); the zero pad
            # logs are allocated once per engine and aliased
            kpad = 1 << (len(chs) - 1).bit_length()
            zkey = tuple(bls[0].shape)
            if getattr(self, "_zero_logs", None) is None:
                self._zero_logs = {}
            if zkey not in self._zero_logs:
                self._zero_logs[zkey] = (jnp.zeros_like(chs[0]),
                                         jnp.zeros_like(bls[0]))
            while len(chs) < kpad:
                chs.append(self._zero_logs[zkey][0])
                bls.append(self._zero_logs[zkey][1])
            with prof.span("wave.backtrack"):
                packed = np.asarray(
                    self._backtrack_fn(kpad)(chs, bls, st))
        if packed is not None:
            d0h = packed[8]
            gneed = int(packed[3][:n].max()) + 1 if n else 1
            kp = min((gneed + 15) // 16, packed.shape[0] - 9)
            pk = packed[9:9 + kp].view(np.uint32)
            unsh = (2 * np.arange(16, dtype=np.uint32))
            deltas = ((pk[:, None, :] >> unsh[None, :, None]) & 3) \
                .reshape(-1, cfg.n).astype(np.int32)
            deltas -= 1
            diags = np.concatenate(
                [d0h[None],
                 d0h[None] + np.cumsum(deltas, 0, dtype=np.int32)],
                axis=0)
        else:
            with prof.span("wave.result_xfer"):
                fields = jnp.stack(
                    [st[10], st[11], st[12], st[13], st[14],
                     st[15].astype(jnp.int32), st[16].astype(jnp.int32),
                     st[17]])
                packed = np.asarray(jnp.concatenate(
                    [fields, st[14][None]], axis=0))
            diags = packed[8:]                  # all trimmed at wave 0
        alive = packed[5] != 0
        fallback = (packed[6] != 0) | alive   # budget exceeded
        if (os.environ.get("FASTGA_WAVE_DEBUG") and chs
                and np.asarray(bls[0]).ndim == 3):
            # band-width stats need low/hgh logs — chunked path only
            # (the fused path keeps just the kbase row for the walk)
            import sys
            wmax, w95 = 0, []
            for b in bls:
                bh = np.asarray(b)                  # [CW, N, 4]
                w = (bh[:, :n, 1] - bh[:, :n, 0]).max(axis=0)
                wmax = max(wmax, int(w.max()))
                w95.append(w)
            w95 = int(np.percentile(np.concatenate(w95), 95))
            sys.stderr.write(
                f"wave dbg: dir={direction} n={n} chunks={len(chs)} "
                f"bandwidth max={wmax} p95={w95}\n")
        res = WaveResult(
            trima=packed[0][:n], trimx=packed[1][:n],
            trimd=packed[2][:n], trim_wave=packed[3][:n],
            trim_slot=packed[4][:n],
            kbase0=kbase0[:n],
            nwaves=packed[7][:n],
            fallback=fallback[:n],
            budget=alive[:n])
        return res, diags
