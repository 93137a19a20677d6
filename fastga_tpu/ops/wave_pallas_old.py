"""Pallas TPU wave kernel: the O(nd) wavefront recurrence in VMEM.

The XLA graph version (ops/wave.py) materializes every [N, W] intermediate
to HBM — ~67 MB of traffic per wave.  This kernel runs a whole chunk of
waves per pallas_call with all state resident in VMEM/registers:

- grid over tube blocks (BT=32 tubes per program instance, W lanes);
- per-tube sequence windows staged in VMEM by DMA from the packed pool in
  HBM, refilled when the wavefront escapes them;
- per-lane sequence fetch via a fully batched strip select (TPUs have no
  per-lane gather): a per-tube 64-word strip tracks the active lanes'
  word span (refreshed by a rare gated row pick + lane roll), and the
  per-lane extraction is a compare/select sweep over the strip columns
  batched over all tubes — ~9x cheaper than per-tube one-hot MXU
  contractions and far smaller Mosaic IR;
- the suffix-positive trim test computed arithmetically from the match
  bit-vectors (30 fused VPU steps) instead of the reference's 2^15-entry
  tables;
- cummax via log-step shift-max doubling; band recentering via
  pltpu.roll with per-tube dynamic shifts (gated on band drift).

Semantics are identical to ops/wave.py (same state tuple, same logs, same
trim/prune rules); tests compare the two step for step.
"""

from __future__ import annotations

import numpy as np

from .wave import CH_DIAG, CH_HIGH, CH_LOW, CH_NONE, WaveConfig
from .wave_ref import PATH_LEN, TRIM_LEN, TRIM_MLAG, WAVE_LAG

BT = 32         # tubes per program (i1 native sublane tile)
PGS = 512       # pool page stride in words
PGS_LOG = 9
PGW = 1024      # page size: pages overlap 50% so any <=512-word span fits
                # entirely in page (start_word >> 9); pages are grouped 8
                # to a [8, PGW] tile so HBM DMA slices are tile-aligned
SW = PGW - 8    # refill when an active lane's word index passes this
JW = 64         # per-tube strip words for the batched lane select: a
                # wave's active lanes span <= (WAVE_LAG + W)/2 bases
                # (~11 words at W=256), so a 64-word strip leaves ~50
                # words of drift headroom between per-tube refreshes

NSC = 16        # scalar-state columns (padded to a nice width)
(SC_KBASE, SC_LOW, SC_HGH, SC_BESTA, SC_BESTX, SC_LASTA, SC_TRIMA,
 SC_TRIMX, SC_TRIMD, SC_TRIMW, SC_TRIMS, SC_ALIVE, SC_FALL, SC_DIF) = range(14)


def build_pool_pages(jnp, pool):
    """Overlapping page groups [NG, 8, PGW]: page p = words[p*PGS :
    p*PGS+PGW] (pure reshape/concat — no gather).  The pool is extended
    by one zero page stride so the LAST page exists with correct
    content: the anchor-page choice is p = word >> 9, and for words in
    the pool's final PGS span that page extends past the pool end —
    an edge-replica pad there returns data off by PGS words (latent
    fetch corruption whenever a sequence ends within the last PGS
    words of its bucket).  Zero tails are only reachable beyond the
    sentinel-clipped sequence ends.  Costs a 2x-pool-size HBM copy —
    build once per pool and reuse."""
    m = pool.shape[0] // PGS
    r = pool.reshape(m, PGS)
    rz = jnp.concatenate(
        [r, jnp.zeros((1, PGS), pool.dtype)], axis=0)        # [m+1, PGS]
    pages = jnp.concatenate([rz[:-1], rz[1:]], axis=1)       # [m, PGW]
    npad = (-m) % 8
    if npad:
        pages = jnp.concatenate(
            [pages, jnp.repeat(pages[-1:], npad, axis=0)], axis=0)
    return pages.reshape(-1, 8, PGW)


def build_chunk_pallas(cfg: WaveConfig, path_ave: int, mscore: int,
                       dscore: int, direction: int = +1,
                       interpret: bool = False, ablate: tuple = (),
                       mega_k: int = 0):
    """Compile the in-VMEM chunk stepper.

    Returns fn(pool_words_u32, targs, state) -> (state2, chlog, bandlog)
    with the state-tuple layout of ops/wave.build_forward_chunk.

    ``mega_k`` > 0 selects MEGA mode: ONE pallas call runs up to
    mega_k*chunk waves with a per-block early-exit while loop; choice
    logs stage in VMEM and DMA-flush to an HBM output every ``chunk``
    waves (this platform charges a multi-ms fixed cost per program
    execution, so per-chunk dispatch dominated the wave phase).  The
    adapter then returns (state2, chlog [G, N, W] u8, kb [G, N] i32)
    — dead waves beyond a block's exit are unwritten/garbage and are
    masked by trim_wave in the backtrack walk.

    ``ablate`` (perf attribution only — results are WRONG): any of
    'nosnake' (skip the snake loop), 'nofetch' (snake without sequence
    fetch, one iteration), 'notrim' (trim test constant-true), 'nored'
    (skip the suffix/prefix band scans), 'norecenter'.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, W, CW = cfg.n, cfg.w, cfg.chunk
    # fetch sweep positions per round: the active lanes of one wave span
    # <= (WAVE_LAG + W)/2 bases (~12 words at W=256), so a 16-position
    # select sweep replaces the 60-position one (the sweep is the wave
    # body's dominant VPU cost: positions x 5 words x 2 sequences
    # selects per snake step); wider bands pay a second refresh round
    import os as _os
    FP = int(_os.environ.get("FASTGA_TPU_FETCH_SWEEP",
                             "16" if W <= 256 else "32"))
    MEGA = mega_k > 0
    G = CW * mega_k if MEGA else CW
    _abl = frozenset(ablate)
    assert N % BT == 0
    NB = N // BT
    fwd = direction > 0
    BARv = -1 if fwd else 0x7FFFFFFF
    PA = path_ave

    def kernel(aw_r, alen_r, bw_r, blen_r, minp_r, maxp_r,
               V_r, Thi_r, Tlo_r, M_r, sc_r,
               pool_r,
               Vo_r, Thio_r, Tloo_r, Mo_r, sco_r, chlog_r, bandlog_r,
               awin_r, bwin_r, astr_r, bstr_r, chstg_r, sem_r):
        BAR = jnp.int32(BARv)
        blk_i = pl.program_id(0)   # hoisted: program_id is not
        # lowerable inside traced control flow in interpret mode

        def log_rows(wi, choice, bandcols):
            """Per-wave log emission.  Classic: direct VMEM block
            writes.  MEGA: the choice row stages in VMEM and flushes to
            the HBM log by DMA every CW waves (+ a final flush after the
            loop); the band log carries only the kbase row."""
            if "nolog" in _abl:   # loop-floor probe (backtrack WRONG)
                return
            if not MEGA:
                chlog_r[pl.ds(wi, 1)] = choice[None]
                bandlog_r[pl.ds(wi, 1)] = bandcols[None]
                return
            rem = jax.lax.rem(wi, CW)
            # kbase rides in the spare high bits of the choice row:
            # choice needs 2 bits, so lanes l < 16 carry kbase bits
            # (2l, 2l+1) in bits (2, 3) — the walk reassembles them
            # (dynamic lane-offset stores for a separate kb log are
            # not lowerable on TPU)
            kb_u = bandcols[:, 2:3].astype(jnp.uint32)
            sh2 = (2 * wix).astype(jnp.uint32)
            kbbits = jnp.where(wix < 16, (kb_u >> sh2) & jnp.uint32(3),
                               jnp.uint32(0))
            chstg_r[pl.ds(rem, 1)] = (
                choice | (kbbits << jnp.uint32(2)).astype(jnp.uint8)
            )[None]

            @pl.when(rem == CW - 1)
            def _():
                dma = pltpu.make_async_copy(
                    chstg_r,
                    chlog_r.at[pl.ds(wi - (CW - 1), CW),
                               pl.ds(blk_i * BT, BT)],
                    sem_r.at[2])
                dma.start()
                dma.wait()
        NP = pool_r.shape[0] * 8          # pages (incl. edge-replica pads)
        wix = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
        big = jnp.int32(1 << 30)

        def shl(A, sh, fill):
            """out[i] = A[i+sh] with fill on the high end (lane shift via
            roll; sliced concats trip Mosaic's offset checks)."""
            r = pltpu.roll(A, W - sh, 1)   # roll requires shift >= 0
            return jnp.where(wix < W - sh, r, fill)

        def shr(A, sh, fill):
            """out[i] = A[i-sh] with fill on the low end."""
            r = pltpu.roll(A, sh, 1)
            return jnp.where(wix >= sh, r, fill)

        alen = alen_r[:, :]
        blen = blen_r[:, :]
        minp = minp_r[:, :]
        maxp = maxp_r[:, :]


        def refill(win_r, base, woff_r, iw, act, slot):
            """Stage windows so active lanes' word indices fall inside;
            per-tube DMA refill when they do not.  ``base`` is a [BT, 1]
            value carried through the loops (windows are per-call scratch,
            so bases never outlive a pallas_call)."""
            loc = iw - base
            bad = act & ((loc < 0) | (loc >= SW))
            anybad = bad.astype(jnp.int32).max(axis=1)[:, None]  # [BT,1]
            iww = jnp.where(act, iw, big)
            want = iww.min(axis=1)[:, None] - 8                  # [BT,1]
            pgw = jnp.clip(woff_r[:, :] + want, 0, NP * PGS - 1)
            page = pgw >> PGS_LOG                                # [BT,1]
            newbase = jnp.where(anybad > 0, page * PGS - woff_r[:, :], base)

            @pl.when(anybad.max() > 0)   # skip all BT branch tests when
            def _():                     # no tube needs a refill (common)
                for t in range(BT):
                    @pl.when(anybad[t, 0] > 0)
                    def _():
                        dma = pltpu.make_async_copy(
                            pool_r.at[page[t, 0] >> 3],
                            win_r.at[t], sem_r.at[slot])
                        dma.start()
                        dma.wait()
            return newbase

        def fetchw(win_r, str_r, base, sb_, woff_r, iw, sh, act):
            """words iw..iw+4 per lane via batched strip selects.

            ``str_r`` [BT, JW] caches pool words [sb, sb+JW) per tube.
            Active lanes usually cluster within a few words of the band
            head, but STALE interior lanes (V far behind best — tandem
            bands) can lag arbitrarily, so the select loops windows over
            the remaining lanes: each round refreshes the strip to the
            minimum unfetched word (per-tube gated row pick + lane roll)
            and gathers every lane that fits; common case is ONE round.
            Lanes still unfetched after RMAX rounds flag the overflow
            guard (host replays those tubes exactly).
            Returns (4 funnel-shifted u32 words [BT, W], new sb [BT,1],
            overflow guard [BT, W])."""
            RMAX = 16
            subl = ((base + woff_r[:, :]) >> PGS_LOG) & 7        # [BT,1]
            z32 = jnp.zeros((BT, W), jnp.uint32)

            def fcond(c):
                return (c[0].max() > 0) & (c[7] < RMAX)

            def make_body(P):
                # one select round over P strip positions: refresh stale
                # per-tube strips to the min unfetched word, then gather
                # every lane whose word falls inside the window
                def fbody(c):
                    rem_i, w0, w1, w2, w3, w4, sb, it = c
                    rem = rem_i > 0
                    m0 = jnp.where(rem, iw, big).min(axis=1)[:, None]
                    need = rem.astype(jnp.int32).max(
                        axis=1)[:, None] > 0
                    stale = need & ((m0 < sb) | (m0 > sb + (P - 1)))
                    sb2 = jnp.where(
                        stale,
                        jnp.clip(m0 - 2 - base, 0, PGW - JW) + base,
                        sb)
                    off = sb2 - base
                    stale_i = stale.astype(jnp.int32)

                    @pl.when(stale_i.max() > 0)
                    def _():
                        for t in range(BT):
                            @pl.when(stale_i[t, 0] > 0)
                            def _():
                                row = win_r[t, 0:1, :]
                                for r in range(1, 8):
                                    row = jnp.where(subl[t, 0] == r,
                                                    win_r[t, r:r + 1, :],
                                                    row)
                                str_r[pl.ds(t, 1), :] = pltpu.roll(
                                    row, (-off[t, 0]) % PGW, 1)[:, :JW]
                    locr = iw - sb2
                    sel = rem & (locr >= 0) & (locr <= P - 1)
                    locn = jnp.clip(locr, 0, P - 1)
                    strip = str_r[:, :]
                    w5 = [w0, w1, w2, w3, w4]
                    for j in range(P):
                        mj = sel & (locn == j)
                        for kk in range(5):
                            w5[kk] = jnp.where(
                                mj, strip[:, j + kk:j + kk + 1], w5[kk])
                    rem2 = jnp.where(sel, 0, rem_i)
                    return (rem2,) + tuple(w5) + (sb2, it + 1)
                return fbody

            # round 0: narrow FP-position sweep — active lanes of one
            # wave span ~12 words, so this resolves everything in the
            # common case at a fraction of the old 60-position cost.
            # STALE interior lanes (V far behind best — tandem bands)
            # can lag arbitrarily; the wide while_loop below serves
            # them with the full-window sweep, preserving the previous
            # worst-case coverage (16 rounds x ~56 words).
            c0 = make_body(FP)(
                (act.astype(jnp.int32), z32, z32, z32, z32, z32, sb_,
                 jnp.int32(0)))
            (rem_i, w0, w1, w2, w3, w4, sb, _) = jax.lax.while_loop(
                fcond, make_body(JW - 4), c0)
            bad = rem_i > 0
            w5 = [w0, w1, w2, w3, w4]
            shv = sh.astype(jnp.uint32)                          # [BT, W]
            outs = []
            for k in range(4):
                lo_ = jnp.where(shv > 0, w5[k] >> shv, w5[k])
                hi_ = jnp.where(shv > 0,
                                w5[k + 1] << (jnp.uint32(32) - shv),
                                jnp.uint32(0))
                outs.append(lo_ | hi_)
            return outs, sb, bad                        # 4x [BT,W], ...

        def popcount(v):
            v = v - ((v >> 1) & jnp.uint32(0x55555555))
            v = (v & jnp.uint32(0x33333333)) + ((v >> 2)
                                                & jnp.uint32(0x33333333))
            v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
            return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)

        def ctz2(x):
            low = x & (~x + jnp.uint32(1))
            pc = popcount(low - jnp.uint32(1))
            return jnp.where(x == 0, 16, pc >> 1)

        def rev2(v):
            v = ((v >> 2) & jnp.uint32(0x33333333)) | \
                ((v & jnp.uint32(0x33333333)) << 2)
            v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | \
                ((v & jnp.uint32(0x0F0F0F0F)) << 4)
            v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | \
                ((v & jnp.uint32(0x00FF00FF)) << 8)
            return (v >> 16) | (v << 16)

        def suffix_max(c):
            if "nored" in _abl:
                return c
            v = c
            sh = 1
            while sh < W:
                v = jnp.maximum(v, shl(v, sh, BAR))
                sh <<= 1
            return v

        def prefix_min(c):
            if "nored" in _abl:
                return c
            v = c
            sh = 1
            while sh < W:
                v = jnp.minimum(v, shr(v, sh, BAR))
                sh <<= 1
            return v

        def trim_ok(thi, tlo):
            b15 = tlo & jnp.uint32(0x7FFF)
            b30 = ((tlo >> jnp.uint32(15)) | (thi << jnp.uint32(17))) \
                & jnp.uint32(0x7FFF)

            def tab(vbits):
                s = jnp.zeros((BT, W), jnp.int32)
                mx = jnp.zeros((BT, W), jnp.int32)
                for bit in range(TRIM_LEN):
                    mx = jnp.maximum(mx, s)
                    b = (vbits >> jnp.uint32(TRIM_LEN - 1 - bit)) \
                        & jnp.uint32(1)
                    s = s + jnp.where(b > 0, jnp.int32(mscore),
                                      jnp.int32(-dscore))
                return s - mx, s

            t15, s15 = tab(b15)
            t30, _ = tab(b30)
            return (t15 >= 0) & (t30 + s15 >= 0)

        def wave_body(wi, carry):
            if "noop" in _abl:   # loop/log floor probe (results WRONG)
                log_rows(wi, jnp.full((BT, W), CH_NONE, jnp.uint8),
                         jnp.zeros((BT, 128), jnp.int32))
                return carry
            if "nocond" in _abl:   # cond-dispatch cost probe
                return _wave_live(wi, carry)
            anyalive = carry[4][:, SC_ALIVE:SC_ALIVE + 1].max() > 0
            return jax.lax.cond(anyalive, _wave_live, _wave_dead,
                                wi, carry)

        def _wave_dead(wi, carry):
            """No live tube in this block: the XLA stepper still logs
            CH_NONE rows and commits the band fixed point hgh = low - 1
            (ops/wave.py one_wave with alive all-False)."""
            V, Thi, Tlo, M, sc, abase, bbase, asb, bsb = carry
            kbase = sc[:, SC_KBASE:SC_KBASE + 1]
            low = sc[:, SC_LOW:SC_LOW + 1]
            hgh = sc[:, SC_HGH:SC_HGH + 1]
            dif = sc[:, SC_DIF:SC_DIF + 1]
            bandcols = jnp.concatenate(
                [low, hgh, kbase, dif,
                 jnp.zeros((BT, 124), jnp.int32)], axis=1)
            log_rows(wi, jnp.full((BT, W), CH_NONE, jnp.uint8),
                     bandcols)
            scix = jax.lax.broadcasted_iota(jnp.int32, (BT, NSC), 1)
            sc2 = jnp.where(scix == SC_HGH, low - 1, sc)
            return V, Thi, Tlo, M, sc2, abase, bbase, asb, bsb

        def _wave_live(wi, carry):
            V, Thi, Tlo, M, sc, abase, bbase, asb0, bsb0 = carry
            kbase = sc[:, SC_KBASE:SC_KBASE + 1]
            low = sc[:, SC_LOW:SC_LOW + 1]
            hgh = sc[:, SC_HGH:SC_HGH + 1]
            besta = sc[:, SC_BESTA:SC_BESTA + 1]
            bestx = sc[:, SC_BESTX:SC_BESTX + 1]
            lasta = sc[:, SC_LASTA:SC_LASTA + 1]
            trima = sc[:, SC_TRIMA:SC_TRIMA + 1]
            trimx = sc[:, SC_TRIMX:SC_TRIMX + 1]
            trimd = sc[:, SC_TRIMD:SC_TRIMD + 1]
            trimw = sc[:, SC_TRIMW:SC_TRIMW + 1]
            trims = sc[:, SC_TRIMS:SC_TRIMS + 1]
            alive = sc[:, SC_ALIVE:SC_ALIVE + 1] > 0
            fall = sc[:, SC_FALL:SC_FALL + 1] > 0
            dif = sc[:, SC_DIF:SC_DIF + 1]

            live = alive

            lowd = kbase + low - 1
            low2 = jnp.where(alive & (lowd >= minp), low - 1, low)
            hghd = kbase + hgh + 1
            hgh2 = jnp.where(alive & (hghd <= maxp), hgh + 1, hgh)
            dif2 = jnp.where(alive, dif + 1, dif)

            is_new_low = (wix == low2) & (low2 != low)
            is_new_hgh = (wix == hgh2) & (hgh2 != hgh)
            V1 = jnp.where((is_new_low | is_new_hgh) & live, BAR, V)

            in_band = (wix >= low2) & (wix <= hgh2) & live
            Vr = jnp.where(in_band, V1, BAR)

            Vm = shr(Vr, 1, BAR)
            Vp = shl(Vr, 1, BAR)
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
            # select in int32 (uint8 selects force an i1 relayout Mosaic
            # rejects), convert once at the end
            choice_i = jnp.where(take_p, jnp.int32(CH_HIGH),
                                 jnp.where(take_m, jnp.int32(CH_LOW),
                                           jnp.int32(CH_DIAG)))
            choice_i = jnp.where(in_band, choice_i, jnp.int32(CH_NONE))
            choice = choice_i.astype(jnp.uint8)

            def pick(A):
                Am = jnp.where(wix >= 1, pltpu.roll(A, 1, 1), A)
                Ap = jnp.where(wix < W - 1, pltpu.roll(A, W - 1, 1), A)
                return jnp.where(take_p, Ap, jnp.where(take_m, Am, A))

            thi = pick(Thi)
            tlo = pick(Tlo)
            m = pick(M)
            m = m - ((thi >> jnp.uint32(28)) & jnp.uint32(1)).astype(
                jnp.int32)
            thi = (thi << 1) | (tlo >> 31)
            tlo = tlo << 1

            k = kbase + wix
            x = (c_pre + k) >> 1

            # ---- snake ----
            def scond(st):
                return st[4].max() > 0

            def sbody(st):
                # cont is carried as int32: scf.yield cannot carry i1
                # vectors on TPU
                (x_, thi_, tlo_, m_, cont_i, ab_, bb_, asb_, bsb_,
                 fbad_) = st
                cont = cont_i > 0
                y_ = x_ - k
                if fwd:
                    va = jnp.clip(alen - x_, 0, 64)
                    vb = jnp.clip(blen - y_, 0, 64)
                    sa, sb_ = x_, y_
                else:
                    va = jnp.clip(x_, 0, 64)
                    vb = jnp.clip(y_, 0, 64)
                    sa, sb_ = x_ - 64, y_ - 64
                iwa = sa >> 4
                iwb = sb_ >> 4
                sha = (sa & 15) << 1
                shb = (sb_ & 15) << 1
                if "nofetch" in _abl:
                    zz = jnp.zeros((BT, W), jnp.uint32)
                    was = [zz, zz, zz, zz]
                    wbs = [zz + jnp.uint32(1)] * 4
                    ab, bb = ab_, bb_
                    asb, bsb, fbad = asb_, bsb_, fbad_
                else:
                    ab = refill(awin_r, ab_, aw_r, iwa, cont, 0)
                    bb = refill(bwin_r, bb_, bw_r, iwb, cont, 1)
                    was, asb, abad = fetchw(awin_r, astr_r, ab, asb_,
                                            aw_r, iwa, sha, cont)
                    wbs, bsb, bbad = fetchw(bwin_r, bstr_r, bb, bsb_,
                                            bw_r, iwb, shb, cont)
                    fbad = fbad_ | (abad | bbad).astype(jnp.int32).max(
                        axis=1)[:, None]
                if not fwd:
                    was = [rev2(w) for w in was][::-1]
                    wbs = [rev2(w) for w in wbs][::-1]
                mm = [ctz2(a ^ b) for a, b in zip(was, wbs)]
                run = mm[0]
                fullr = mm[0] == 16
                for kk in (1, 2, 3):
                    run = jnp.where(fullr, 16 * kk + mm[kk], run)
                    fullr = fullr & (mm[kk] == 16)
                run = jnp.minimum(jnp.minimum(run, va), vb)
                run = jnp.where(cont, run, 0)
                m2, thi2, tlo2 = m_, thi_, tlo_
                for kk in range(4):
                    r = jnp.clip(run - 16 * kk, 0, 16)
                    ru = r.astype(jnp.uint32)
                    ob = jnp.where(
                        r > 0,
                        (thi2 >> (jnp.uint32(29) - ru))
                        & ((jnp.uint32(1) << ru) - jnp.uint32(1)),
                        jnp.uint32(0))
                    m2 = m2 + r - popcount(ob)
                    ones = jnp.where(r > 0,
                                     (jnp.uint32(1) << ru) - jnp.uint32(1),
                                     jnp.uint32(0))
                    nthi = jnp.where(
                        r > 0,
                        (thi2 << ru) | (tlo2 >> (jnp.uint32(32) - ru)),
                        thi2)
                    tlo2 = jnp.where(r > 0, (tlo2 << ru) | ones, tlo2)
                    thi2 = nthi
                x2 = x_ + (run if fwd else -run)
                cont2 = (cont & (run == 64)).astype(jnp.int32)
                return (x2, thi2, tlo2, m2, cont2, ab, bb, asb, bsb,
                        fbad)

            if "nosnake" in _abl:
                abase2, bbase2 = abase, bbase
                asb2, bsb2 = asb0, bsb0
                fbad = jnp.zeros((BT, 1), jnp.int32)
            else:
                (x, thi, tlo, m, _, abase2, bbase2, asb2, bsb2,
                 fbad) = jax.lax.while_loop(
                    scond, sbody,
                    (x, thi, tlo, m, in_band.astype(jnp.int32), abase,
                     bbase, asb0, bsb0,
                     jnp.zeros((BT, 1), jnp.int32)))
            y = x - k
            if fwd:
                b_sent = (y < 0) | (y >= blen)
                a_sent = ~b_sent & ((x < 0) | (x >= alen))
            else:
                b_sent = (y - 1 < 0) | (y - 1 >= blen)
                a_sent = ~b_sent & ((x - 1 < 0) | (x - 1 >= alen))
            b_sent = b_sent & in_band
            a_sent = a_sent & in_band
            c = (x << 1) - k

            # ---- best/trim updates ----
            # gated: no lane can beat besta when the plain row max
            # cannot (l_val/t_val <= cbest), and the TRIM_MLAG tail —
            # a large fraction of every tube's waves — never does, so
            # the suffix scans, trim tables and argmin reductions all
            # skip (identity) for whole blocks there
            cm = jnp.where(in_band, c, BAR)
            if fwd:
                cbest = cm.max(axis=1)[:, None]
                can = alive & (cbest > besta)
            else:
                cbest = cm.min(axis=1)[:, None]
                can = alive & (cbest < besta)

            def _upd_best(args):
                (cm, c, thi, tlo, m, dif2, kbase, besta, bestx, lasta,
                 trima, trimx, trimd, trimw, trims, alive, in_band,
                 cbest) = args
                if fwd:
                    rc = suffix_max(cm)
                    suff_excl = shl(rc, 1, BAR)
                    improver = in_band & (c > jnp.maximum(besta,
                                                          suff_excl))
                    better = alive & (cbest > besta)
                else:
                    rc = prefix_min(cm)
                    pre_excl = shr(rc, 1, BAR)
                    improver = in_band & (c < jnp.minimum(besta,
                                                          pre_excl))
                    better = alive & (cbest < besta)

                imp_c = jnp.where(improver, c, BAR)
                isbest = improver & (imp_c == cbest)
                bslot = jnp.where(isbest, wix, big).min(
                    axis=1)[:, None]
                # x at a slot is derivable: c = 2x - k
                x_at_b = (cbest + kbase + bslot) >> 1
                besta2 = jnp.where(better, cbest, besta)
                bestx2 = jnp.where(better, x_at_b, bestx)

                el = improver & (m >= PA)
                el_c = jnp.where(el, c, BAR)
                el_any = el.any(axis=1)[:, None]
                if fwd:
                    l_val = el_c.max(axis=1)[:, None]
                    l_upd = alive & el_any & (l_val > besta)
                else:
                    l_val = el_c.min(axis=1)[:, None]
                    l_upd = alive & el_any & (l_val < besta)
                lasta2 = jnp.where(l_upd, l_val, lasta)

                tok = (jnp.zeros((BT, W), jnp.int32) == 0) \
                    if "notrim" in _abl else trim_ok(thi, tlo)
                et = el & tok
                et_c = jnp.where(et, c, BAR)
                et_any = et.any(axis=1)[:, None]
                if fwd:
                    t_val = et_c.max(axis=1)[:, None]
                    t_upd = alive & et_any & (t_val > besta)
                else:
                    t_val = et_c.min(axis=1)[:, None]
                    t_upd = alive & et_any & (t_val < besta)
                t_hit = et & (et_c == t_val)
                tslot = jnp.where(t_hit, wix, big).min(
                    axis=1)[:, None]
                x_at_t = (t_val + kbase + tslot) >> 1
                trima2 = jnp.where(t_upd, t_val, trima)
                trimx2 = jnp.where(t_upd, x_at_t, trimx)
                trimd2 = jnp.where(t_upd, dif2, trimd)
                trimw2 = jnp.where(t_upd, dif2, trimw)
                trims2 = jnp.where(t_upd, kbase + tslot, trims)
                return (besta2, bestx2, lasta2, trima2, trimx2,
                        trimd2, trimw2, trims2)

            def _upd_none(args):
                (cm, c, thi, tlo, m, dif2, kbase, besta, bestx, lasta,
                 trima, trimx, trimd, trimw, trims, alive, in_band,
                 cbest) = args
                return (besta, bestx, lasta, trima, trimx, trimd,
                        trimw, trims)

            (besta2, bestx2, lasta2, trima2, trimx2, trimd2, trimw2,
             trims2) = jax.lax.cond(
                can.astype(jnp.int32).max() > 0, _upd_best, _upd_none,
                (cm, c, thi, tlo, m, dif2, kbase, besta, bestx, lasta,
                 trima, trimx, trimd, trimw, trims, alive, in_band,
                 cbest))

            V2 = jnp.where(in_band, c, V1)
            Thi2 = jnp.where(in_band, thi, Thi)
            Tlo2 = jnp.where(in_band, tlo, Tlo)
            M2 = jnp.where(in_band, m, M)

            # ---- sentinel clipping ----
            # gated: sentinels only fire near sequence ends, so whole
            # blocks skip the clip reductions on most waves
            sent = a_sent | b_sent

            def _clip_sent(args):
                a_sent, b_sent, low2, hgh2, besta2, bestx2 = args
                hit = (a_sent | b_sent).any(axis=1)[:, None]
                more = ~hit
                by = besta2 - bestx2
                if fwd:
                    b_in = (by >= 0) & (by < blen)
                    a_in = (bestx2 >= 0) & (bestx2 < alen)
                else:
                    b_in = (by - 1 >= 0) & (by - 1 < blen)
                    a_in = (bestx2 - 1 >= 0) & (bestx2 - 1 < alen)
                more = more | (b_in & a_in)
                if fwd:
                    aclip = jnp.where(a_sent, wix, big).min(
                        axis=1)[:, None]
                    bclip = jnp.where(b_sent, wix, -big).max(
                        axis=1)[:, None]
                    hgh3 = jnp.where(hit & (hgh2 >= aclip), aclip - 1,
                                     hgh2)
                    low3 = jnp.where(hit & (low2 <= bclip), bclip + 1,
                                     low2)
                else:
                    aclip = jnp.where(a_sent, wix, -big).max(
                        axis=1)[:, None]
                    bclip = jnp.where(b_sent, wix, big).min(
                        axis=1)[:, None]
                    low3 = jnp.where(hit & (low2 <= aclip), aclip + 1,
                                     low2)
                    hgh3 = jnp.where(hit & (hgh2 >= bclip), bclip - 1,
                                     hgh2)
                # yield int32: scf.yield cannot carry i1 vectors on TPU
                return more.astype(jnp.int32), low3, hgh3

            def _clip_none(args):
                a_sent, b_sent, low2, hgh2, besta2, bestx2 = args
                return jnp.ones((BT, 1), jnp.int32), low2, hgh2

            more_i, low3, hgh3 = jax.lax.cond(
                sent.astype(jnp.int32).max() > 0, _clip_sent,
                _clip_none,
                (a_sent, b_sent, low2, hgh2, besta2, bestx2))
            more = more_i > 0

            if fwd:
                ok = in_band & (V2 >= besta2 - WAVE_LAG)
            else:
                ok = in_band & (V2 <= besta2 + WAVE_LAG)
            ok = ok & (wix >= low3) & (wix <= hgh3)
            anyok = ok.any(axis=1)[:, None]
            hgh4 = jnp.where(ok, wix, -big).max(axis=1)[:, None]
            low4 = jnp.where(ok, wix, big).min(axis=1)[:, None]
            empty = alive & ~anyok
            hgh4 = jnp.where(anyok, hgh4, low3 - 1)
            low4 = jnp.where(anyok, low4, low3)

            if fwd:
                going = more & (lasta2 >= besta2 - TRIM_MLAG)
            else:
                going = more & (lasta2 <= besta2 + TRIM_MLAG)
            width = hgh4 - low4 + 1
            over = alive & going & (width > W - 4)
            fbad_b = fbad > 0   # strip-select overflow guard (never in
            # practice: active-lane spans are bounded far below JW)
            fall2 = fall | over | (alive & going & empty) | fbad_b
            alive2 = alive & going & ~over & ~empty & ~fbad_b

            # ---- gated recenter via per-tube dynamic roll ----
            need = (alive2 & ((low4 <= 2) | (hgh4 >= W - 3))
                    ).astype(jnp.int32).max() > 0

            def do_recenter(args):
                V2, Thi2, Tlo2, M2, kbase, low4, hgh4, alive2 = args
                center = (low4 + hgh4) >> 1
                shift = jnp.where(alive2, center - W // 2, 0)   # [BT,1]
                Vn, Thin, Tlon, Mn = [], [], [], []
                lix = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
                for t in range(BT):
                    sh_t = shift[t, 0]
                    src = lix + sh_t
                    valid = (src >= 0) & (src < W)
                    rsh = (-sh_t) % W   # dynamic roll shift must be >= 0
                    rl = lambda A, fill: jnp.where(
                        valid, pltpu.roll(A[t:t + 1, :], rsh, 1), fill)
                    Vn.append(rl(V2, BAR))
                    Thin.append(rl(Thi2, jnp.uint32(0)))
                    Tlon.append(rl(Tlo2, jnp.uint32(0)))
                    Mn.append(rl(M2, jnp.int32(0)))
                return (jnp.concatenate(Vn, 0), jnp.concatenate(Thin, 0),
                        jnp.concatenate(Tlon, 0), jnp.concatenate(Mn, 0),
                        kbase + shift, low4 - shift, hgh4 - shift)

            def no_recenter(args):
                V2, Thi2, Tlo2, M2, kbase, low4, hgh4, alive2 = args
                return V2, Thi2, Tlo2, M2, kbase, low4, hgh4

            if "norecenter" in _abl:
                V3, Thi3, Tlo3, M3, kbase2, low5, hgh5 = (
                    V2, Thi2, Tlo2, M2, kbase, low4, hgh4)
            else:
                V3, Thi3, Tlo3, M3, kbase2, low5, hgh5 = jax.lax.cond(
                    need, do_recenter, no_recenter,
                    (V2, Thi2, Tlo2, M2, kbase, low4, hgh4, alive2))

            # ---- logs ----
            bandcols = jnp.concatenate(
                [low2, hgh2, kbase, dif2,
                 jnp.zeros((BT, 124), jnp.int32)], axis=1)
            log_rows(wi, choice, bandcols)

            sc2 = jnp.concatenate(
                [kbase2, low5, hgh5, besta2, bestx2, lasta2, trima2,
                 trimx2, trimd2, trimw2, trims2,
                 alive2.astype(jnp.int32), fall2.astype(jnp.int32), dif2,
                 jnp.zeros((BT, NSC - 14), jnp.int32)], axis=1)
            return V3, Thi3, Tlo3, M3, sc2, abase2, bbase2, asb2, bsb2

        base0 = jnp.full((BT, 1), -big, jnp.int32)
        carry0 = (V_r[:], Thi_r[:], Tlo_r[:], M_r[:], sc_r[:],
                  base0, base0, base0, base0)
        if not MEGA:
            V, Thi, Tlo, M, sc, _, _, _, _ = jax.lax.fori_loop(
                0, CW, wave_body, carry0)
        else:
            # early-exit wave loop: a block stops at its last live wave
            # (unwritten log rows beyond it are masked by trim_wave)
            def mcond(c):
                wi, carry = c
                return ((wi < G)
                        & (carry[4][:, SC_ALIVE:SC_ALIVE + 1].max()
                           > 0))

            def mbody(c):
                wi, carry = c
                return wi + 1, _wave_live(wi, carry)

            wi_x, (V, Thi, Tlo, M, sc, _, _, _, _) = jax.lax.while_loop(
                mcond, mbody, (jnp.int32(0), carry0))
            # flush the staging tail (full CW rows; stale/garbage rows
            # land beyond the exit wave and are masked downstream)
            fbase = jnp.clip((wi_x // CW) * CW, 0, G - CW)
            dma = pltpu.make_async_copy(
                chstg_r,
                chlog_r.at[pl.ds(fbase, CW), pl.ds(blk_i * BT, BT)],
                sem_r.at[2])
            dma.start()
            dma.wait()

        Vo_r[:] = V
        Thio_r[:] = Thi
        Tloo_r[:] = Tlo
        Mo_r[:] = M
        sco_r[:] = sc

    # ---- pallas_call wrapper --------------------------------------------

    def col():
        return pl.BlockSpec((BT, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def row():
        return pl.BlockSpec((BT, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    scs = pl.BlockSpec((BT, NSC), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)

    if MEGA:
        # kbase rides inside chlog; a tiny dummy keeps the kernel's
        # positional signature identical across modes
        log_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                     pl.BlockSpec((8, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        log_shapes = [jax.ShapeDtypeStruct((G, N, W), jnp.uint8),
                      jax.ShapeDtypeStruct((8, 128), jnp.int32)]
    else:
        log_specs = [pl.BlockSpec((CW, BT, W), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((CW, BT, 128), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        log_shapes = [jax.ShapeDtypeStruct((CW, N, W), jnp.uint8),
                      jax.ShapeDtypeStruct((CW, N, 128), jnp.int32)]

    grid_spec = pl.GridSpec(
        grid=(NB,),
        in_specs=[col(), col(), col(), col(), col(), col(),
                  row(), row(), row(), row(), scs,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[row(), row(), row(), row(), scs] + log_specs,
        scratch_shapes=[
            pltpu.VMEM((BT, 8, PGW), jnp.uint32),
            pltpu.VMEM((BT, 8, PGW), jnp.uint32),
            pltpu.VMEM((BT, JW), jnp.uint32),
            pltpu.VMEM((BT, JW), jnp.uint32),
            pltpu.VMEM((CW, BT, W) if MEGA else (1, 1, 1), jnp.uint8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, W), jnp.int32),
            jax.ShapeDtypeStruct((N, W), jnp.uint32),
            jax.ShapeDtypeStruct((N, W), jnp.uint32),
            jax.ShapeDtypeStruct((N, W), jnp.int32),
            jax.ShapeDtypeStruct((N, NSC), jnp.int32),
        ] + log_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chunk_fn(pool, targs, st):
        """Adapter with ops/wave.py's state-tuple interface.

        ``pool`` is either the raw word pool [P] or a PREBUILT page-group
        array [NG, 8, PGW] (build_pool_pages) — rebuilding the page
        groups costs a 2x-pool-size HBM copy (~10 ms at typical pools),
        which dominated the per-chunk fixed cost when done per call."""
        pages3 = pool if pool.ndim == 3 else build_pool_pages(jnp, pool)
        (V, Thi, Tlo, M, kbase, low, hgh, besta, bestx, lasta,
         trima, trimx, trimd, trim_wave, trim_slot,
         alive, fallback, dif) = st
        aw, alen, bw, blen, minp, maxp = targs
        sc = jnp.stack(
            [kbase, low, hgh, besta, bestx, lasta, trima, trimx, trimd,
             trim_wave, trim_slot, alive.astype(jnp.int32),
             fallback.astype(jnp.int32), dif,
             jnp.zeros_like(kbase), jnp.zeros_like(kbase)], axis=1)

        def c2(v):
            return v[:, None].astype(jnp.int32)

        outs = call(
            c2(aw), c2(alen), c2(bw), c2(blen), c2(minp), c2(maxp),
            V, Thi, Tlo, M, sc, pages3)
        V2, Thi2, Tlo2, M2, sc2, chlog, bandlog = outs
        st2 = (V2, Thi2, Tlo2, M2,
               sc2[:, SC_KBASE], sc2[:, SC_LOW], sc2[:, SC_HGH],
               sc2[:, SC_BESTA], sc2[:, SC_BESTX], sc2[:, SC_LASTA],
               sc2[:, SC_TRIMA], sc2[:, SC_TRIMX], sc2[:, SC_TRIMD],
               sc2[:, SC_TRIMW], sc2[:, SC_TRIMS],
               sc2[:, SC_ALIVE] > 0, sc2[:, SC_FALL] > 0, sc2[:, SC_DIF])
        return st2, chlog, (None if MEGA else bandlog[:, :, :4])

    return jax.jit(chunk_fn)


def build_backtrack_walk(cfg: WaveConfig, G: int, interpret: bool = False,
                         kb_embedded: bool = False):
    """In-VMEM path walk over G waves of choice logs.

    The XLA formulation (WaveEngine._backtrack_fn) is a lax.scan whose
    per-step ``ch[w, rows, slot]`` gather lowers to N scalar loads — the
    walk dominated the wave phase (~0.8 s/run at bench geometry).  Here
    the walk runs as a sequential pallas grid over wave blocks with the
    carried diagonal vector resident in VMEM and the per-wave choice
    pick as a one-hot sublane select (TPU grids execute blocks in order,
    so the reverse-wave iteration is just a reversed index_map).

    Layout: tubes ride the lane dimension ([*, N] everywhere, N is the
    full last dim so any cfg.n is block-legal); the choice logs are
    transposed to [G, W, N] once in the caller's jit (~1 ms at bench
    geometry, HBM-bandwidth bound).

    Returns fn(chT [G, W, N] u8, kb [G, N] i32, trim_diag [N] i32,
    trim_wave [N] i32) -> (d0 [N], D [G, N]) with D[w] = path diagonal
    at wave w+1 (diag *before* stepping wave w), d0 = diagonal at wave 0
    — matching the scan's emission order.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, W = cfg.n, cfg.w
    WB = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    GB = G // WB
    assert GB * WB == G

    def kernel_body(ch_r, kb_r, td_r, tw_r, Do_r, d0_r, diag_r):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            diag_r[:, :] = td_r[:, :]

        base = (GB - 1 - j) * WB
        subl = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0)
        tw = tw_r[:, :]                                # [1, N]
        diag = diag_r[:, :]                            # [1, N]
        for i in range(WB):          # unrolled: static slices only
            w = WB - 1 - i           # block-local wave, descending
            wv = base + w + 1
            ch_w = ch_r[w].astype(jnp.int32)           # [W, N]
            if kb_embedded:
                # the mega chunk kernel packs each wave's kbase into
                # bits (2, 3) of the row's first 16 lanes (2 bits per
                # lane); choices are the low 2 bits
                kb_w = jnp.zeros((1, N), jnp.int32)
                for l in range(16):
                    kb_w = kb_w | (
                        ((ch_w[l:l + 1, :] >> 2) & 3) << (2 * l))
                chv = ch_w & 3
            else:
                kb_w = kb_r[w:w + 1, :]                # [1, N]
                chv = ch_w
            slot = jnp.clip(diag - kb_w, 0, W - 1)
            cc = jnp.where(subl == slot, chv, 0).max(
                axis=0, keepdims=True)                 # [1, N]
            active = wv <= tw
            Do_r[w:w + 1, :] = diag
            diag = jnp.where(active & (cc == CH_LOW), diag - 1,
                             jnp.where(active & (cc == CH_HIGH),
                                       diag + 1, diag))
        diag_r[:, :] = diag

        @pl.when(j == GB - 1)
        def _():
            d0_r[:, :] = diag

    if kb_embedded:
        def kernel(ch_r, td_r, tw_r, Do_r, d0_r, diag_r):
            kernel_body(ch_r, None, td_r, tw_r, Do_r, d0_r, diag_r)
    else:
        def kernel(ch_r, kb_r, td_r, tw_r, Do_r, d0_r, diag_r):
            kernel_body(ch_r, kb_r, td_r, tw_r, Do_r, d0_r, diag_r)

    ch_spec = pl.BlockSpec((WB, W, N), lambda j: (GB - 1 - j, 0, 0),
                           memory_space=pltpu.VMEM)
    kb_spec = pl.BlockSpec((WB, N), lambda j: (GB - 1 - j, 0),
                           memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, N), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(GB,),
        in_specs=([ch_spec] + ([] if kb_embedded else [kb_spec])
                  + [vec_spec, vec_spec]),
        out_specs=[
            pl.BlockSpec((WB, N), lambda j: (GB - 1 - j, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, N), jnp.int32)],
        interpret=interpret,
    )

    if kb_embedded:
        def fn(chT, trim_diag, trim_wave):
            D, d0 = call(chT, trim_diag[None, :], trim_wave[None, :])
            return d0[0], D
    else:
        def fn(chT, kb, trim_diag, trim_wave):
            D, d0 = call(chT, kb, trim_diag[None, :],
                         trim_wave[None, :])
            return d0[0], D

    return fn


def build_wave0_pallas(cfg: WaveConfig, direction: int = +1,
                       interpret: bool = False):
    """In-VMEM wave-0 initializer (host_wave0's device twin).

    Lets a batch's reverse pass chain directly behind the forward walk
    on device (the seam diagonal never visits the host) and shrinks the
    per-batch upload to the tube descriptor columns.  Same snake /
    sentinel-clip machinery as the chunk kernel; bit-identical to
    ops/wave.host_wave0 (tests/test_wave0_pallas.py).

    Returns fn(pages3, targs6, dgmin, dgmax, anti, valid) -> state tuple
    (ops/wave.py layout, padding rows dead).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, W = cfg.n, cfg.w
    FP = 16 if W <= 256 else 32   # fetch sweep positions (see chunk kernel)
    assert N % BT == 0
    NB = N // BT
    fwd = direction > 0
    BARv = -1 if fwd else 0x7FFFFFFF

    def kernel(aw_r, alen_r, bw_r, blen_r, minp_r, maxp_r,
               dgmin_r, dgmax_r, anti_r, valid_r,
               pool_r,
               Vo_r, Thio_r, Tloo_r, Mo_r, sco_r,
               awin_r, bwin_r, astr_r, bstr_r, sem_r):
        BAR = jnp.int32(BARv)
        NP = pool_r.shape[0] * 8
        wix = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
        big = jnp.int32(1 << 30)

        def shl(A, sh, fill):
            r = pltpu.roll(A, W - sh, 1)
            return jnp.where(wix < W - sh, r, fill)

        def shr(A, sh, fill):
            r = pltpu.roll(A, sh, 1)
            return jnp.where(wix >= sh, r, fill)

        # --- fetch machinery (same as the chunk kernel) ---
        def refill(win_r, base, woff_r, iw, act, slot):
            loc = iw - base
            bad = act & ((loc < 0) | (loc >= SW))
            anybad = bad.astype(jnp.int32).max(axis=1)[:, None]
            iww = jnp.where(act, iw, big)
            want = iww.min(axis=1)[:, None] - 8
            pgw = jnp.clip(woff_r[:, :] + want, 0, NP * PGS - 1)
            page = pgw >> PGS_LOG
            newbase = jnp.where(anybad > 0, page * PGS - woff_r[:, :],
                                base)

            @pl.when(anybad.max() > 0)   # one test skips all BT branch
            def _():                     # tests in the common case
                for t in range(BT):
                    @pl.when(anybad[t, 0] > 0)
                    def _():
                        dma = pltpu.make_async_copy(
                            pool_r.at[page[t, 0] >> 3],
                            win_r.at[t], sem_r.at[slot])
                        dma.start()
                        dma.wait()
            return newbase

        def fetchw(win_r, str_r, base, sb_, woff_r, iw, sh, act):
            """words iw..iw+4 per lane via batched strip selects.

            ``str_r`` [BT, JW] caches pool words [sb, sb+JW) per tube.
            Active lanes usually cluster within a few words of the band
            head, but STALE interior lanes (V far behind best — tandem
            bands) can lag arbitrarily, so the select loops windows over
            the remaining lanes: each round refreshes the strip to the
            minimum unfetched word (per-tube gated row pick + lane roll)
            and gathers every lane that fits; common case is ONE round.
            Lanes still unfetched after RMAX rounds flag the overflow
            guard (host replays those tubes exactly).
            Returns (4 funnel-shifted u32 words [BT, W], new sb [BT,1],
            overflow guard [BT, W])."""
            RMAX = 16
            subl = ((base + woff_r[:, :]) >> PGS_LOG) & 7        # [BT,1]
            z32 = jnp.zeros((BT, W), jnp.uint32)

            def fcond(c):
                return (c[0].max() > 0) & (c[7] < RMAX)

            def make_body(P):
                # one select round over P strip positions: refresh stale
                # per-tube strips to the min unfetched word, then gather
                # every lane whose word falls inside the window
                def fbody(c):
                    rem_i, w0, w1, w2, w3, w4, sb, it = c
                    rem = rem_i > 0
                    m0 = jnp.where(rem, iw, big).min(axis=1)[:, None]
                    need = rem.astype(jnp.int32).max(
                        axis=1)[:, None] > 0
                    stale = need & ((m0 < sb) | (m0 > sb + (P - 1)))
                    sb2 = jnp.where(
                        stale,
                        jnp.clip(m0 - 2 - base, 0, PGW - JW) + base,
                        sb)
                    off = sb2 - base
                    stale_i = stale.astype(jnp.int32)

                    @pl.when(stale_i.max() > 0)
                    def _():
                        for t in range(BT):
                            @pl.when(stale_i[t, 0] > 0)
                            def _():
                                row = win_r[t, 0:1, :]
                                for r in range(1, 8):
                                    row = jnp.where(subl[t, 0] == r,
                                                    win_r[t, r:r + 1, :],
                                                    row)
                                str_r[pl.ds(t, 1), :] = pltpu.roll(
                                    row, (-off[t, 0]) % PGW, 1)[:, :JW]
                    locr = iw - sb2
                    sel = rem & (locr >= 0) & (locr <= P - 1)
                    locn = jnp.clip(locr, 0, P - 1)
                    strip = str_r[:, :]
                    w5 = [w0, w1, w2, w3, w4]
                    for j in range(P):
                        mj = sel & (locn == j)
                        for kk in range(5):
                            w5[kk] = jnp.where(
                                mj, strip[:, j + kk:j + kk + 1], w5[kk])
                    rem2 = jnp.where(sel, 0, rem_i)
                    return (rem2,) + tuple(w5) + (sb2, it + 1)
                return fbody

            # round 0: narrow FP-position sweep — active lanes of one
            # wave span ~12 words, so this resolves everything in the
            # common case at a fraction of the old 60-position cost.
            # STALE interior lanes (V far behind best — tandem bands)
            # can lag arbitrarily; the wide while_loop below serves
            # them with the full-window sweep, preserving the previous
            # worst-case coverage (16 rounds x ~56 words).
            c0 = make_body(FP)(
                (act.astype(jnp.int32), z32, z32, z32, z32, z32, sb_,
                 jnp.int32(0)))
            (rem_i, w0, w1, w2, w3, w4, sb, _) = jax.lax.while_loop(
                fcond, make_body(JW - 4), c0)
            bad = rem_i > 0
            w5 = [w0, w1, w2, w3, w4]
            shv = sh.astype(jnp.uint32)                          # [BT, W]
            outs = []
            for k in range(4):
                lo_ = jnp.where(shv > 0, w5[k] >> shv, w5[k])
                hi_ = jnp.where(shv > 0,
                                w5[k + 1] << (jnp.uint32(32) - shv),
                                jnp.uint32(0))
                outs.append(lo_ | hi_)
            return outs, sb, bad                        # 4x [BT,W], ...

        def popcount(v):
            v = v - ((v >> 1) & jnp.uint32(0x55555555))
            v = (v & jnp.uint32(0x33333333)) + ((v >> 2)
                                                & jnp.uint32(0x33333333))
            v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
            return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)

        def ctz2(x):
            low = x & (~x + jnp.uint32(1))
            pc = popcount(low - jnp.uint32(1))
            return jnp.where(x == 0, 16, pc >> 1)

        def rev2(v):
            v = ((v >> 2) & jnp.uint32(0x33333333)) | \
                ((v & jnp.uint32(0x33333333)) << 2)
            v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | \
                ((v & jnp.uint32(0x0F0F0F0F)) << 4)
            v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | \
                ((v & jnp.uint32(0x00FF00FF)) << 8)
            return (v >> 16) | (v << 16)

        alen = alen_r[:, :]
        blen = blen_r[:, :]
        dgmin = dgmin_r[:, :]
        dgmax = dgmax_r[:, :]
        anti = anti_r[:, :]
        valid = valid_r[:, :] > 0

        kbase = dgmin + ((dgmax - dgmin) >> 1) - W // 2
        low = dgmin - kbase
        hgh = dgmax - kbase
        k = kbase + wix
        in_band = (wix >= low) & (wix <= hgh) & valid

        x0 = (anti + k) >> 1

        # ---- snake0 ----
        def scond(st):
            return st[6].max() > 0

        def sbody(st):
            x_, ab_, bb_, asb_, bsb_, fbad_, cont_i = st
            cont = cont_i > 0
            y_ = x_ - k
            if fwd:
                va = jnp.clip(alen - x_, 0, 64)
                vb = jnp.clip(blen - y_, 0, 64)
                sa, sb_ = x_, y_
            else:
                va = jnp.clip(x_, 0, 64)
                vb = jnp.clip(y_, 0, 64)
                sa, sb_ = x_ - 64, y_ - 64
            iwa = sa >> 4
            iwb = sb_ >> 4
            sha = (sa & 15) << 1
            shb = (sb_ & 15) << 1
            ab = refill(awin_r, ab_, aw_r, iwa, cont, 0)
            bb = refill(bwin_r, bb_, bw_r, iwb, cont, 1)
            was, asb, abad = fetchw(awin_r, astr_r, ab, asb_,
                                    aw_r, iwa, sha, cont)
            wbs, bsb, bbad = fetchw(bwin_r, bstr_r, bb, bsb_,
                                    bw_r, iwb, shb, cont)
            fbad = fbad_ | (abad | bbad).astype(jnp.int32).max(
                axis=1)[:, None]
            if not fwd:
                was = [rev2(w) for w in was][::-1]
                wbs = [rev2(w) for w in wbs][::-1]
            mm = [ctz2(a ^ b) for a, b in zip(was, wbs)]
            run = mm[0]
            fullr = mm[0] == 16
            for kk in (1, 2, 3):
                run = jnp.where(fullr, 16 * kk + mm[kk], run)
                fullr = fullr & (mm[kk] == 16)
            run = jnp.minimum(jnp.minimum(run, va), vb)
            run = jnp.where(cont, run, 0)
            x2 = x_ + (run if fwd else -run)
            cont2 = (cont & (run == 64)).astype(jnp.int32)
            return x2, ab, bb, asb, bsb, fbad, cont2

        base0 = jnp.full((BT, 1), -big, jnp.int32)
        x, _, _, _, _, fbad, _ = jax.lax.while_loop(
            scond, sbody, (x0, base0, base0, base0, base0,
                           jnp.zeros((BT, 1), jnp.int32),
                           in_band.astype(jnp.int32)))
        y = x - k
        if fwd:
            b_sent = (y < 0) | (y >= blen)
            a_sent = ~b_sent & ((x < 0) | (x >= alen))
        else:
            b_sent = (y - 1 < 0) | (y - 1 >= blen)
            a_sent = ~b_sent & ((x - 1 < 0) | (x - 1 >= alen))
        b_sent = b_sent & in_band
        a_sent = a_sent & in_band
        c = (x << 1) - k

        besta0 = anti
        bestx0 = (anti + (kbase + hgh)) >> 1

        def suffix_max(cv):
            v = cv
            sh = 1
            while sh < W:
                v = jnp.maximum(v, shl(v, sh, BAR))
                sh <<= 1
            return v

        def prefix_min(cv):
            v = cv
            sh = 1
            while sh < W:
                v = jnp.minimum(v, shr(v, sh, BAR))
                sh <<= 1
            return v

        cm = jnp.where(in_band, c, BAR)
        if fwd:
            rc = suffix_max(cm)
            suff = shl(rc, 1, BAR)
            improver = in_band & (c > jnp.maximum(besta0, suff))
            cbest = rc.max(axis=1)[:, None]
            better = cbest > besta0
        else:
            rc = prefix_min(cm)
            pre = shr(rc, 1, BAR)
            improver = in_band & (c < jnp.minimum(besta0, pre))
            cbest = rc.min(axis=1)[:, None]
            better = cbest < besta0
        imp_c = jnp.where(improver, c, BAR)
        isbest = improver & (imp_c == cbest)
        bslot = jnp.where(isbest, wix, big).min(axis=1)[:, None]
        x_at_b = jnp.where(wix == bslot, x, -big).max(axis=1)[:, None]

        besta = jnp.where(better, cbest, besta0)
        bestx = jnp.where(better, x_at_b, bestx0)
        trim_slot = jnp.where(better, kbase + bslot, kbase + hgh)

        hit = (a_sent | b_sent).any(axis=1)[:, None]
        more = ~hit
        by = besta - bestx
        if fwd:
            b_in = (by >= 0) & (by < blen)
            a_in = (bestx >= 0) & (bestx < alen)
        else:
            b_in = (by - 1 >= 0) & (by - 1 < blen)
            a_in = (bestx - 1 >= 0) & (bestx - 1 < alen)
        more = more | (b_in & a_in)

        if fwd:
            aclip = jnp.where(a_sent, wix, big).min(axis=1)[:, None]
            bclip = jnp.where(b_sent, wix, -big).max(axis=1)[:, None]
            hgh2 = jnp.where(hit & (hgh >= aclip), aclip - 1, hgh)
            low2 = jnp.where(hit & (low <= bclip), bclip + 1, low)
        else:
            aclip = jnp.where(a_sent, wix, -big).max(axis=1)[:, None]
            bclip = jnp.where(b_sent, wix, big).min(axis=1)[:, None]
            low2 = jnp.where(hit & (low <= aclip), aclip + 1, low)
            hgh2 = jnp.where(hit & (hgh >= bclip), bclip - 1, hgh)

        Vo_r[:, :] = jnp.where(in_band, c, BAR)
        Thio_r[:, :] = jnp.where(in_band, jnp.uint32((1 << 28) - 1),
                                 jnp.uint32(0))
        Tloo_r[:, :] = jnp.where(in_band, jnp.uint32(0xFFFFFFFF),
                                 jnp.uint32(0))
        Mo_r[:, :] = jnp.where(in_band, jnp.int32(PATH_LEN),
                               jnp.int32(0))
        fbad_b = fbad > 0   # strip-select overflow guard (never in
        # practice); flagged as fallback so the host replays exactly
        alive = more & valid & ~fbad_b
        z = jnp.zeros((BT, 1), jnp.int32)
        sco_r[:, :] = jnp.concatenate(
            [kbase, low2, hgh2, besta, bestx, besta, besta, bestx, z,
             z, trim_slot, alive.astype(jnp.int32),
             fbad_b.astype(jnp.int32), z,
             jnp.zeros((BT, NSC - 14), jnp.int32)], axis=1)

    def col():
        return pl.BlockSpec((BT, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def row():
        return pl.BlockSpec((BT, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(NB,),
        in_specs=[col()] * 10 + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[row(), row(), row(), row(),
                   pl.BlockSpec((BT, NSC), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((BT, 8, PGW), jnp.uint32),
            pltpu.VMEM((BT, 8, PGW), jnp.uint32),
            pltpu.VMEM((BT, JW), jnp.uint32),
            pltpu.VMEM((BT, JW), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    import jax

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, W), jnp.int32),
            jax.ShapeDtypeStruct((N, W), jnp.uint32),
            jax.ShapeDtypeStruct((N, W), jnp.uint32),
            jax.ShapeDtypeStruct((N, W), jnp.int32),
            jax.ShapeDtypeStruct((N, NSC), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def init_fn(pages3, targs, dgmin, dgmax, anti, valid):
        aw, alen, bw, blen, minp, maxp = targs

        def c2(v):
            return v[:, None].astype(jnp.int32)

        V, Thi, Tlo, M, sc = call(
            c2(aw), c2(alen), c2(bw), c2(blen), c2(minp), c2(maxp),
            c2(dgmin), c2(dgmax), c2(anti), c2(valid), pages3)
        st = (V, Thi, Tlo, M,
              sc[:, SC_KBASE], sc[:, SC_LOW], sc[:, SC_HGH],
              sc[:, SC_BESTA], sc[:, SC_BESTX], sc[:, SC_LASTA],
              sc[:, SC_TRIMA], sc[:, SC_TRIMX], sc[:, SC_TRIMD],
              sc[:, SC_TRIMW], sc[:, SC_TRIMS],
              sc[:, SC_ALIVE] > 0, sc[:, SC_FALL] > 0, sc[:, SC_DIF])
        return st

    return init_fn
