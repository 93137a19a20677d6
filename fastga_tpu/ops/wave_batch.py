"""Batched Local_Alignment: device wave runs + host replay/stitching.

Mirrors Local_Alignment's orchestration (align.c:1423-1576) over a batch:
forward wave from the tube band, reverse wave from the forward path's
origin diagonal, DUB_TRIM short-pass reruns, and the A-complement
reflection — with device batches per phase and host-side exact trace
replay.  Tubes the device flags (band/wave budget overruns) fall back to
the exact scalar engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import wave as wavek
from . import wave_replay as wrep
from .wave_ref import DUB_TRIM, AlignSpec, Path, local_alignment


@dataclass
class WorkItem:
    akey: object          # key into the sequence pool / lookup
    bkey: object
    dgmin: int
    dgmax: int
    anti: int
    acomp: bool
    alen: int
    blen: int
    selfie: bool = False
    lbord: int = -1
    hbord: int = -1
    waves_hint: int = -1   # expected per-direction wave count (-1 unknown)
    hint_measured: bool = False   # hint from a measured prior tile (vs a
    # calibration-ratio guess): only measured hints may route an item to
    # the long lane — a mis-calibrated ratio on a fresh workload (e.g.
    # low-divergence long contigs) otherwise sends EVERY first tile to
    # the narrow engine with a maximal chunk budget


class BatchAligner:
    """Runs Local_Alignment over batches of work items."""

    def __init__(self, spec: AlignSpec, pool_words: np.ndarray,
                 offs: Dict, seq_lookup: Callable[[object], np.ndarray],
                 cfg: wavek.WaveConfig = wavek.WaveConfig(),
                 engine: Optional[wavek.WaveEngine] = None,
                 pool_dev=None):
        self.spec = spec
        self.cfg = cfg
        self.engine = engine if engine is not None \
            else wavek.WaveEngine(spec, cfg)
        # pool upload is lazy (first .pool use happens inside engine.run,
        # safely after any background warmup finishes — uploading here
        # would trace jax ops concurrently with the warmup thread and
        # perturb compilation-cache keys)
        self._pool_words = pool_words
        self._pool = pool_dev   # pre-uploaded device copy, when cached
        if pool_dev is not None:
            self.engine._pool_np = (pool_dev, pool_words)
        self.offs = offs
        self.seq = seq_lookup
        self.stats = {"fallbacks": 0, "device_waves": 0, "items": 0,
                      "rerun_fwd": 0, "rerun_rev": 0, "requeues": 0,
                      "block_waves": 0}

    def _count_block_waves(self, *nwaves_arrs):
        """True device cost of a batch: the mega kernel's BT-tube blocks
        run until their LAST tube dies, so cost = sum over blocks of
        max(nwaves) (the slot-count occupancy of VERDICT r4 overstated
        waste — early-exited blocks never ran)."""
        from .wave_pallas import BT
        N = self.cfg.n
        nb = max(-(-N // BT), 1)   # test configs may have n < BT
        tot = 0
        for nw in nwaves_arrs:
            pad = np.zeros(nb * BT, np.int64)
            pad[:len(nw)] = nw
            tot += int(pad.reshape(nb, -1).max(axis=1).sum())
        self.stats["block_waves"] += tot

    @property
    def pool(self):
        # the warm gate holds for pre-seeded device pools too: tracing
        # device ops while the background warmup is mid-trace perturbs
        # persistent-cache keys (engine.run re-checks, but first device
        # use may be elsewhere)
        if self.engine._warm_evt is not None:
            self.engine._warm_evt.wait()
        if self._pool is None:
            import jax.numpy as jnp
            self._pool = jnp.asarray(self._pool_words)
            self.engine._pool_np = (self._pool, self._pool_words)
        return self._pool

    _RESCUE_CFGS = (dict(n=32, w=512, chunk=96),
                    dict(n=32, w=2048, chunk=24, max_chunks=2048))

    def _rescue_aligner(self, tier: int = 0):
        """Band-overflow lanes: tubes whose pruned band outgrows the
        main engine's W fall here instead of the scalar host engine (a
        single scalar Local_Alignment on a deep tube costs seconds;
        the wide-band device batch costs milliseconds).  Tier 0 is
        W=512; the rare tube that outgrows even that gets the W=2048
        tier before the scalar engine.  Built lazily — overflows are
        rare — and shared via the engine object so repeated runs reuse
        the compiled kernels."""
        bas = getattr(self.engine, "_rescue_bas", None)
        if bas is None:
            bas = self.engine._rescue_bas = {}
        ra = bas.get(tier)
        if ra is None or ra._pool_words is not self._pool_words:
            kw = dict(self._RESCUE_CFGS[tier])
            kw.setdefault("max_chunks", max(64, self.cfg.max_chunks))
            cfg = wavek.WaveConfig(**kw)
            engs = getattr(self.engine, "_rescue_engs", None)
            if engs is None:
                engs = self.engine._rescue_engs = {}
            reng = engs.get(tier)
            if reng is None:
                reng = wavek.WaveEngine(self.spec, cfg)
                engs[tier] = reng
            ra = BatchAligner(self.spec, self._pool_words, self.offs,
                              self.seq, cfg, engine=reng,
                              pool_dev=self._pool)
            bas[tier] = ra
        return ra

    def _pick_engine(self, nsel: int):
        """The main engine, or its warm small-batch sibling when the
        batch fits: late scheduling rounds carry a handful of
        continuation tubes, and an n=64 chunk kernel runs their waves
        at a fraction of the lane cost.  Cold siblings are skipped (no
        mid-run compile stalls) — their chained background warmup makes
        them available to later runs."""
        s = getattr(self.engine, "_small", None)
        if (s is None or nsel > s.cfg.n
                or s._warm_evt is None or not s._warm_evt.is_set()
                or getattr(s, "_warm_exc", None) is not None):
            return self.engine
        if getattr(s, "_pool_np", None) is None \
                or s._pool_np[0] is not self._pool:
            s._pool_np = (self.pool, self._pool_words)
        from ..utils import prof
        prof.count("batch.small_batches")
        return s

    # -- internals -----------------------------------------------------------

    def _run_dir(self, items: Sequence[WorkItem], dgmin, dgmax, anti,
                 direction: int, overlap=None):
        """One direction over all items (auto-batched); returns per-item
        (result row, per-wave path diagonals) with fallback flags.
        ``overlap`` (exactly-once host work) rides the first batch's
        device window."""
        n = len(items)
        rows = [None] * n
        logs = [None] * n
        fall = np.zeros(n, dtype=bool)
        B = self.cfg.n
        for lo in range(0, n, B):
            sel = list(range(lo, min(lo + B, n)))
            eng = self._pick_engine(len(sel))
            tubes = dict(
                aw=np.array([self.offs[items[i].akey][0] for i in sel], np.int32),
                alen=np.array([items[i].alen for i in sel], np.int32),
                bw=np.array([self.offs[items[i].bkey][0] for i in sel], np.int32),
                blen=np.array([items[i].blen for i in sel], np.int32),
                dgmin=np.array([dgmin[i] for i in sel], np.int32),
                dgmax=np.array([dgmax[i] for i in sel], np.int32),
                anti=np.array([anti[i] for i in sel], np.int32),
                minp=np.array([self._minp(items[i], dgmin[i]) for i in sel],
                              np.int32),
                maxp=np.array([self._maxp(items[i], dgmax[i]) for i in sel],
                              np.int32),
            )
            from ..utils import prof
            with prof.span("batch.engine_run"):
                if hasattr(eng, "submit"):
                    # poll-free path (exact chunk prediction); overlap
                    # work rides between dispatch and the fetch join
                    hdl = eng.submit(self.pool, tubes, direction)
                    if overlap is not None:
                        overlap()
                        overlap = None
                    res, diags = eng.collect(hdl)
                else:
                    res, diags = eng.run(self.pool, tubes, direction,
                                         overlap=overlap)
            overlap = None
            prof.count("batch.tubes", len(sel))
            self.stats["device_waves"] += int(res.nwaves.sum())
            self._count_block_waves(np.asarray(res.nwaves[:len(sel)]))
            for j, i in enumerate(sel):
                rows[i] = tuple(int(f[j]) for f in res[:8])
                fall[i] = bool(res.fallback[j])
                if not fall[i]:
                    tw = int(res.trim_wave[j])
                    logs[i] = diags[:tw + 1, j]
        return rows, logs, fall

    @staticmethod
    def _minp(it: WorkItem, low: int) -> int:
        if it.lbord < 0:
            return 1 if (it.selfie and low >= 0) else -(1 << 30)
        return low - it.lbord

    @staticmethod
    def _maxp(it: WorkItem, hgh: int) -> int:
        if it.hbord < 0:
            return -1 if (it.selfie and hgh <= 0) else (1 << 30)
        return hgh + it.hbord

    # -- streaming pipeline ---------------------------------------------------

    def _tubes_of(self, items, dgmin, dgmax, anti):
        offs = self.offs
        return dict(
            aw=np.array([offs[it.akey][0] for it in items], np.int32),
            alen=np.array([it.alen for it in items], np.int32),
            bw=np.array([offs[it.bkey][0] for it in items], np.int32),
            blen=np.array([it.blen for it in items], np.int32),
            dgmin=np.asarray(dgmin, np.int32),
            dgmax=np.asarray(dgmax, np.int32),
            anti=np.asarray(anti, np.int32),
            minp=np.array([self._minp(it, int(lo)) for it, lo in
                           zip(items, dgmin)], np.int32),
            maxp=np.array([self._maxp(it, int(hi)) for it, hi in
                           zip(items, dgmax)], np.int32),
        )

    def run_stream(self, first, more_fn, max_inflight: int = None):
        """Pipelined Local_Alignment over a dynamic item stream.

        ``first``: initial list of (token, WorkItem).  When an item's
        Path is done, ``more_fn(token, path)`` is called (in submission
        order within each batch) and returns an iterable of new
        (token, WorkItem) pairs unlocked by that result.

        Device batches are dispatched speculatively (engine.submit) and
        collected in FIFO order; the forward pass of batch k+1 computes
        while batch k's reverse pass is assembled, and all host work
        (wave-0 init, trace replays, rerun/fallback handling) runs under
        outstanding device compute.  Results are delivered in a
        deterministic order (per-token order depends only on the item
        stream, not on batching).
        """
        import heapq
        import itertools
        import os
        from collections import deque

        from ..utils import prof

        if max_inflight is None:
            max_inflight = int(os.environ.get("FASTGA_TPU_INFLIGHT",
                                              "4"))
        from concurrent.futures import ThreadPoolExecutor
        disp = ThreadPoolExecutor(max_workers=1)   # ordered dispatch

        def resolve(e):
            """Handle of an inflight entry (joins its dispatch)."""
            if "h" not in e:
                e["h"] = e["f"].result()
            return e["h"]
        eng = self.engine
        B = self.cfg.n
        tspace = self.spec.trace_space
        # min-heap on expected wave count (hintless items last): batches
        # die together, so the chunk budget fits every tube in the batch
        # instead of its stragglers (occupancy).  A heap instead of a
        # per-batch full sort: `ready` starts at one item per pairing
        # queue (~1 per tube — 100k+ at bench scale) and a sort per
        # take() was O(R log R) per batch.
        _tick = itertools.count()
        ready = []
        inflight = deque()   # entries: dict(kind='fwd'|'rev', ...)
        use_pair = bool(getattr(eng, "supports_pair", False))

        def take(k):
            """Pop the k items with the lowest expected wave counts."""
            k = min(k, len(ready))
            return [heapq.heappop(ready)[3] for _ in range(k)]

        # -- long lane: items whose expected wave count exceeds the wide
        # batch budget run on the narrow sibling engine with a budget of
        # their own.  One 10k-wave alignment in an n=512 batch drags 512
        # lanes through 100+ chunks (the r3 bench: batch p50 ~110 waves,
        # max up to 9828); here it costs 64 lanes with an exact budget.
        CW = self.cfg.chunk
        cap_big = int(os.environ.get("FASTGA_TPU_PRED_CAP", "8"))
        cap_long = int(os.environ.get("FASTGA_TPU_PRED_CAP_LONG", "64"))
        long_T = int((cap_big * CW - 32) / 1.3)
        long_ready = []
        SL = getattr(getattr(eng, "_small", None), "cfg", self.cfg).n

        def push(ti):
            if use_pair and ti[1].waves_hint > long_T \
                    and ti[1].hint_measured:
                heapq.heappush(long_ready,
                               (ti[1].waves_hint, next(_tick), ti))
            else:
                heapq.heappush(ready, (ti[1].waves_hint < 0,
                                       ti[1].waves_hint, next(_tick),
                                       ti))

        def take_long(k):
            k = min(k, len(long_ready))
            return [heapq.heappop(long_ready)[2] for _ in range(k)]

        for ti in first:
            push(ti)

        def _long_engine():
            s = getattr(eng, "_small", None)
            if (not use_pair or s is None
                    or s._warm_evt is None or not s._warm_evt.is_set()
                    or getattr(s, "_warm_exc", None) is not None):
                return None
            if getattr(s, "_pool_np", None) is None \
                    or s._pool_np[0] is not self.pool:
                s._pool_np = (self.pool, self._pool_words)
            return s

        def submit_long(batch):
            s = _long_engine()
            if s is None:       # cold sibling: wide engine, old budget
                submit_pair(batch, force_cap=cap_big)
                return
            with prof.span("stream.submit_long"):
                tokens = [t for t, _ in batch]
                items = [it for _, it in batch]
                n = len(items)
                hgh = np.array([it.dgmax for it in items], np.int64)
                anti = np.array([it.anti for it in items], np.int64)
                low = np.array([it.dgmin for it in items], np.int64)
                for i in range(n):
                    while ((anti[i] - hgh[i]) >> 1) < 0:
                        hgh[i] -= 1
                tubes = self._tubes_of(items, low, hgh, anti)
                mh = max(max(it.waves_hint for it in items), 0)
                ph = min(int(mh * 1.3 + 2 * CW) // CW + 1, cap_long,
                         s.cfg.max_chunks)
                f = disp.submit(s.submit_pair, self.pool, tubes,
                                pred_hint=ph, pred_cap=cap_long)
                self.stats["items"] += n
                prof.count("batch.long_tubes", n)
                inflight.append(dict(kind="pair", f=f, eng=s,
                                     tokens=tokens, items=items,
                                     anti=anti, long=True))

        def submit_pair(batch, force_cap=None):
          with prof.span("stream.submit_fwd"):
            tokens = [t for t, _ in batch]
            items = [it for _, it in batch]
            n = len(items)
            hgh = np.array([it.dgmax for it in items], np.int64)
            anti = np.array([it.anti for it in items], np.int64)
            low = np.array([it.dgmin for it in items], np.int64)
            for i in range(n):
                while ((anti[i] - hgh[i]) >> 1) < 0:
                    hgh[i] -= 1
            tubes = self._tubes_of(items, low, hgh, anti)
            hints = [it.waves_hint for it in items]
            ph = None
            cap1 = force_cap
            if all(hh >= 0 for hh in hints):
                # tight: under-predicted stragglers are decapitated and
                # requeued on the narrow engine, so the budget fits the
                # batch's bulk, not its tail
                ph = int(max(hints) * 1.3 + 32) // CW + 1
                if cap1 is None and _long_engine() is not None:
                    # hard first-pass cap (measured r5: true wave counts
                    # have p90 ~216 but heavy tails the hint cannot
                    # rank; capping every wide batch at 4 chunks and
                    # requeueing survivors beats budgeting for the
                    # predicted max — and quarters the packed-result
                    # transfer)
                    cap1 = int(os.environ.get(
                        "FASTGA_TPU_PASS1_CAP", "4"))
            f = disp.submit(eng.submit_pair, self.pool, tubes,
                            pred_hint=ph, pred_cap=cap1)
            self.stats["items"] += n
            prof.count("batch.tubes", n)
            inflight.append(dict(kind="pair", f=f, eng=eng,
                                 tokens=tokens, items=items, anti=anti,
                                 long=False))

        def _pair_replays_singly(items, anti, host, paths,
                                 res_f, diags_f, res_r, diags_r,
                                 only=None):
            """Per-item replay fallback (native-lib-less or batch
            capacity retry); mirrors the batched call's semantics."""
            n = len(items)
            tw_f = res_f.trim_wave
            tw_r = res_r.trim_wave
            idxs = range(n) if only is None else only
            for i in idxs:
                if host[i]:
                    continue
                try:
                    wrep.replay_forward(
                        self.seq(items[i].akey),
                        self.seq(items[i].bkey),
                        int(anti[i]),
                        int(items[i].alen % tspace
                            if items[i].acomp else 0),
                        diags_f[:int(tw_f[i]) + 1, i],
                        int(res_f.trima[i]), int(res_f.trimx[i]),
                        int(res_f.trimd[i]), paths[i], tspace)
                    wrep.replay_reverse(
                        self.seq(items[i].akey),
                        self.seq(items[i].bkey),
                        int(anti[i]),
                        int(items[i].alen % tspace
                            if items[i].acomp else 0),
                        diags_r[:int(tw_r[i]) + 1, i],
                        int(res_r.trima[i]), int(res_r.trimx[i]),
                        int(res_r.trimd[i]), paths[i], tspace)
                except AssertionError:
                    host[i] = True
                    paths[i] = Path()

        def on_pair(e):
          with prof.span("stream.on_pair"):
            (res_f, diags_f), (res_r, diags_r) = e["res"]
            items = e["items"]
            n = len(items)
            anti = e["anti"]
            self.stats["device_waves"] += int(res_f.nwaves.sum())
            self.stats["device_waves"] += int(res_r.nwaves.sum())
            self._count_block_waves(np.asarray(res_f.nwaves[:n]),
                                    np.asarray(res_r.nwaves[:n]))
            host = (np.asarray(res_f.fallback[:n])
                    | np.asarray(res_r.fallback[:n])).copy()
            if res_f.budget is not None:
                bud = (np.asarray(res_f.budget[:n])
                       | np.asarray(res_r.budget[:n]))
                self.stats["fall_budget"] = self.stats.get(
                    "fall_budget", 0) + int(bud.sum())
                self.stats["fall_band"] = self.stats.get(
                    "fall_band", 0) + int((host & ~bud).sum())
            req = e["h"].get("requeue")
            if req is not None:
                # decapitated stragglers: resubmit on the long lane with
                # the consumed budget as the floor of the new hint
                host &= ~req
                hh = e["h"]
                spent = (hh["k"] if hh.get("fused")
                         else max(len(hh["chs_f"]),
                                  len(hh["chs_r"]))) * CW
                for i in np.flatnonzero(req):
                    it = items[i]
                    self.stats["requeues"] += 1
                    nit = WorkItem(it.akey, it.bkey, it.dgmin, it.dgmax,
                                   it.anti, it.acomp, it.alen, it.blen,
                                   selfie=it.selfie, lbord=it.lbord,
                                   hbord=it.hbord,
                                   waves_hint=spent * 2,
                                   hint_measured=True)
                    heapq.heappush(long_ready,
                                   (spent * 2, next(_tick),
                                    (e["tokens"][i], nit)))
            paths = [Path() for _ in range(n)]
            skiprep = host if req is None else (host | req)
            with prof.span("batch.replay"):
                aoffs = np.array(
                    [it.alen % tspace if it.acomp else 0
                     for it in items], np.int64)
                out = wrep.replay_pair_batch(
                    [self.seq(it.akey) for it in items],
                    [self.seq(it.bkey) for it in items],
                    anti[:n], aoffs, tspace,
                    diags_f, res_f.trim_wave[:n],
                    res_f.trima[:n], res_f.trimx[:n], res_f.trimd[:n],
                    diags_r, res_r.trim_wave[:n],
                    res_r.trima[:n], res_r.trimx[:n], res_r.trimd[:n],
                    skiprep)
                if out is None:
                    _pair_replays_singly(
                        items, anti, host, paths,
                        res_f, diags_f, res_r, diags_r,
                        only=np.flatnonzero(~skiprep))
                else:
                    tr, troff, pstats, rcs = out
                    retry = []
                    for i in range(n):
                        if skiprep[i]:
                            continue
                        rc = int(rcs[i])
                        if rc == -3:
                            retry.append(i)
                            continue
                        if rc != 0:
                            host[i] = True
                            continue
                        p = paths[i]
                        (p.abpos, p.bbpos, p.aepos, p.bepos,
                         p.diffs) = (int(pstats[i, 0]),
                                     int(pstats[i, 1]),
                                     int(pstats[i, 2]),
                                     int(pstats[i, 3]),
                                     int(pstats[i, 4]))
                        seg = tr[2 * int(troff[i]):2 * int(troff[i + 1])]
                        p.trace = list(map(tuple,
                                           seg.reshape(-1, 2).tolist()))
                    if retry:
                        _pair_replays_singly(
                            items, anti, host, paths,
                            res_f, diags_f, res_r, diags_r, only=retry)
            fshort = np.array([(p.aepos + p.bepos) - anti[i] < DUB_TRIM
                               for i, p in enumerate(paths)])
            rshort = np.array([anti[i] - (p.abpos + p.bbpos) < DUB_TRIM
                               for i, p in enumerate(paths)])
            rb = dict(items=items, paths=paths, host=host,
                      tokens=e["tokens"],
                      fwd_nw=np.asarray(res_f.nwaves[:n]),
                      rev_nw=np.asarray(res_r.nwaves[:n]))
            fwdr, revr, done = [], [], []
            for i in range(n):
                if req is not None and req[i]:
                    continue   # resubmitted on the long lane
                if host[i]:
                    done.append(i)
                elif fshort[i] and rshort[i]:
                    p = paths[i]
                    p.aepos = p.abpos = (p.abpos + p.aepos) >> 1
                    p.bepos = p.bbpos = (p.bbpos + p.bepos) >> 1
                    p.trace = []
                    done.append(i)
                elif fshort[i]:
                    fwdr.append(i)
                elif rshort[i]:
                    revr.append(i)
                else:
                    done.append(i)
            finalize(rb, done)
            self.stats["rerun_fwd"] += len(fwdr)
            self.stats["rerun_rev"] += len(revr)
            if fwdr:
                submit_rerun(rb, fwdr, +1)
            if revr:
                submit_rerun(rb, revr, -1)

        def submit_fwd(batch):
          if use_pair:
            submit_pair(batch)
            return
          with prof.span("stream.submit_fwd"):
            tokens = [t for t, _ in batch]
            items = [it for _, it in batch]
            n = len(items)
            hgh = np.array([it.dgmax for it in items], np.int64)
            anti = np.array([it.anti for it in items], np.int64)
            low = np.array([it.dgmin for it in items], np.int64)
            for i in range(n):
                while ((anti[i] - hgh[i]) >> 1) < 0:
                    hgh[i] -= 1
            tubes = self._tubes_of(items, low, hgh, anti)
            CW = self.cfg.chunk
            hints = [it.waves_hint for it in items]
            ph = None
            if all(hh >= 0 for hh in hints):
                # items carry expected wave counts: budget the batch for
                # its own stragglers (bias up — an under-prediction
                # costs a blocking continuation round)
                ph = int(max(hints) * 1.5 + 64) // CW + 1
            f = disp.submit(eng.submit, self.pool, tubes, +1,
                            pred_hint=ph)
            self.stats["items"] += n
            prof.count("batch.tubes", n)
            inflight.append(dict(kind="fwd", f=f, tokens=tokens,
                                 items=items, anti=anti, low=low,
                                 hgh=hgh))

        def on_fwd(fb):
          with prof.span("stream.on_fwd"):
            res, diags = fb["res"]
            items = fb["items"]
            n = len(items)
            self.stats["device_waves"] += int(res.nwaves.sum())
            self._count_block_waves(np.asarray(res.nwaves[:n]))
            host = np.asarray(res.fallback[:n]).copy()
            # the reverse seam = the forward path's wave-0 diagonal
            seam = np.where(host, 0, diags[0][:n]).astype(np.int64)
            # dispatch the reverse pass NOW (device work first), then do
            # the forward replays under it; the forward pass's measured
            # wave counts predict the reverse budget almost exactly
            tubes = self._tubes_of(items, seam, seam, fb["anti"])
            CW = self.cfg.chunk
            ph = (int(res.nwaves[:n].max()) * 7 // 5 + 64) // CW + 1 \
                if n else 1
            h2 = eng.submit(self.pool, tubes, -1, pred_hint=ph)
            paths = [Path() for _ in range(n)]
            trima, trimx, trimd = res.trima, res.trimx, res.trimd
            tw = res.trim_wave
            with prof.span("batch.replay_fwd"):
                for i in range(n):
                    if host[i]:
                        continue
                    try:
                        wrep.replay_forward(
                            self.seq(items[i].akey),
                            self.seq(items[i].bkey),
                            int(fb["anti"][i]),
                            int(items[i].alen % tspace
                                if items[i].acomp else 0),
                            diags[:int(tw[i]) + 1, i],
                            int(trima[i]), int(trimx[i]), int(trimd[i]),
                            paths[i], tspace)
                    except AssertionError:
                        host[i] = True
                        paths[i] = Path()
            inflight.append(dict(kind="rev", h=h2, tokens=fb["tokens"],
                                 items=items, anti=fb["anti"],
                                 paths=paths, host=host,
                                 fwd_nw=np.asarray(res.nwaves[:n])))

        def on_rev(rb):
          with prof.span("stream.on_rev"):
            res, diags = rb["res"]
            items = rb["items"]
            n = len(items)
            anti = rb["anti"]
            paths = rb["paths"]
            host = rb["host"]
            self.stats["device_waves"] += int(res.nwaves.sum())
            self._count_block_waves(np.asarray(res.nwaves[:n]))
            host |= np.asarray(res.fallback[:n])
            fshort = np.array([(p.aepos + p.bepos) - anti[i] < DUB_TRIM
                               for i, p in enumerate(paths)])
            with prof.span("batch.replay_rev"):
                for i in range(n):
                    if host[i]:
                        continue
                    tw = int(res.trim_wave[i])
                    try:
                        wrep.replay_reverse(
                            self.seq(items[i].akey),
                            self.seq(items[i].bkey),
                            int(anti[i]),
                            int(items[i].alen % tspace
                                if items[i].acomp else 0),
                            diags[:tw + 1, i],
                            int(res.trima[i]), int(res.trimx[i]),
                            int(res.trimd[i]), paths[i], tspace)
                    except AssertionError:
                        host[i] = True
                        paths[i] = Path()
            rshort = np.array([anti[i] - (p.abpos + p.bbpos) < DUB_TRIM
                               for i, p in enumerate(paths)])
            rb["rev_nw"] = np.asarray(res.nwaves[:n])
            # DUB_TRIM short-pass classification (align.c:1508-1532):
            # both-short items collapse to their midpoint; one-sided
            # shorts rerun that direction as pipelined batches
            fwdr, revr, done = [], [], []
            for i in range(n):
                if host[i]:
                    done.append(i)
                elif fshort[i] and rshort[i]:
                    p = paths[i]
                    p.aepos = p.abpos = (p.abpos + p.aepos) >> 1
                    p.bepos = p.bbpos = (p.bbpos + p.bepos) >> 1
                    p.trace = []
                    done.append(i)
                elif fshort[i]:
                    fwdr.append(i)
                elif rshort[i]:
                    revr.append(i)
                else:
                    done.append(i)
            finalize(rb, done)
            self.stats["rerun_fwd"] += len(fwdr)
            self.stats["rerun_rev"] += len(revr)
            if fwdr:
                submit_rerun(rb, fwdr, +1)
            if revr:
                submit_rerun(rb, revr, -1)

        def submit_rerun(rb, idxs, direction):
            items = rb["items"]
            paths = rb["paths"]
            its = [items[i] for i in idxs]
            if direction > 0:
                low2 = np.array([paths[i].abpos - paths[i].bbpos
                                 for i in idxs], np.int64)
                anti2 = np.array([paths[i].abpos + paths[i].bbpos
                                  for i in idxs], np.int64)
                for i in idxs:
                    paths[i].trace = []
            else:
                low2 = np.array([paths[i].aepos - paths[i].bepos
                                 for i in idxs], np.int64)
                anti2 = np.array([paths[i].aepos + paths[i].bepos
                                  for i in idxs], np.int64)
                for i in idxs:
                    paths[i].trace = []
                    paths[i].diffs = 0
            tubes = self._tubes_of(its, low2, low2, anti2)
            h = eng.submit(self.pool, tubes, direction, pred_hint=2)
            inflight.append(dict(kind="rr", h=h, rb=rb, idxs=idxs,
                                 dir=direction, anti2=anti2))

        def on_rr(e):
            res, diags = e["res"]
            rb = e["rb"]
            items, paths, host = rb["items"], rb["paths"], rb["host"]
            self.stats["device_waves"] += int(res.nwaves.sum())
            fall = np.asarray(res.fallback)
            for j, i in enumerate(e["idxs"]):
                if fall[j]:
                    host[i] = True
                    paths[i] = Path()
                    continue
                tw = int(res.trim_wave[j])
                rep = wrep.replay_forward if e["dir"] > 0 \
                    else wrep.replay_reverse
                try:
                    rep(self.seq(items[i].akey), self.seq(items[i].bkey),
                        int(e["anti2"][j]),
                        int(items[i].alen % tspace
                            if items[i].acomp else 0),
                        diags[:tw + 1, j],
                        int(res.trima[j]), int(res.trimx[j]),
                        int(res.trimd[j]), paths[i], tspace)
                except AssertionError:
                    host[i] = True
                    paths[i] = Path()
            finalize(rb, e["idxs"])

        rescue = []   # (rb, i): device-flagged tubes awaiting the
        # W=512 band-overflow lane (flushed when the pipeline drains)

        def finalize(rb, idxs):
            """Complement reflection and result delivery for a subset
            of a batch's items (per-queue order is preserved: a queue
            has at most one item in flight).  Device-flagged items
            defer to the wide-band rescue lane — their queues simply
            pause until the flush."""
            items, paths, host = rb["items"], rb["paths"], rb["host"]
            deliver = []
            for i in idxs:
                if host[i]:
                    rescue.append((rb, i))
                else:
                    deliver.append(i)
            for i in deliver:
                if items[i].acomp:
                    p = paths[i]
                    a0 = p.abpos
                    p.abpos = items[i].alen - p.aepos
                    p.aepos = items[i].alen - a0
                    b0 = p.bbpos
                    p.bbpos = items[i].blen - p.bepos
                    p.bepos = items[i].blen - b0
                    p.trace.reverse()
            fwd_nw = rb["fwd_nw"]
            rev_nw = rb["rev_nw"]
            out = []
            for i in deliver:
                out.extend(more_fn(rb["tokens"][i], paths[i],
                                   int(max(fwd_nw[i], rev_nw[i]))))
            for ti in out:
                push(ti)

        def flush_rescue():
            batch = rescue[:]
            del rescue[:]
            items = [rb["items"][i] for rb, i in batch]
            self.stats["rescued"] = self.stats.get("rescued", 0) \
                + len(items)
            import os as _os
            dump = _os.environ.get("FASTGA_TPU_RESCUE_DUMP")
            if dump:
                import pickle
                with open(dump, "ab") as fh:
                    pickle.dump([(it, self.seq(it.akey),
                                  self.seq(it.bkey)) for it in items],
                                fh)
            with prof.span("batch.rescue"):
                ra = self._rescue_aligner(0)
                paths, still = ra.run(items, defer_fallback=True)
                if still.any():
                    ra2 = self._rescue_aligner(1)
                    idx = np.flatnonzero(still)
                    self.stats["rescued2"] = self.stats.get(
                        "rescued2", 0) + len(idx)
                    p2 = ra2.run([items[i] for i in idx])
                    for j, i in enumerate(idx):
                        paths[i] = p2[j]
                    self.stats["fallbacks"] += ra2.stats["fallbacks"]
                    ra2.stats["fallbacks"] = 0
            out = []
            for (rb, i), p in zip(batch, paths):
                rb["paths"][i] = p
                out.extend(more_fn(
                    rb["tokens"][i], p,
                    int(max(rb["fwd_nw"][i], rb["rev_nw"][i]))))
            for ti in out:
                push(ti)

        try:
            while ready or long_ready or inflight or rescue:
                # keep the device fed: submit full batches up to the window
                while len(ready) >= B and len(inflight) < max_inflight:
                    submit_fwd(take(B))
                # long lane: its items run the longest — dispatch full
                # narrow batches early so they overlap the bulk
                while len(long_ready) >= SL and len(inflight) < max_inflight:
                    submit_long(take_long(SL))
                if not inflight:
                    if ready:
                        submit_fwd(take(min(B, len(ready))))
                    if long_ready:
                        submit_long(take_long(min(SL, len(long_ready))))
                    if not ready and not long_ready and rescue:
                        flush_rescue()
                    continue
                # drain the tail: nothing ready and only one batch in
                # flight -> a partial batch keeps the pipeline deep enough
                if (ready and len(inflight) < 2
                        and len(ready) + sum(len(e.get("items",
                                                   e.get("idxs", ())))
                                             for e in inflight) <= 2 * B):
                    submit_fwd(take(min(B, len(ready))))
                elif long_ready and len(inflight) < 2:
                    submit_long(take_long(min(SL, len(long_ready))))
                # completion-order collection: joining the FIFO head
                # serialized all host work behind the slowest fetch while
                # completed batches sat in the deque; pick any batch whose
                # dispatch AND result fetch are done, and only block on the
                # oldest when none is ready (true starvation)
                def _fetched(c):
                    if "h" not in c:
                        if c.get("f") is None or not c["f"].done():
                            return False
                        resolve(c)
                    h = c["h"]
                    while isinstance(h, dict) and "chain" in h:
                        h = h["chain"]
                    ft = h.get("fetcher") if isinstance(h, dict) else None
                    return ft is None or not ft.is_alive()

                e = None
                for _ in range(len(inflight)):
                    c = inflight.popleft()
                    if _fetched(c):
                        e = c
                        break
                    inflight.append(c)
                if e is None:
                    e = inflight.popleft()
                ceng = e.get("eng", eng)
                if e["kind"] == "pair":
                    r = ceng.collect_pair(
                        resolve(e), wait=False,
                        requeue=(not e.get("long")
                                 and _long_engine() is not None))
                else:
                    r = ceng.collect(resolve(e), wait=False)
                if r is None:
                    # straggler continuation dispatched; keep the pipeline
                    # moving on other batches while its fetch runs
                    inflight.append(e)
                    continue
                e["res"] = r
                if e["kind"] == "pair":
                    on_pair(e)
                elif e["kind"] == "fwd":
                    on_fwd(e)
                elif e["kind"] == "rev":
                    on_rev(e)
                else:
                    on_rr(e)
        finally:
            # cancel queued dispatches on error so interpreter
            # exit does not block joining the worker
            disp.shutdown(wait=False, cancel_futures=True)

    def _short_reruns(self, items, paths, host, fshort, rshort, anti):
        """DUB_TRIM short-pass reruns (align.c:1508-1532), synchronous
        (rare — a few % of items)."""
        n = len(items)
        both = [i for i in range(n)
                if not host[i] and fshort[i] and rshort[i]]
        for i in both:
            p = paths[i]
            p.aepos = p.abpos = (p.abpos + p.aepos) >> 1
            p.bepos = p.bbpos = (p.bbpos + p.bepos) >> 1
            p.trace = []
        fwd_rerun = [i for i in range(n)
                     if not host[i] and fshort[i] and not rshort[i]]
        rev_rerun = [i for i in range(n)
                     if not host[i] and not fshort[i] and rshort[i]]
        tspace = self.spec.trace_space
        self.stats["rerun_fwd"] += len(fwd_rerun)
        self.stats["rerun_rev"] += len(rev_rerun)
        if fwd_rerun:
            its = [items[i] for i in fwd_rerun]
            low2 = np.array([paths[i].abpos - paths[i].bbpos
                             for i in fwd_rerun], np.int64)
            anti2 = np.array([paths[i].abpos + paths[i].bbpos
                              for i in fwd_rerun], np.int64)
            for i in fwd_rerun:
                paths[i].trace = []
            rows, logs, fall = self._run_dir(its, low2, low2, anti2, +1)
            for j, i in enumerate(fwd_rerun):
                if fall[j]:
                    host[i] = True
                    paths[i] = Path()
                    continue
                (trima, trimx, trimd, twave, tslot, kb0, nw, fb) = rows[j]
                try:
                    wrep.replay_forward(
                        self.seq(items[i].akey), self.seq(items[i].bkey),
                        int(anti2[j]),
                        int(items[i].alen % tspace
                            if items[i].acomp else 0),
                        logs[j], trima, trimx, trimd, paths[i], tspace)
                except AssertionError:
                    host[i] = True
                    paths[i] = Path()
        if rev_rerun:
            its = [items[i] for i in rev_rerun]
            low2 = np.array([paths[i].aepos - paths[i].bepos
                             for i in rev_rerun], np.int64)
            anti2 = np.array([paths[i].aepos + paths[i].bepos
                              for i in rev_rerun], np.int64)
            for i in rev_rerun:
                paths[i].trace = []
                paths[i].diffs = 0
            rows, logs, fall = self._run_dir(its, low2, low2, anti2, -1)
            for j, i in enumerate(rev_rerun):
                if fall[j]:
                    host[i] = True
                    paths[i] = Path()
                    continue
                (trima, trimx, trimd, twave, tslot, kb0, nw, fb) = rows[j]
                try:
                    wrep.replay_reverse(
                        self.seq(items[i].akey), self.seq(items[i].bkey),
                        int(anti2[j]),
                        int(items[i].alen % tspace
                            if items[i].acomp else 0),
                        logs[j], trima, trimx, trimd, paths[i], tspace)
                except AssertionError:
                    host[i] = True
                    paths[i] = Path()

    def _host_fallbacks(self, items, paths, host):
        from ..utils import prof
        with prof.span("batch.host_fallback"):
            for i in np.flatnonzero(host):
                self.stats["fallbacks"] += 1
                it = items[i]
                paths[i] = local_alignment(
                    self.spec, self.seq(it.akey), self.seq(it.bkey),
                    it.dgmin, it.dgmax, it.anti, it.lbord, it.hbord,
                    selfie=it.selfie, acomp=it.acomp, alen=it.alen,
                    blen=it.blen)

    def _acomp_flip(self, items, paths, host):
        for i in range(len(items)):
            if host[i] or not items[i].acomp:
                continue
            p = paths[i]
            a0 = p.abpos
            p.abpos = items[i].alen - p.aepos
            p.aepos = items[i].alen - a0
            b0 = p.bbpos
            p.bbpos = items[i].blen - p.bepos
            p.bepos = items[i].blen - b0
            p.trace.reverse()

    # -- public --------------------------------------------------------------

    def run(self, items: Sequence[WorkItem],
            defer_fallback: bool = False):
        """Synchronous batch; returns paths (or (paths, host-mask)
        with ``defer_fallback``, leaving device-flagged items to the
        caller instead of the scalar engine)."""
        n = len(items)
        self.stats["items"] += n
        paths = [Path() for _ in range(n)]
        if n == 0:
            return (paths, np.zeros(0, bool)) if defer_fallback \
                else paths
        tspace = self.spec.trace_space

        hgh = np.array([it.dgmax for it in items], np.int64)
        anti = np.array([it.anti for it in items], np.int64)
        low = np.array([it.dgmin for it in items], np.int64)
        aoff = np.array([it.alen % tspace if it.acomp else 0
                         for it in items], np.int64)
        # clamp hgh so the start point has y >= 0 (align.c:1463)
        for i in range(n):
            while ((anti[i] - hgh[i]) >> 1) < 0:
                hgh[i] -= 1

        host = np.zeros(n, dtype=bool)   # exact-host fallback set
        from ..utils import prof

        # ---- forward pass ----
        rows, logs, fall = self._run_dir(items, low, hgh, anti, +1)
        host |= fall
        # the seam the reverse wave starts from is the forward path's
        # wave-0 diagonal — already in the device backtrack (diags[0]);
        # replay_forward returns the same value, so the reverse batch
        # can dispatch immediately and the forward replays run as the
        # engine's overlap work inside its device window
        seam = np.zeros(n, np.int64)
        for i in range(n):
            if not host[i] and logs[i] is not None and len(logs[i]):
                seam[i] = int(logs[i][0])
        rows_f, logs_f = rows, logs

        def _fwd_replays():
            with prof.span("batch.replay_fwd"):
                for i in range(n):
                    if host[i]:
                        continue
                    (trima, trimx, trimd, twave, tslot, kb0, nw,
                     fb) = rows_f[i]
                    A = self.seq(items[i].akey)
                    Bs = self.seq(items[i].bkey)
                    try:
                        wrep.replay_forward(
                            A, Bs, int(anti[i]), int(aoff[i]),
                            logs_f[i], trima, trimx, trimd, paths[i],
                            tspace)
                    except AssertionError:
                        host[i] = True
                        paths[i] = Path()

        # ---- reverse pass (from the forward seam diagonal) ----
        rows, logs, fall = self._run_dir(items, seam, seam, anti, -1,
                                         overlap=_fwd_replays)
        host |= fall

        fshort = np.array([(p.aepos + p.bepos) - anti[i] < DUB_TRIM
                           for i, p in enumerate(paths)])
        with prof.span("batch.replay_rev"):
            for i in range(n):
                if host[i]:
                    continue
                (trima, trimx, trimd, twave, tslot, kb0, nw, fb) = rows[i]
                A = self.seq(items[i].akey)
                Bs = self.seq(items[i].bkey)
                try:
                    wrep.replay_reverse(
                        A, Bs, int(anti[i]), int(aoff[i]), logs[i],
                        trima, trimx, trimd, paths[i], tspace)
                except AssertionError:
                    host[i] = True
                    paths[i] = Path()

        rshort = np.array([anti[i] - (p.abpos + p.bbpos) < DUB_TRIM
                           for i, p in enumerate(paths)])

        # ---- short-pass reruns (align.c:1508-1532) ----
        fwd_rerun = [i for i in range(n)
                     if not host[i] and fshort[i] and not rshort[i]]
        rev_rerun = [i for i in range(n)
                     if not host[i] and not fshort[i] and rshort[i]]
        both = [i for i in range(n)
                if not host[i] and fshort[i] and rshort[i]]
        for i in both:
            p = paths[i]
            p.aepos = p.abpos = (p.abpos + p.aepos) >> 1
            p.bepos = p.bbpos = (p.bbpos + p.bepos) >> 1
            p.trace = []

        self.stats["rerun_fwd"] += len(fwd_rerun)
        self.stats["rerun_rev"] += len(rev_rerun)
        if fwd_rerun:
            its = [items[i] for i in fwd_rerun]
            low2 = np.array([paths[i].abpos - paths[i].bbpos
                             for i in fwd_rerun], np.int64)
            anti2 = np.array([paths[i].abpos + paths[i].bbpos
                              for i in fwd_rerun], np.int64)
            for i in fwd_rerun:
                paths[i].trace = []
            rows, logs, fall = self._run_dir(its, low2, low2, anti2, +1)
            for j, i in enumerate(fwd_rerun):
                if fall[j]:
                    host[i] = True
                    paths[i] = Path()
                    continue
                (trima, trimx, trimd, twave, tslot, kb0, nw, fb) = rows[j]
                try:
                    wrep.replay_forward(
                        self.seq(items[i].akey), self.seq(items[i].bkey),
                        int(anti2[j]), int(aoff[i]), logs[j],
                        trima, trimx, trimd, paths[i], tspace)
                except AssertionError:
                    host[i] = True
                    paths[i] = Path()

        if rev_rerun:
            its = [items[i] for i in rev_rerun]
            low2 = np.array([paths[i].aepos - paths[i].bepos
                             for i in rev_rerun], np.int64)
            anti2 = np.array([paths[i].aepos + paths[i].bepos
                              for i in rev_rerun], np.int64)
            for i in rev_rerun:
                paths[i].trace = []
                paths[i].diffs = 0
            rows, logs, fall = self._run_dir(its, low2, low2, anti2, -1)
            for j, i in enumerate(rev_rerun):
                if fall[j]:
                    host[i] = True
                    paths[i] = Path()
                    continue
                (trima, trimx, trimd, twave, tslot, kb0, nw, fb) = rows[j]
                try:
                    wrep.replay_reverse(
                        self.seq(items[i].akey), self.seq(items[i].bkey),
                        int(anti2[j]), int(aoff[i]), logs[j],
                        trima, trimx, trimd, paths[i], tspace)
                except AssertionError:
                    host[i] = True
                    paths[i] = Path()

        # ---- exact-host fallback ----
        if not defer_fallback:
            with prof.span("batch.host_fallback"):
                for i in np.flatnonzero(host):
                    self.stats["fallbacks"] += 1
                    it = items[i]
                    paths[i] = local_alignment(
                        self.spec, self.seq(it.akey),
                        self.seq(it.bkey),
                        it.dgmin, it.dgmax, it.anti, it.lbord,
                        it.hbord,
                        selfie=it.selfie, acomp=it.acomp, alen=it.alen,
                        blen=it.blen)
                    # host path includes the acomp flip
                    host[i] = True
        flipped = host if not defer_fallback else host.copy()

        # ---- A-complement reflection (align.c:1534-1557) ----
        for i in range(n):
            if flipped[i] or not items[i].acomp:
                continue
            p = paths[i]
            a0 = p.abpos
            p.abpos = items[i].alen - p.aepos
            p.aepos = items[i].alen - a0
            b0 = p.bbpos
            p.bbpos = items[i].blen - p.bepos
            p.bepos = items[i].blen - b0
            p.trace.reverse()

        if defer_fallback:
            return paths, host
        return paths
