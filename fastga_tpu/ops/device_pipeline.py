"""Device seed pipeline: GIX build + adaptamer merge + chain sweep on TPU.

Gather-free formulation.  TPU gathers/scatters run on the sparse core at
~25M elem/s, so the v1 pipeline (binary searches + reorder gathers) was
slower than host numpy.  v2 expresses every join as a combined-stream
sort whose KEYS carry the payload, and every neighbourhood computation as
rolls + segmented scans:

- per-genome GIX entries: one all-keys `lax.sort` (syncmer candidates per
  position; payload reconstructed from the sorted keys);
- adaptamer merge: T1-forward and T2 entries are packed into two int64
  keys and sorted as ONE stream; insertion ranks are a cumsum, neighbour
  LCPs are segmented min-scans over adjacent-row LCPs, and the reference's
  freq-capped group windows come from T2-space rolling minima of the
  adjacent-LCP array, transported to T1 rows by fill scans (pack the value
  under a monotone segment tag, cummax, unpack);
- ragged seed expansion: one scatter of chain starts + cumsum + three
  final payload gathers (bounded, seed-count sized);
- chain sweep: the bucket-pair segmentation with payload packed into the
  sort keys and all per-chain aggregates as stacked segmented scans.

Semantics are bit-identical to the host pipeline (ops/merge.py,
ops/chain.py); tests/test_device_pipeline.py asserts TubeBatch equality.
Static shapes throughout: base counts pad to {2^k, 1.5*2^k} buckets so
each size class compiles once and hits the persistent cache.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

from .constants import COMP, KMER, SMER, SOFF, TMAP, TMER

F = 10  # adaptamer frequency cap (reference -f default; merge window cap)

_I32MAX = np.int32(0x7FFFFFFF)
_I64MAX = np.int64(0x7FFFFFFFFFFFFFFF)

NPREFIX = 1 << 24         # 24-bit kmer prefix space (panel granularity)
MAX_CONT = 1 << 12        # contig-rank field width (reference envelope:
MAX_POST = 1 << 28        # "at most several thousand contigs")
MAX_FREQ = 10             # device freq cap (window-min packing: 6+3
                          # six-bit values per value word); higher -f
                          # falls back to the host merge

# Why the last device_tubes* call declined (returned None); the driver
# (models/aligner.py) surfaces it on stderr and in stats so cap-based
# host fallbacks are never silent (reference accepts any -f / contig
# count: FastGA.c:4451-4459).
DECLINE = None


def _decline(reason):
    global DECLINE
    DECLINE = reason
    return None


def _jx():
    import jax
    import jax.numpy as jnp
    return jax, jnp


# ---------------------------------------------------------------------------
# Section 1: GIX table arrays on device
# ---------------------------------------------------------------------------

def entry_candidates(jnp, bases, loc, ln, cranks, in_block):
    """Syncmer entry candidates for a run of positions (jit-traceable).

    bases: int32[L] base codes (garbage across contig seams is fine —
    uses are masked to in-contig windows); loc/ln: contig-relative
    position and contig length per position; cranks: contig length-rank
    per position; in_block: positions this caller owns (sharded blocks
    exclude their halo).

    Returns interleaved per-slot arrays of length 2L (slot 2i = forward
    candidate at position i, slot 2i+1 = its reverse complement):
    (ok, w0, w1, w2, cont, post, comp).
    """
    L = bases.shape[0]
    kmer = KMER
    kb = kmer // 4

    # n4[p] = big-endian packed 4-mer
    b16 = bases.astype(jnp.int32)
    n4 = ((jnp.roll(b16, 0) << 6) | (jnp.roll(b16, -1) << 4)
          | (jnp.roll(b16, -2) << 2) | jnp.roll(b16, -3)).astype(jnp.int32)

    tmap = jnp.asarray(TMAP.astype(np.int32))
    compt = jnp.asarray(COMP.astype(np.int32))
    tf = tmap[n4]
    tc = tmap[compt[n4]]
    v = jnp.minimum((tf << 8) | jnp.roll(tf, -4),
                    (jnp.roll(tc, -4) << 8) | tc)

    # closed-syncmer selection over valid 12-mer windows
    m = v
    for k in range(1, SOFF + 1):
        m = jnp.minimum(m, jnp.roll(v, -k))
    sel = (v == m) | (jnp.roll(v, -SOFF) == m)
    inctg = in_block & (loc + TMER <= ln) & (ln >= kmer)
    sel = sel & inctg

    fwd_ok = sel & (loc <= ln - kmer)
    rc_ok = sel & (loc >= kmer - TMER)

    # entry field grids per position, via rolls of n4 — never a gather
    # (fwd entry at i reads n4[i + 4t]; the rc entry ending at i+TMER-1
    # reads COMP[n4[i + 8 - 4t]], with COMP computable arithmetically:
    # COMP[b] == rev2bits(~b))
    def comp_arith(b):
        inv = (~b) & 0xFF
        return (((inv & 0x03) << 6) | ((inv & 0x0C) << 2)
                | ((inv & 0x30) >> 2) | ((inv & 0xC0) >> 6))

    def words_from(bys):
        w0 = (bys[0] << 24) | (bys[1] << 16) | (bys[2] << 8) | bys[3]
        w1 = (bys[4] << 24) | (bys[5] << 16) | (bys[6] << 8) | bys[7]
        w2 = (bys[8] << 24) | (bys[9] << 16)
        return w0, w1, w2

    fw0, fw1, fw2 = words_from([jnp.roll(n4, -4 * t) for t in range(kb)])
    cn4 = comp_arith(n4)
    rw0, rw1, rw2 = words_from(
        [jnp.roll(cn4, -(8 - 4 * t)) for t in range(kb)])

    # forward slots then rc slots (NOT interleaved: a [L, 2] stack gets
    # its 2-wide minor dim tile-padded 64x on TPU — a 24 GB ghost at
    # 50 Mbp; every consumer sorts these slots immediately, so any
    # pre-sort order is equivalent)
    def inter(af, ar):
        return jnp.concatenate([af, ar])

    okflat = inter(fwd_ok, rc_ok)
    w0a = inter(fw0, rw0)
    w1a = inter(fw1, rw1)
    w2a = inter(fw2, rw2)
    conta = inter(cranks, cranks)
    posta = inter(loc, loc + TMER)
    compa = inter(jnp.zeros(L, jnp.int32), jnp.ones(L, jnp.int32))
    return okflat, w0a, w1a, w2a, conta, posta, compa


def _genome_candidates(bps, coff, clen, invp, ncontig):
    """Per-position syncmer candidate arrays for one genome (jit).

    Derives the per-position contig geometry (contig id, local offset,
    length, length-rank) ON DEVICE from the tiny contig tables (one
    scatter of contig starts + tagged fill scans — an uploaded [N]
    position map costs ~4N bytes over the tunnel, which dominated
    50 Mbp runs), then runs the syncmer scan.  Returns the
    entry_candidates tuple ([fwd; rc] slots, length 2N) and N.
    """
    jax, jnp = _jx()
    N = 4 * bps.shape[0]                     # padded base cap (static)
    Cpad = coff.shape[0]

    i = jnp.arange(N, dtype=jnp.int32)
    bases = (bps[i >> 2] >> ((i & 3) << 1).astype(jnp.uint8)) & 3

    # per-position contig geometry from the contig tables: mark contig
    # start positions (tiny scatter), then cumsum/fill-forward
    cix = jnp.arange(Cpad, dtype=jnp.int32)
    cvalid = cix < ncontig
    starts = jnp.where(cvalid, coff, N)
    marks = jnp.zeros(N + 1, jnp.int32).at[starts].add(1, mode="drop")
    marks = marks[:N]
    cont_of = jnp.cumsum(marks) - 1          # last contig continues past
    mark_b = marks > 0                       # its end; length checks gate
    def fill_field(vals, bits):
        f = jnp.zeros(N, jnp.int64).at[starts].max(
            jnp.where(cvalid, vals.astype(jnp.int64), 0), mode="drop")
        return _ffill_tagged(jax, jnp, mark_b, f, bits)

    coff_at = fill_field(coff, 28).astype(jnp.int32)
    ln = fill_field(clen, 28).astype(jnp.int32)
    cranks = fill_field(invp, 12).astype(jnp.int32)
    loc = i - coff_at
    in_block = (cont_of >= 0) & (cont_of < ncontig)
    return entry_candidates(jnp, bases, loc, ln, cranks, in_block), N


def driver_candidates(bps, coff, clen, invp, ncontig):
    """UNSORTED forward-slot entry stream for the merge's driver (T1)
    side (jit-traceable).

    The adaptamer merge only consumes T1's forward-orientation entries
    as a keyed stream that its own combined sort orders (merge_seeds
    `drive1`; the reference's A-strand restriction, FastGA.c:916-928),
    and every tie is fully broken by the packed key fields — so the
    per-genome entry sort adds nothing for the driver genome and is
    skipped.  Returns a table tuple in genome-position order with an
    explicit validity mask in the `vs` slot: (w0, w1, w2, cont, post,
    comp=0, lcp=None, nfwd, valid).
    """
    jax, jnp = _jx()
    (okflat, w0a, w1a, w2a, conta, posta, compa), N = \
        _genome_candidates(bps, coff, clen, invp, ncontig)
    ok = okflat[:N]                          # forward slots only
    nfwd = jnp.sum(ok.astype(jnp.int32))
    return (w0a[:N], w1a[:N], w2a[:N], conta[:N], posta[:N],
            compa[:N], None, nfwd, ok.astype(jnp.int32))


def gix_arrays(bps, nbases: int, coff, clen, invp, ncontig,
               ecap: int = 0):
    """Sorted GIX entry arrays for one genome (jit-traceable).

    bps: uint8[Npad/4] 2-bit packed bases (base i at bit 2*(i%4));
    nbases: actual base count (python int — static per trace);
    coff/clen: int32[Cpad] contig base offsets/lengths (pad rows len 0);
    invp: int32[Cpad] contig id -> length-rank;
    ncontig: actual contig count.

    The per-position contig geometry (contig id, local offset, length,
    rank) is derived ON DEVICE from the tiny contig tables (one scatter
    of contig starts + tagged fill scans) — an uploaded [N] position
    map costs ~4N bytes over the tunnel, which dominated 50 Mbp runs.

    Returns (w0, w1, w2, cont, post, comp, lcp, nentries, valid) — entries
    sorted by (kmer, cont, post, comp), padded to the position cap with
    all-ones keys.  w0/w1 = kmer bits 79..16 (two int32), w2 = bits
    15..0 << 16.
    """
    jax, jnp = _jx()
    (okflat, w0a, w1a, w2a, conta, posta, compa), N = \
        _genome_candidates(bps, coff, clen, invp, ncontig)

    # two packed int64 sort keys carry all entry data; payloads are
    # reconstructed from the sorted keys instead of reorder gathers;
    # rows at index >= nentries are padding regardless of key value
    ka, kb_ = pack_entry_keys(jnp, okflat, w0a, w1a, w2a, conta, posta,
                              compa)
    srt = jax.lax.sort((ka, kb_), num_keys=2)
    w0s, w1s, w2s, cs, ps, os = unpack_entry_keys(jnp, srt[0], srt[1])

    nent = jnp.sum(okflat.astype(jnp.int32))
    vs = (jnp.arange(2 * N, dtype=jnp.int32) < nent).astype(jnp.int32)
    lcp = adjacent_lcp(jnp, w0s, w1s, w2s)

    if ecap and ecap < 2 * N:
        (w0s, w1s, w2s, cs, ps, os, lcp, vs) = (
            w0s[:ecap], w1s[:ecap], w2s[:ecap], cs[:ecap], ps[:ecap],
            os[:ecap], lcp[:ecap], vs[:ecap])
    return (w0s, w1s, w2s, cs, ps, os, lcp, nent, vs)


def pack_entry_keys(jnp, ok, w0a, w1a, w2a, conta, posta, compa):
    """Entry fields -> two int64 sort keys (MAX for invalid slots):
    ka = unsigned 64 kmer bits (sign-centered), kb = [56:41] kmer bits
    15..0, [40:29] cont, [28:1] post, [0] comp."""
    invalid = ~ok
    w0u = w0a.astype(jnp.uint32).astype(jnp.int64)
    w1u = w1a.astype(jnp.uint32).astype(jnp.int64)
    w2_16 = w2a.astype(jnp.uint32).astype(jnp.int64) >> 16
    ka = (w0u - (jnp.int64(1) << 31)) * (jnp.int64(1) << 32) + w1u
    kb = ((w2_16 << 41) | (conta.astype(jnp.int64) << 29)
          | (posta.astype(jnp.int64) << 1) | compa.astype(jnp.int64))
    return (jnp.where(invalid, _I64MAX, ka),
            jnp.where(invalid, _I64MAX, kb))


def unpack_entry_keys(jnp, kas, kbs):
    """Inverse of pack_entry_keys -> (w0, w1, w2, cont, post, comp)."""
    def to_i32(x64):
        # uint32 value held in int64 -> same bit pattern as int32
        return (x64 - ((x64 >> 31) << 32)).astype(jnp.int32)

    w0s = to_i32(((kas >> 32) + (jnp.int64(1) << 31)) & 0xFFFFFFFF)
    w1s = to_i32(kas & 0xFFFFFFFF)
    w2s = to_i32(((kbs >> 41) & 0xFFFF) << 16)
    cs = ((kbs >> 29) & 0xFFF).astype(jnp.int32)
    ps = ((kbs >> 1) & ((1 << 28) - 1)).astype(jnp.int32)
    os = (kbs & 1).astype(jnp.int32)
    return w0s, w1s, w2s, cs, ps, os


def adjacent_lcp(jnp, w0s, w1s, w2s):
    """lcp[i] = base-lcp(row i-1, row i) over sorted 80-bit kmer words,
    capped at KMER; lcp[0] = 0."""
    x0 = w0s ^ jnp.roll(w0s, 1)
    x1 = w1s ^ jnp.roll(w1s, 1)
    x2 = w2s ^ jnp.roll(w2s, 1)
    lz = jnp.where(
        x0 != 0, _clz32_arr(jnp, x0),
        jnp.where(x1 != 0, 32 + _clz32_arr(jnp, x1),
                  64 + _clz32_arr(jnp, x2)))
    lcp = jnp.minimum(lz >> 1, KMER).astype(jnp.int32)
    return lcp.at[0].set(0)


def _clz32_arr(jnp, x):
    xu = x.astype(jnp.uint32)
    n_ = jnp.zeros(x.shape, jnp.int32)
    y = xu
    for sh, add in ((16, 16), (8, 8), (4, 4), (2, 2), (1, 1)):
        big_ = y >= (jnp.uint32(1) << sh)
        n_ = jnp.where(big_, n_ + add, n_)
        y = jnp.where(big_, y >> sh, y)
    return jnp.where(xu == 0, 32, 31 - n_)


# ---------------------------------------------------------------------------
# scan / packing helpers (all int64; callers run under jax.enable_x64)
# ---------------------------------------------------------------------------

def _u32_64(jnp, x):
    """int32 -> its unsigned value as int64."""
    return x.astype(jnp.int64) & 0xFFFFFFFF


def _seg_cummax(jax, jnp, x, start):
    """Cumulative max of x resetting where start is True (int64 offset
    trick over the native cummax)."""
    gid = jnp.cumsum(start.astype(jnp.int64))
    big = jnp.int64(1) << 33          # |x| < 2^31
    shifted = x.astype(jnp.int64) + gid * big
    cm = jax.lax.cummax(shifted, axis=0)
    return (cm - gid * big).astype(jnp.int32)


def _seg_cummax_stack(jax, jnp, X, start):
    """Rowwise segmented cummax of X [K, M] (one fused scan)."""
    gid = jnp.cumsum(start.astype(jnp.int64))[None, :]
    big = jnp.int64(1) << 33
    cm = jax.lax.cummax(X.astype(jnp.int64) + gid * big, axis=1)
    return cm - gid * big


def _seg_cumsum(jax, jnp, x, start):
    """Segmented cumulative sum (difference-of-prefix-sums trick).
    Valid while the global prefix sum stays below 2^36."""
    c = jnp.cumsum(x.astype(jnp.int64))
    base = c - x.astype(jnp.int64)
    gid = jnp.cumsum(start.astype(jnp.int64))
    bigb = jnp.int64(1) << 36
    run = jax.lax.cummax(jnp.where(start, gid * bigb + base, jnp.int64(0)))
    seg_base = run - gid * bigb
    return c - seg_base


def _ffill_tagged(jax, jnp, mark, val, bits):
    """Fill-forward: out[i] = val at the latest j <= i with mark[j]
    (0 before any mark).  `val` must fit in `bits` (< 38)."""
    m = jnp.cumsum(mark.astype(jnp.int64))
    s = jnp.where(mark, (m << bits) | val.astype(jnp.int64), m << bits)
    c = jax.lax.cummax(s)
    return c & ((jnp.int64(1) << bits) - 1)


def _bfill_tagged(jax, jnp, mark, val, bits):
    """Fill-backward: out[i] = val at the earliest j >= i with mark[j]."""
    rm = jnp.flip(mark)
    rv = jnp.flip(val)
    return jnp.flip(_ffill_tagged(jax, jnp, rm, rv, bits))


# ---------------------------------------------------------------------------
# Section 2: adaptamer merge on device (combined-stream sort)
# ---------------------------------------------------------------------------

def _entry_keys(jnp, T, tag: int):
    """(k1, k2) int64 sort keys for one table's entries (MAX when
    invalid).  k1 = 64 kmer bits; k2 = [62:47] kmer bits 15..0,
    [46] tag, [45:34] cont, [33:6] post, [5] comp."""
    w0, w1, w2, c, p, o, l, n, vs = T
    E = w0.shape[0]
    eix = jnp.arange(E, dtype=jnp.int32)
    # front-compacted tables mark validity by count; unsorted candidate
    # streams (driver side of the merge) carry an explicit slot mask
    valid = (eix < n) if vs is None else (vs != 0)
    w0u = _u32_64(jnp, w0)
    w1u = _u32_64(jnp, w1)
    k1 = (w0u - (jnp.int64(1) << 31)) * (jnp.int64(1) << 32) + w1u
    w2_16 = _u32_64(jnp, w2) >> 16
    k2 = ((w2_16 << 47) | (jnp.int64(tag) << 46)
          | (c.astype(jnp.int64) << 34) | (p.astype(jnp.int64) << 6)
          | (o.astype(jnp.int64) << 5))
    k1 = jnp.where(valid, k1, _I64MAX)
    k2 = jnp.where(valid, k2, _I64MAX)
    return k1, k2, valid


def _use_merge_kernel(E1, E2) -> bool:
    """Route the presorted merge through the Pallas merge-path kernel
    on real TPUs (ops/merge_pallas.py); XLA bitonic elsewhere."""
    import os

    import jax
    if os.environ.get("FASTGA_TPU_MERGE_KERNEL", "auto") == "off":
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    from . import merge_pallas as mp
    return mp.supported(E1, E2)


def _env(name: str) -> str:
    import os
    return os.environ.get(name, "")


def _use_scan_kernel(M) -> bool:
    """Route stream scans through the fused Pallas scan kernel
    (ops/scan_pallas.py) on real TPUs; XLA scans elsewhere.
    FASTGA_TPU_SCAN_KERNEL: auto (default) | off | force (any backend —
    pair with FASTGA_TPU_SCAN_INTERPRET=1 for CPU tests)."""
    import os

    import jax
    mode = os.environ.get("FASTGA_TPU_SCAN_KERNEL", "auto")
    if mode == "off":
        return False
    if mode != "force" and jax.devices()[0].platform != "tpu":
        return False
    from . import scan_pallas as spk
    return spk.supported(M)


def _bitonic_merge_sorted(jax, jnp, e1, ops, num_keys=2):
    """Merge two individually-sorted int64 operand streams — rows [:e1]
    ascending, rows [e1:] ascending, invalid rows +MAX suffixes within
    each stream — into one ascending stream.

    Equals lax.sort's output whenever live keys are unique (they are:
    every entry key embeds cont/post/comp + a stream tag), but runs as
    Batcher's bitonic *merge* network: log2(P) compare-exchange stages
    of regular strided selects, no gathers and ~log(P)x less work than
    a full sort.  ops[0] (and ops[1] when num_keys=2) are the
    lexicographic keys; remaining operands ride as payload.  +MAX pad
    rows injected at the stream boundary keep bitonicity for non-pow2
    sizes; they carry all-MAX payloads and are truncated off the tail
    (only ever displacing rows whose keys are also +MAX)."""
    M = ops[0].shape[0]
    P = 1 << (M - 1).bit_length()
    pad = P - M
    if pad:
        filler = jnp.full((pad,), _I64MAX, jnp.int64)
        ops = tuple(jnp.concatenate([x[:e1], filler, x[e1:]])
                    for x in ops)
    # ascending ++ reversed-ascending = bitonic
    ops = tuple(jnp.concatenate([x[:e1 + pad],
                                 jnp.flip(x[e1 + pad:])]) for x in ops)

    def key_gt(a0, a1, b0, b1):
        g = a0 > b0
        if num_keys > 1:
            g = g | ((a0 == b0) & (a1 > b1))
        return g

    s = P >> 1
    # large strides: 2D halves [R, 2s] -> [:, :s] vs [:, s:] (dense
    # lane-major layouts; a [-1, 2, s] reshape would pad tiny dims)
    while s >= 2048:
        x2 = [x.reshape(-1, 2 * s) for x in ops]
        lo = [x[:, :s] for x in x2]
        hi = [x[:, s:] for x in x2]
        swap = key_gt(lo[0], lo[1] if num_keys > 1 else None,
                      hi[0], hi[1] if num_keys > 1 else None)
        ops = tuple(
            jnp.concatenate([jnp.where(swap, h, l),
                             jnp.where(swap, l, h)], axis=1).reshape(P)
            for l, h in zip(lo, hi))
        s >>= 1
    # small strides: roll-based compare-exchange on the flat array
    # (rolls keep the 128-lane layout dense at any stride)
    iota = jnp.arange(P, dtype=jnp.int32)
    while s >= 1:
        is_lo = (iota & s) == 0
        k0d = jnp.roll(ops[0], -s)
        k1d = jnp.roll(ops[1], -s) if num_keys > 1 else None
        swap_lo = key_gt(ops[0], ops[1] if num_keys > 1 else None,
                         k0d, k1d)
        swap = jnp.where(is_lo, swap_lo, jnp.roll(swap_lo, s))
        ops = tuple(
            jnp.where(swap,
                      jnp.where(is_lo, jnp.roll(x, -s), jnp.roll(x, s)),
                      x)
            for x in ops)
        s >>= 1
    if pad:
        ops = tuple(x[:M] for x in ops)
    return ops


def _window_mins(jnp, l2, n2, freq):
    """T2-space rolling minima of the adjacent-lcp array.

    Returns lists wup[u], wdn[d] for u,d = 1..freq-1 where
    wup[u][j] = min(l2c[j+1..j+u]) and wdn[d][j] = min(l2c[j-d+1..j])
    with l2c = min(l2, KMER) masked to 0 outside [0, n2)."""
    E = l2.shape[0]
    iota = jnp.arange(E, dtype=jnp.int32)
    l2c = jnp.where(iota < n2, jnp.minimum(l2, KMER), 0)
    wup = []
    wdn = []
    cur_up = None
    cur_dn = None
    for u in range(1, freq):
        r = jnp.where(iota + u < E, jnp.roll(l2c, -u), 0)
        cur_up = r if cur_up is None else jnp.minimum(cur_up, r)
        wup.append(cur_up)
        rd = jnp.where(iota - (u - 1) >= 0, jnp.roll(l2c, u - 1), 0)
        cur_dn = rd if cur_dn is None else jnp.minimum(cur_dn, rd)
        wdn.append(cur_dn)
    return wup, wdn


def _pack6(jnp, vals, lo_count):
    """Pack a list of 6-bit values into (lo, hi) int64 words."""
    lo = jnp.int64(0)
    for i, v in enumerate(vals[:lo_count]):
        lo = lo | (v.astype(jnp.int64) << (6 * i))
    hi = jnp.int64(0)
    for i, v in enumerate(vals[lo_count:]):
        hi = hi | (v.astype(jnp.int64) << (6 * i))
    return lo, hi


def merge_seeds(T1, T2, ns_cap: int, freq: int = F, acap: int = 0,
                soft_mask: bool = False, has_masks: bool = False,
                maskb1=None, maskb2=None, flip: bool = False,
                presorted: bool = False):
    """Adaptamer seeds between two device tables (jit-traceable).

    Combined-stream port of ops/merge._merge_chunk: T1-forward and T2
    entries are sorted as one stream; every per-entry quantity comes from
    cumsums, rolls, and fill scans over that stream (no binary-search or
    window gathers).  Returns (plen, acont, apost, bcont, bpost, bcomp,
    nseeds, nalive) with padding rows masked by index >= nseeds, in the
    host's (x, y) emission order.

    `acap`: cap on alive T1 rows (default E1//2).  When masks are in
    play pass has_masks=True with per-entry mask bytes; masked-out seeds
    are compacted away exactly like the host path.

    ``presorted=True`` asserts both tables are sorted by the composite
    entry key (kmer, cont, post, comp) with +MAX-tail validity — true of
    every device-built table (gix_arrays / _drvtab_jit sort exactly that
    key).  The combined stream is then produced by a bitonic *merge*
    (log2(M) strided select stages) instead of a full lax.sort, and
    non-driving T1 rows stay in place carrying a dead bit (payload bit
    62) rather than being key-MAXed: interspersed dead rows change no
    downstream value — segment boundaries (is2), insertion ranks, and
    window transport are all is2-keyed, and the lcp chains are segmented
    mins where lcp(a,c) == min(lcp(a,b), lcp(b,c)) for sorted strings.

    ``flip=True`` is the -S symmetric second pass (new_merge_thread flip
    branch FastGA.c:833-913, host port ops/merge.adaptamer_seeds_flip):
    T1 here is the *driving* table = genome 2 (any orientation drives),
    T2 the member table = genome 1; emitted pairs are (A = forward T1
    member, B = driver) with bcomp = driver orientation.  The emitted
    multiset equals the host's; emission order is (driver, member)
    rather than the host's (member, driver) — downstream chain sweeps
    aggregate per bucket, so identical seed multisets give identical
    tubes.  Pass masks swapped accordingly (maskb1 = driver's).
    """
    jax, jnp = _jx()
    E1 = T1[0].shape[0]
    E2 = T2[0].shape[0]
    if acap <= 0:
        acap = max(E1 // 2, 1 << 12)
    M = E1 + E2
    kmer = KMER
    n1 = T1[7]
    n2 = T2[7]

    k1a, k2a, val1 = _entry_keys(jnp, T1, 0)
    k1b, k2b, val2 = _entry_keys(jnp, T2, 1)
    # only forward T1 entries drive the merge (flip: any orientation,
    # FastGA.c:916-928 applies to the un-flipped side only)
    drive1 = val1 if flip else (val1 & (T1[5] == 0))
    if presorted:
        # keep non-driving rows in place (dead bit rides payload bit 62)
        # so the T1 stream stays sorted for the bitonic merge
        dead1 = (val1 & ~drive1).astype(jnp.int64)
    else:
        k1a = jnp.where(drive1, k1a, _I64MAX)
        k2a = jnp.where(drive1, k2a, _I64MAX)

    # T2-space window minima, packed 6 bits each, ride the sort as values
    # (lo = 6 values, hi = up to 3 more above bit 36; maskb at bit 54)
    wup, wdn = _window_mins(jnp, T2[6], n2, freq)
    nlo = min(len(wup), 6)
    up_lo2, up_hi2 = _pack6(jnp, wup, nlo)
    dn_lo2, dn_hi2 = _pack6(jnp, wdn, nlo)
    mb1 = (maskb1 if maskb1 is not None
           else jnp.zeros(E1, jnp.int32)).astype(jnp.int64)
    mb2 = (maskb2 if maskb2 is not None
           else jnp.zeros(E2, jnp.int32)).astype(jnp.int64)
    vup1 = mb1 << 54
    if presorted:
        vup1 = vup1 | (dead1 << 62)
    vup = jnp.concatenate([vup1,
                           (mb2 << 54) | (up_hi2 << 36) | up_lo2])
    vdn = jnp.concatenate([jnp.zeros(E1, jnp.int64),
                           (dn_hi2 << 36) | dn_lo2])

    if presorted and _use_merge_kernel(E1, E2):
        from . import merge_pallas as mp
        srt = mp.merge_sorted_streams(
            (k1a, k2a, vup[:E1], vdn[:E1]),
            (k1b, k2b, vup[E1:], vdn[E1:]))
    else:
        k1 = jnp.concatenate([k1a, k1b])
        k2 = jnp.concatenate([k2a, k2b])
        if presorted:
            srt = _bitonic_merge_sorted(jax, jnp, E1,
                                        (k1, k2, vup, vdn))
        else:
            srt = jax.lax.sort((k1, k2, vup, vdn), num_keys=2)
    k1s, k2s, vups, vdns = srt
    _stage = _env("FASTGA_TPU_MERGE_STAGE")   # perf attribution hook
    if _stage == "merge":
        return k1s, k2s, vups, vdns

    valid = k2s != _I64MAX
    is2 = ((k2s >> 46) & 1).astype(jnp.bool_) & valid
    cont = ((k2s >> 34) & (MAX_CONT - 1)).astype(jnp.int32)
    post = ((k2s >> 6) & (MAX_POST - 1)).astype(jnp.int32)
    comp = ((k2s >> 5) & 1).astype(jnp.int32)
    w2_16 = ((k2s >> 47) & 0xFFFF).astype(jnp.int32)

    # adjacent-row lcp over the 80 kmer bits
    w0u = ((k1s >> 32) + (jnp.int64(1) << 31)).astype(jnp.int64) & 0xFFFFFFFF
    w1u = k1s & 0xFFFFFFFF
    x0 = (w0u ^ jnp.roll(w0u, 1)).astype(jnp.uint32).astype(jnp.int32)
    x1 = (w1u ^ jnp.roll(w1u, 1)).astype(jnp.uint32).astype(jnp.int32)
    x2 = ((w2_16 ^ jnp.roll(w2_16, 1)) << 16)
    lz = jnp.where(x0 != 0, _clz32_arr(jnp, x0),
                   jnp.where(x1 != 0, 32 + _clz32_arr(jnp, x1),
                             64 + _clz32_arr(jnp, x2)))
    ridx = jnp.arange(M, dtype=jnp.int32)
    alcp = jnp.minimum(lz >> 1, kmer)
    alcp = jnp.where((ridx > 0) & valid & jnp.roll(valid, 1), alcp, 0)

    use_scan = _use_scan_kernel(M)
    nalcp = jnp.roll(alcp, -1)          # lcp(row i, row i+1)
    is2i = is2.astype(jnp.int32)
    startp = (ridx == 0) | jnp.roll(is2, 1)
    if use_scan:
        # one fused forward pass: T2 insertion ranks, pred-side
        # segmented lcp minima, and the T2 window words (18-bit planes)
        # transported to following rows; one reverse pass for the
        # succ-side equivalents
        from . import scan_pallas as spk
        m18 = jnp.int64(0x3FFFF)
        fwd = spk.fused_scan(
            (is2i, -alcp,
             (vdns & m18).astype(jnp.int32),
             ((vdns >> 18) & m18).astype(jnp.int32),
             ((vdns >> 36) & m18).astype(jnp.int32)),
            (("sum", None), ("max", 0),
             ("last", 1), ("last", 1), ("last", 1)),
            (startp.astype(jnp.int32), is2i))
        m2cum32, nsegp, dn_p0, dn_p1, dn_p2 = fwd
        segmin_p = -nsegp
        # reverse flag: reset at the nearest following T2 row (the
        # flipped-scan formulation's (p==0)|roll(flip(is2),1) start)
        g_succ = jnp.where(ridx == M - 1, 1, jnp.roll(is2i, -1))
        rev = spk.fused_scan(
            (-nalcp,
             (vups & m18).astype(jnp.int32),
             ((vups >> 18) & m18).astype(jnp.int32),
             ((vups >> 36) & m18).astype(jnp.int32)),
            (("max", 0), ("last", 1), ("last", 1), ("last", 1)),
            (g_succ, is2i), reverse=True)
        segmin_s = -rev[0]
        up_p0, up_p1, up_p2 = rev[1], rev[2], rev[3]
        ins = m2cum32 - is2i
        n2_after = n2.astype(jnp.int32) - m2cum32
    else:
        m2cum = jnp.cumsum(is2.astype(jnp.int64))
        ins = (m2cum - is2.astype(jnp.int64)).astype(jnp.int32)

        # lcp to nearest preceding / following T2 row: segmented
        # min-scans of alcp with resets after / before T2 rows (min via
        # negated cummax)
        segmin_p = -_seg_cummax(jax, jnp, -alcp, startp)

        f_is2 = jnp.flip(is2)
        f_nalcp = jnp.flip(nalcp)
        f_start = (ridx == 0) | jnp.roll(f_is2, 1)
        f_min = -_seg_cummax(jax, jnp, -f_nalcp, f_start)
        segmin_s = jnp.flip(f_min)
        n2_after = (n2.astype(jnp.int64) - m2cum).astype(jnp.int32)
    lcp_pred = jnp.where(ins > 0, segmin_p, -1)
    lcp_succ = jnp.where(n2_after > 0, segmin_s, -1)
    if _stage == "scan":
        return lcp_pred, lcp_succ, ins

    plen = jnp.maximum(lcp_pred, lcp_succ)
    alive0 = (~is2) & valid & (plen >= 12)
    if presorted:
        alive0 = alive0 & (((vups >> 62) & 1) == 0)

    up0 = (lcp_succ >= plen) & (n2_after > 0) & alive0
    dn0 = (lcp_pred >= plen) & (ins > 0) & alive0
    if use_scan:
        # window words arrived as 18-bit planes (3 packed 6-bit values
        # each, contiguous from bit 0 across planes)
        def win_ok_counts3(p0, p1, p2):
            cnt = jnp.zeros(M, jnp.int32)
            planes = (p0, p1, p2)
            for u in range(1, freq):
                pi, off = divmod(u - 1, 3)
                wv = (planes[pi] >> (6 * off)) & 63
                cnt = cnt + (wv >= plen).astype(jnp.int32)
            return cnt

        upcw = win_ok_counts3(up_p0, up_p1, up_p2)
        dncw = win_ok_counts3(dn_p0, dn_p1, dn_p2)
    else:
        # transport the T2-row window words to T1 rows (predecessor's
        # wdn fills forward, successor's wup fills backward); high
        # values (beyond 6 packed) travel as an 18-bit field
        m36 = (jnp.int64(1) << 36) - 1
        dn_at = _ffill_tagged(jax, jnp, is2, vdns & m36, 36)
        hi_at_p = _ffill_tagged(jax, jnp, is2, (vdns >> 36) & 0x3FFFF,
                                18)
        up_at = _bfill_tagged(jax, jnp, is2, vups & m36, 36)
        hi_at_s = _bfill_tagged(jax, jnp, is2, (vups >> 36) & 0x3FFFF,
                                18)

        def win_ok_counts(lo, hi):
            cnt = jnp.zeros(M, jnp.int32)
            for u in range(1, freq):
                if u - 1 < nlo:
                    wv = ((lo >> (6 * (u - 1))) & 63).astype(jnp.int32)
                else:
                    wv = ((hi >> (6 * (u - 1 - nlo)))
                          & 63).astype(jnp.int32)
                cnt = cnt + (wv >= plen).astype(jnp.int32)
            return cnt

        upcw = win_ok_counts(up_at, hi_at_s)
        dncw = win_ok_counts(dn_at, hi_at_p)
    upc = jnp.where(up0, 1 + upcw, 0)
    dnc = jnp.where(dn0, 1 + dncw, 0)

    count = upc + dnc
    alive = alive0 & (count < freq)
    mb_own = ((vups >> 54) & 63).astype(jnp.int32)
    mlen = jnp.where(soft_mask, plen, kmer + 1) if has_masks \
        else jnp.full(M, kmer + 1, jnp.int32)
    if has_masks:
        alive = alive & (mb_own < mlen)
    cnt = jnp.where(alive, count, 0)
    if _stage == "count":
        return cnt, plen, alive

    # ragged expansion DIRECTLY over the merged stream (no compaction
    # sort): per-seed owner rows come from a scatter-max of merged-row
    # indices at each chain start + a cummax fill — owners appear in
    # increasing row order, so the fill is exact.  (flip: the driver's
    # orientation rides at bit 47 — it becomes the emitted bcomp)
    v1 = ((plen.astype(jnp.int64) << 40) | (cont.astype(jnp.int64) << 28)
          | post.astype(jnp.int64))
    if flip:
        v1 = v1 | (comp.astype(jnp.int64) << 47)
    y0 = ins - dnc
    nalive = jnp.sum(alive.astype(jnp.int32))

    cnt32 = cnt.astype(jnp.int32)
    cum_incl = jnp.cumsum(cnt32)        # nseeds < 2^31
    cum_excl = cum_incl - cnt32
    nseeds = cum_incl[M - 1]
    starts = jnp.where(alive, cum_excl, ns_cap)
    sidx = jnp.arange(ns_cap, dtype=jnp.int32)
    # owner transport: ONE int32 scatter-max of the owner row index
    # (int64 scatters run ~6.5x slower on the sparse core) + cummax
    # fill; payloads come by bounded monotone gathers, and the owner's
    # first slot from a mark fill over the slot axis
    row0 = jnp.full(ns_cap, -1, jnp.int32).at[starts].max(
        ridx, mode="drop")
    rowf = jax.lax.cummax(row0, axis=0)
    mk = (row0 >= 0).astype(jnp.int32)
    if _use_scan_kernel(ns_cap):
        from . import scan_pallas as spk
        start_slot = spk.fused_scan((sidx,), (("last", 0),), (mk,))[0]
    else:
        start_slot = _ffill_tagged(
            jax, jnp, mk > 0,
            jnp.where(mk > 0, sidx.astype(jnp.int64), 0), 34
        ).astype(jnp.int32)
    ec = jnp.clip(rowf, 0, M - 1)
    g1 = v1[ec]
    y0g = y0[ec]                        # int32 gather
    y = y0g + (sidx - start_slot)
    yc = jnp.clip(y, 0, E2 - 1)
    if _stage == "expand":
        return g1, yc

    t2pack = ((T2[4].astype(jnp.int64) << 19)
              | (T2[3].astype(jnp.int64) << 7)
              | (T2[5].astype(jnp.int64) << 6) | mb2)
    tg = t2pack[yc]

    pl = (g1 >> 40).astype(jnp.int32) & 63
    valid_slot = sidx < nseeds
    if flip:
        # roles swap: A side = forward member (from T2 = genome 1),
        # B side = driver (genome 2) with its own orientation
        ac = ((tg >> 7) & (MAX_CONT - 1)).astype(jnp.int32)
        ap = (tg >> 19).astype(jnp.int32)
        bc = ((g1 >> 28) & (MAX_CONT - 1)).astype(jnp.int32)
        bp = (g1 & (MAX_POST - 1)).astype(jnp.int32)
        bo = ((g1 >> 47) & 1).astype(jnp.int32)
        member_fwd = ((tg >> 6) & 1) == 0
    else:
        ac = ((g1 >> 28) & (MAX_CONT - 1)).astype(jnp.int32)
        ap = (g1 & (MAX_POST - 1)).astype(jnp.int32)
        bp = (tg >> 19).astype(jnp.int32)
        bc = ((tg >> 7) & (MAX_CONT - 1)).astype(jnp.int32)
        bo = ((tg >> 6) & 1).astype(jnp.int32)

    if has_masks or flip:
        keep = valid_slot
        if flip:
            keep = keep & member_fwd   # A side forward only
        if has_masks:
            mby = (tg & 63).astype(jnp.int32)
            mlen_y = jnp.where(soft_mask, pl, kmer + 1)
            keep = keep & (mby < mlen_y)
        s1 = ((pl.astype(jnp.int64) << 40) | (ac.astype(jnp.int64) << 28)
              | ap.astype(jnp.int64))
        s2 = ((bc.astype(jnp.int64) << 29) | (bp.astype(jnp.int64) << 1)
              | bo.astype(jnp.int64))
        kk = jnp.where(keep, jnp.int64(0), jnp.int64(1) << 58) \
            | sidx.astype(jnp.int64)
        ms = jax.lax.sort((kk, jnp.where(keep, s1, 0),
                           jnp.where(keep, s2, 0)), num_keys=1)
        s1s, s2s = ms[1], ms[2]
        pl = (s1s >> 40).astype(jnp.int32)
        ac = ((s1s >> 28) & (MAX_CONT - 1)).astype(jnp.int32)
        ap = (s1s & (MAX_POST - 1)).astype(jnp.int32)
        bc = (s2s >> 29).astype(jnp.int32)
        bp = ((s2s >> 1) & (MAX_POST - 1)).astype(jnp.int32)
        bo = (s2s & 1).astype(jnp.int32)
        nseeds = jnp.sum(keep.astype(jnp.int32))

    return pl, ac, ap, bc, bp, bo, nseeds, nalive


def self_seeds(T1, ns_cap: int, freq: int = F, acap: int = 0,
               soft_mask: bool = False, has_masks: bool = False,
               maskb1=None):
    """Self-comparison adaptamer seeds within one table (jit-traceable
    port of ops/merge.self_adaptamer_seeds): every entry (either
    orientation) pairs with the other members of its own-lcp group.
    All window logic lives in the table's own index space (rolls only).
    """
    jax, jnp = _jx()
    w0, w1, w2, c1, p1, o1, l1, n1, _vs = T1
    E1 = w0.shape[0]
    if acap <= 0:
        acap = max(E1 // 2, 1 << 12)
    kmer = KMER
    iota = jnp.arange(E1, dtype=jnp.int32)
    valid = iota < n1

    # adj[i] = lcp(entry i-1, entry i) (0 at i=0 and beyond n1)
    adj = jnp.where(valid & (iota > 0), jnp.minimum(l1, kmer), 0)
    adj_next = jnp.where(iota + 1 < E1, jnp.roll(adj, -1), 0)
    plen = jnp.maximum(adj, adj_next)
    alive0 = valid & (plen >= 12)

    # group windows over the table's own adjacent-lcp array:
    # wup[u][i] = min(adj[i+1..i+u+1])... i.e. the chain for member
    # i+1+u; wdn[u][i] = min(adj[i-u..i]) for member i-1-u.  The host
    # window spans freq members each side, so freq window values.
    wup, wdn = _window_mins(jnp, jnp.where(iota > 0, l1, 0), n1,
                            freq + 1)
    upc = jnp.zeros(E1, jnp.int32)
    dnc = jnp.zeros(E1, jnp.int32)
    for u in range(1, freq + 1):
        upc = upc + (wup[u - 1] >= plen).astype(jnp.int32)
        dnc = dnc + (wdn[u - 1] >= plen).astype(jnp.int32)
    upc = jnp.where(alive0, upc, 0)
    dnc = jnp.where(alive0, dnc, 0)

    count = 1 + upc + dnc
    alive = alive0 & (count < freq)
    if has_masks:
        mb1v = maskb1.astype(jnp.int32)
        mlen = jnp.where(soft_mask, plen, kmer + 1)
        alive = alive & (mb1v < mlen)
    cnt = jnp.where(alive, upc + dnc, 0)

    # ragged expansion directly over the table rows (no compaction
    # sort) — owner rows via scatter-max + cummax fill, as in
    # merge_seeds
    v1 = ((plen.astype(jnp.int64) << 40) | (c1.astype(jnp.int64) << 28)
          | p1.astype(jnp.int64))
    y0 = iota - dnc
    nalive = jnp.sum(alive.astype(jnp.int32))

    cnt32 = cnt.astype(jnp.int32)
    cum_incl = jnp.cumsum(cnt32)        # nseeds < 2^31
    cum_excl = cum_incl - cnt32
    nseeds = cum_incl[E1 - 1]
    starts = jnp.where(alive & (cnt > 0), cum_excl, ns_cap)
    sidx = jnp.arange(ns_cap, dtype=jnp.int32)
    # one int32 owner scatter + cummax fill; payload by two bounded
    # monotone gathers (int64 v1 with the orientation riding bit 47,
    # int32 y0/dnc pack) — see merge_seeds
    row0 = jnp.full(ns_cap, -1, jnp.int32).at[starts].max(
        iota, mode="drop")
    rowf = jax.lax.cummax(row0, axis=0)
    mk = row0 >= 0
    ec = jnp.clip(rowf, 0, E1 - 1)
    g1 = (v1 | (o1.astype(jnp.int64) << 47))[ec]
    ydn = ((y0 << 8) | dnc)[ec]         # int32 gather
    xcomp = ((g1 >> 47) & 1).astype(jnp.int32)
    y0g = (ydn >> 8).astype(jnp.int32)
    dncg = (ydn & 0xFF).astype(jnp.int32)
    if _use_scan_kernel(ns_cap):
        from . import scan_pallas as spk
        start_slot = spk.fused_scan(
            (sidx,), (("last", 0),),
            (mk.astype(jnp.int32),))[0]
    else:
        start_slot = _ffill_tagged(
            jax, jnp, mk,
            jnp.where(mk, sidx.astype(jnp.int64), 0), 34
        ).astype(jnp.int32)
    off = sidx - start_slot
    # window rows skip x itself: offsets [0, dnc) map below x, the rest
    # one past it
    y = jnp.where(off < dncg, y0g + off, y0g + off + 1).astype(jnp.int32)
    yc = jnp.clip(y, 0, E1 - 1)
    mb1v = (maskb1.astype(jnp.int64) if has_masks and maskb1 is not None
            else jnp.zeros(E1, jnp.int64))
    tpack = ((p1.astype(jnp.int64) << 19) | (c1.astype(jnp.int64) << 7)
             | (o1.astype(jnp.int64) << 6) | mb1v)
    tg = tpack[yc]

    pl = (g1 >> 40).astype(jnp.int32) & 63
    ac = ((g1 >> 28) & (MAX_CONT - 1)).astype(jnp.int32)
    ap = (g1 & (MAX_POST - 1)).astype(jnp.int32)
    bp = (tg >> 19).astype(jnp.int32)
    bc = ((tg >> 7) & (MAX_CONT - 1)).astype(jnp.int32)
    ycomp = ((tg >> 6) & 1).astype(jnp.int32)
    bo = (xcomp ^ ycomp).astype(jnp.int32)
    valid_slot = sidx < nseeds

    if has_masks:
        mby = (tg & 63).astype(jnp.int32)
        mlen_y = jnp.where(soft_mask, pl, kmer + 1)
        keep = valid_slot & (mby < mlen_y)
        s1 = ((pl.astype(jnp.int64) << 40) | (ac.astype(jnp.int64) << 28)
              | ap.astype(jnp.int64))
        s2 = ((bc.astype(jnp.int64) << 29) | (bp.astype(jnp.int64) << 1)
              | bo.astype(jnp.int64))
        kk = jnp.where(keep, jnp.int64(0), jnp.int64(1) << 58) \
            | sidx.astype(jnp.int64)
        ms = jax.lax.sort((kk, jnp.where(keep, s1, 0),
                           jnp.where(keep, s2, 0)), num_keys=1)
        s1s, s2s = ms[1], ms[2]
        pl = (s1s >> 40).astype(jnp.int32)
        ac = ((s1s >> 28) & (MAX_CONT - 1)).astype(jnp.int32)
        ap = (s1s & (MAX_POST - 1)).astype(jnp.int32)
        bc = (s2s >> 29).astype(jnp.int32)
        bp = ((s2s >> 1) & (MAX_POST - 1)).astype(jnp.int32)
        bo = (s2s & 1).astype(jnp.int32)
        nseeds = jnp.sum(keep.astype(jnp.int32))

    return pl, ac, ap, bc, bp, bo, nseeds, nalive


# ---------------------------------------------------------------------------
# Section 3: chain sweep on device (payload-in-keys, scan aggregates)
# ---------------------------------------------------------------------------

BUCK_SHIFT = 6
BUCK_WIDTH = 1 << BUCK_SHIFT

_POFF = np.int64(1) << 25      # pairing field offset (pairing >= -1)


def chain_tubes_dev(seeds, ns, amax: int, bmax: int, alens_by_rank,
                    tcap: int, chain_break: int = 2000,
                    chain_min: int = 170):
    """Bucket-pair chain sweep (jit-traceable port of
    ops/chain.chain_tubes, gather-free).  ``seeds`` = (plen, acont,
    apost, bcont, bpost, bcomp) device arrays of length NS (valid rows
    < ns).  Returns fixed-cap tube arrays (acont, bcont, comp, dgmin,
    dgmax, alow, ahgh, pairing, ntubes) in host emission order."""
    jax, jnp = _jx()
    import os as _os
    _TR = int(_os.environ.get("FASTGA_CHAIN_TRUNC", "0"))

    def _trunc(*dep):
        # perf-bisect early return (WRONG results): dummy outputs that
        # depend on the stages computed so far so XLA keeps them
        z = jnp.zeros(tcap, jnp.int64)
        acc = jnp.int64(0)
        for d in dep:
            acc = acc + d.ravel()[-1].astype(jnp.int64)
        return (z + acc, z, z, z, z, z, z, z, acc)
    plen, acont, apost, bcont, bpost, bcomp = seeds
    NS = plen.shape[0]
    M2 = 2 * NS
    big = jnp.int32(1 << 30)

    ip = apost.astype(jnp.int32)
    jp = bpost.astype(jnp.int32)
    maxdag = amax + bmax
    bcf = bcomp.astype(jnp.int32) != 0
    diag = jnp.where(bcf, maxdag - (ip + jp), bmax + (ip - jp))
    anti = jnp.where(bcf, amax - (ip - jp), ip + jp)
    dbuck = diag >> BUCK_SHIFT
    drem = diag - (dbuck << BUCK_SHIFT)
    lcp2 = plen.astype(jnp.int32) << 1

    sidx = jnp.arange(NS, dtype=jnp.int32)
    svalid = sidx < ns

    # Every seed participates in two bucket pairings: (dbuck, tag 0)
    # and (dbuck-1, tag 1).  The doubled stream's sort keys for the
    # upper copy are exact monotone transforms of the lower copy's
    # (k1-1; k2 + tagbit + NS in the iota field; vB + BUCK_WIDTH<<8),
    # so ONE sort of NS rows + a merge of the two derived sorted
    # streams equals the reference 2NS-row sort bit-for-bit (keys are
    # unique via the iota tie-break, which matches the doubled
    # layout's lower-i / upper-NS+i numbering).
    k1l = ((acont.astype(jnp.int64) << 39)
           | (bcont.astype(jnp.int64) << 27)
           | (bcf.astype(jnp.int64) << 26)
           | (dbuck.astype(jnp.int64) + _POFF))
    k2l = ((anti.astype(jnp.int64) << 28)
           | sidx.astype(jnp.int64))
    vBl = ((drem.astype(jnp.int64) << 8)
           | lcp2.astype(jnp.int64))
    k1l = jnp.where(svalid, k1l, _I64MAX)
    k2l = jnp.where(svalid, k2l, _I64MAX)
    vBl = jnp.where(svalid, vBl, 0)
    k1ls, k2ls, vBls = jax.lax.sort((k1l, k2l, vBl), num_keys=2)
    lvalid = k1ls != _I64MAX
    k1u = jnp.where(lvalid, k1ls - 1, _I64MAX)
    k2u = jnp.where(lvalid, k2ls + ((jnp.int64(1) << 27) + NS),
                    _I64MAX)
    vBu = vBls + (jnp.int64(BUCK_WIDTH) << 8)
    if _use_merge_kernel(NS, NS):
        from . import merge_pallas as mp
        srt = mp.merge_sorted_streams((k1ls, k2ls, vBls),
                                      (k1u, k2u, vBu))
    else:
        srt = _bitonic_merge_sorted(
            jax, jnp, NS,
            tuple(jnp.concatenate([a, b]) for a, b in
                  ((k1ls, k1u), (k2ls, k2u), (vBls, vBu))))
    k1s, k2s, vBs = srt
    if _TR == 1:   # after doubled-stream sort+merge
        return _trunc(k1s, k2s, vBs)

    valid = k1s != _I64MAX
    ga = ((k1s >> 39) & (MAX_CONT - 1)).astype(jnp.int32)
    gb = ((k1s >> 27) & (MAX_CONT - 1)).astype(jnp.int32)
    gc = ((k1s >> 26) & 1).astype(jnp.int32)
    pairing = ((k1s & (_POFF * 2 - 1)) - _POFF).astype(jnp.int32)
    aa = jnp.where(valid, k2s >> 28, 0).astype(jnp.int32)
    tag = ((k2s >> 27) & 1).astype(jnp.int32)
    dg = ((vBs >> 8) & 0xFF).astype(jnp.int32)
    ll = (vBs & 0xFF).astype(jnp.int32)

    ridx = jnp.arange(M2, dtype=jnp.int32)
    pk1 = jnp.roll(k1s, 1)
    gmask = (jnp.int64(-1) << 26) & ~(jnp.int64(1) << 63)
    same_g = (k1s & gmask) == (pk1 & gmask)
    seg = (ridx == 0) | (k1s != pk1)
    # group+pairing segment = full-k1 segment (k1 embeds pairing)

    # per-segment flags, broadcast to every row (scan fwd, bfill back)
    seg_end = jnp.roll(seg, -1) | (ridx == M2 - 1)
    use_scan = _use_scan_kernel(M2)
    same_prev = (ridx > 0) & same_g & (k1s == pk1 + 1)
    fl0 = (valid & (tag == 0)).astype(jnp.int32)
    fl1 = (valid & (tag == 1)).astype(jnp.int32)
    if use_scan:
        from . import scan_pallas as spk
        segf = seg.astype(jnp.int32)
        run0, run1 = spk.fused_scan((fl0, fl1),
                                    (("max", 0), ("max", 0)), (segf,))
        # the previous row of a segment start is the previous segment's
        # END row, where the forward scan already holds the whole
        # segment's OR — no backward pass needed for prev_has_lower
        prev_has_lower = (jnp.roll(run0, 1) != 0) & (ridx > 0)
        prev_adj_row = (seg & same_prev
                        & prev_has_lower).astype(jnp.int32)
        # prev_adjacent is constant per segment and set at its start:
        # broadcast = forward fill from segment starts
        prev_adjacent = spk.fused_scan(
            (prev_adj_row,), (("last", 0),), (segf,))[0] != 0
        ends0 = jnp.where(seg_end, run0, -1)
        ends1 = jnp.where(seg_end, run1, -1)
        bf0, bf1 = spk.fused_scan(
            (ends0, ends1), (("max", 0), ("max", 0)),
            (seg_end.astype(jnp.int32),), reverse=True)
        has_lower = bf0 != 0
        has_upper = bf1 != 0
    else:
        flags = jnp.stack([fl0, fl1])
        run = _seg_cummax_stack(jax, jnp, flags, seg)
        ends = jnp.where(seg_end[None, :], run, -1)
        bf = jnp.flip(
            _seg_cummax_stack(jax, jnp, jnp.flip(ends, 1),
                              jnp.flip(seg_end)),
            1).astype(jnp.int32)
        has_lower = bf[0] != 0
        has_upper = bf[1] != 0

        prev_has_lower = jnp.roll(has_lower, 1) & (ridx > 0)
        prev_adj_row = (seg & same_prev
                        & prev_has_lower).astype(jnp.int32)
        run2 = _seg_cummax_stack(jax, jnp, prev_adj_row[None], seg)
        ends2 = jnp.where(seg_end[None, :], run2, -1)
        prev_adjacent = jnp.flip(
            _seg_cummax_stack(jax, jnp, jnp.flip(ends2, 1),
                              jnp.flip(seg_end)), 1)[0] != 0

    examine = has_lower & (~prev_adjacent | has_upper)
    new_row = (~prev_adjacent).astype(jnp.int32)
    keep_entry = examine & valid

    # stable compaction of kept rows; payload packed into the values
    kcomp = jnp.where(keep_entry, jnp.int64(0), jnp.int64(1) << 58) \
        | ridx.astype(jnp.int64)
    vA = k1s & ((jnp.int64(1) << 52) - 1)       # ga|gb|gc|pairing'
    vB2 = ((aa.astype(jnp.int64) << 20) | (dg.astype(jnp.int64) << 12)
           | (ll.astype(jnp.int64) << 4) | (seg.astype(jnp.int64) << 3)
           | (new_row.astype(jnp.int64) << 2) | (tag.astype(jnp.int64) << 1)
           | keep_entry.astype(jnp.int64))
    if _TR == 2:   # after examine/flag scans
        return _trunc(kcomp, vA, vB2)
    c2s = jax.lax.sort((kcomp, jnp.where(keep_entry, vA, 0),
                        jnp.where(keep_entry, vB2, 0)), num_keys=1)
    vAc, vBc = c2s[1], c2s[2]
    ga = ((vAc >> 39) & (MAX_CONT - 1)).astype(jnp.int32)
    gb = ((vAc >> 27) & (MAX_CONT - 1)).astype(jnp.int32)
    gc = ((vAc >> 26) & 1).astype(jnp.int32)
    pairing = ((vAc & (_POFF * 2 - 1)) - _POFF).astype(jnp.int32)
    aa = (vBc >> 20).astype(jnp.int32)
    dg = ((vBc >> 12) & 0xFF).astype(jnp.int32)
    ll = ((vBc >> 4) & 0xFF).astype(jnp.int32)
    segi = ((vBc >> 3) & 1).astype(jnp.bool_)
    new_row = ((vBc >> 2) & 1).astype(jnp.int32)
    tag = ((vBc >> 1) & 1).astype(jnp.int32)
    valid = (vBc & 1).astype(jnp.bool_)
    seg = segi | (ridx == 0)

    # chain segmentation with two-sided break test + exact fixpoint
    cps = aa + ll

    def segmax1(x, f):
        if use_scan:
            from . import scan_pallas as spk
            return spk.fused_scan((x,), (("max", 0),),
                                  (f.astype(jnp.int32),))[0]
        return _seg_cummax(jax, jnp, x, f)

    if _TR == 3:   # after compaction sort
        return _trunc(vAc, vBc)
    if chain_break >= 256:
        # Closed-form break test (no fixpoint).  Within a segment aa is
        # non-decreasing and ll <= 255 (8-bit field), so with
        # chain_break >= 256: (a) two entries within 255 aa units can
        # never break apart (a break needs an aa gap >= chain_break),
        # hence the running chain max at entry i equals the max cps
        # over trailing entries with aa > aa_{i-1} - 256; (b) any older
        # entry's cps <= aa + 255 < aa_{i-1} <= cps_{i-1} is dominated.
        # That value-window max is exactly prefix-max within 256-wide
        # aa bins joined with the previous bin's full max — two
        # segmented scans instead of a data-dependent while loop whose
        # round count equals the longest ambiguous run (the uniform
        # low-divergence workload drove it to ~10^4 rounds / ~2 min).
        binb = seg | ((ridx > 0) & ((aa >> 8) != jnp.roll(aa >> 8, 1)))
        cpse = jnp.where(valid, cps, -big)
        pbin = segmax1(cpse, binb)
        prevb = jnp.where(binb & (~seg), jnp.roll(pbin, 1), -big)
        prevf = segmax1(prevb, binb)
        WM = jnp.maximum(pbin, prevf)
        WMp = jnp.roll(WM, 1)
        brk = seg | ((~seg) & valid & (aa >= WMp + chain_break))
    else:
        Mx = segmax1(cps, seg)
        Mprev = jnp.roll(Mx, 1)
        cps_prev = jnp.roll(cps, 1)
        inner = (~seg) & valid
        definite = inner & (aa >= Mprev + chain_break)
        never = inner & (aa < cps_prev + chain_break)
        amb = inner & ~definite & ~never
        brk0 = seg | definite

        def fix_cond(st):
            return st[1]

        def fix_body(st):
            brk, _ = st
            Mc = segmax1(cps, brk)
            Mcp = jnp.roll(Mc, 1)
            nb = brk | (amb & (aa >= Mcp + chain_break))
            return nb, jnp.any(nb != brk)

        brk, _ = jax.lax.while_loop(fix_cond, fix_body,
                                    (brk0, jnp.bool_(True)))

    if _TR == 4:   # after break test
        return _trunc(brk.astype(jnp.int32))
    # per-chain aggregates: stacked forward scans, values at chain ends
    ch_end = jnp.roll(brk, -1) | (ridx == M2 - 1)
    agg_vals = (
        jnp.where(valid, -dg, -big),          # min via negation
        jnp.where(valid, dg, -big),
        jnp.where(valid, cps, -big),
        jnp.where(valid & (tag == 0), 1, 0),
        jnp.where(valid & (tag == 1), 1, 0),
        valid.astype(jnp.int32))
    first_vals = tuple(
        jnp.where(brk, x, -1)
        for x in (ga, gb, gc, pairing + (1 << 25), new_row, aa))
    if use_scan:
        from . import scan_pallas as spk
        outs = spk.fused_scan(
            (cps,) + agg_vals + first_vals,
            (("max", 0),) * 13, (brk.astype(jnp.int32),))
        ahgh_run = outs[0]
        run = outs[1:7]
        f_run = outs[7:13]
    else:
        ahgh_run = _seg_cummax(jax, jnp, cps, brk)
        run = _seg_cummax_stack(jax, jnp, jnp.stack(agg_vals), brk)
        f_run = _seg_cummax_stack(jax, jnp, jnp.stack(first_vals), brk)
    prev_ahgh = jnp.where(ridx == 0, 0, jnp.roll(ahgh_run, 1))
    novel = jnp.where(brk, ll,
                      jnp.clip(jnp.minimum(cps - prev_ahgh, ll), 0, None))
    novel = jnp.where(valid, novel, 0)
    # segmented coverage sum: per-chain i32 is safe while 255 * M2
    # fits (novel <= 2*KMER+..<= 255 per row)
    if use_scan and 255 * M2 < (1 << 31):
        cov_run = spk.fused_scan((novel,), (("sum", 0),),
                                 (brk.astype(jnp.int32),))[0]
    else:
        cov_run = _seg_cumsum(jax, jnp, novel, brk)

    ch_dgmin = (-run[0]).astype(jnp.int32)
    ch_dgmax = run[1].astype(jnp.int32)
    ch_ahgh = run[2].astype(jnp.int32)
    ch_mix_l = run[3] != 0
    ch_mix_u = run[4] != 0
    ch_valid = run[5] != 0
    cov = cov_run
    ch_ga = f_run[0].astype(jnp.int32)
    ch_gb = f_run[1].astype(jnp.int32)
    ch_gc = f_run[2].astype(jnp.int32)
    ch_pair = (f_run[3] - (1 << 25)).astype(jnp.int32)
    ch_new = f_run[4] != 0
    ch_alow = f_run[5].astype(jnp.int32)

    keep = ch_valid & (cov >= chain_min) \
        & (~(ch_mix_l & ~ch_mix_u) | ch_new) & ch_end

    # compact kept chains (in chain order) to tcap; raw tuples packed
    c1 = ((ch_ga.astype(jnp.int64) << 39) | (ch_gb.astype(jnp.int64) << 27)
          | (ch_gc.astype(jnp.int64) << 26)
          | (ch_pair.astype(jnp.int64) + _POFF))
    c2 = ((ch_alow.astype(jnp.int64) << 15)
          | (ch_dgmax.astype(jnp.int64) << 7) | ch_dgmin.astype(jnp.int64))
    # cov rides c3's high bits (ahgh < 2^31, cov < 2^31): the per-chain
    # seed coverage is the wave-count predictor the batch scheduler
    # groups tubes by (uncovered extent ~ error count ~ wave count)
    c3 = (cov.astype(jnp.int64) << 31) | ch_ahgh.astype(jnp.int64)
    kk = jnp.where(keep, jnp.int64(0), jnp.int64(1) << 58) \
        | ridx.astype(jnp.int64)
    osrt = jax.lax.sort((kk, jnp.where(keep, c1, 0),
                         jnp.where(keep, c2, 0),
                         jnp.where(keep, c3, 0)), num_keys=1)
    c1o, c2o, c3o = osrt[1][:tcap], osrt[2][:tcap], osrt[3][:tcap]
    ntubes = jnp.sum(keep.astype(jnp.int32))

    o_ga = ((c1o >> 39) & (MAX_CONT - 1)).astype(jnp.int32)
    o_gb = ((c1o >> 27) & (MAX_CONT - 1)).astype(jnp.int32)
    o_gc = ((c1o >> 26) & 1).astype(jnp.int32)
    o_pair = ((c1o & (_POFF * 2 - 1)) - _POFF).astype(jnp.int32)
    o_alow = (c2o >> 15).astype(jnp.int32)
    o_dgmax = ((c2o >> 7) & 0xFF).astype(jnp.int32)
    o_dgmin = (c2o & 0x7F).astype(jnp.int32)
    o_cov = (c3o >> 31).astype(jnp.int32)
    o_ahgh = (c3o & ((jnp.int64(1) << 31) - 1)).astype(jnp.int32)

    # contig-coordinate conversion (tcap-sized gather of the tiny table)
    alen = alens_by_rank[jnp.clip(o_ga, 0, alens_by_rank.shape[0] - 1)]
    dgmin = o_dgmin + (o_pair << BUCK_SHIFT)
    dgmax = o_dgmax + (o_pair << BUCK_SHIFT)
    is_c = o_gc != 0
    dgmin = jnp.where(is_c, dgmin + (alen - maxdag), dgmin - bmax)
    dgmax = jnp.where(is_c, dgmax + (alen - maxdag), dgmax - bmax)
    alow = jnp.where(is_c, o_alow + (alen - amax), o_alow)
    ahgh = jnp.where(is_c, o_ahgh + (alen - amax), o_ahgh)

    return (o_ga, o_gb, is_c, dgmin, dgmax, alow, ahgh, o_pair, o_cov,
            ntubes)


# ---------------------------------------------------------------------------
# Wrapper: GDB pair -> TubeBatch (host fallback when not applicable)
# ---------------------------------------------------------------------------

# Single-shot base cap: the two-orientation entry sort peaks at
# ~100 B/base (key build + sort in/out + sliced unpack), so 1.5*2^26
# bases (~10 GB peak) is the 16 GB-HBM envelope; beyond it (or on OOM
# inside it) the panel-streamed pipeline takes over.  Override with
# FASTGA_TPU_MAX_DEV_BASES.
_MAX_DEV_BASES = int(__import__("os").environ.get(
    "FASTGA_TPU_MAX_DEV_BASES", (1 << 26) + (1 << 25)))

_jit_cache = {}


def _tcap_for(nscap: int, tcap: int) -> int:
    """Tube-output cap scaled to the seed cap.  The chain sweep's cost
    is O(NS) regardless of tcap (tcap only sizes the output compaction
    arrays), so a generous cap is nearly free — while an undersized cap
    discards the whole seed phase (the r3 bench paid the pipeline twice:
    device_tubes overflowed its 32k default at ~113k tubes and the
    caller fell back to device_tubes_paneled)."""
    return min(max(int(tcap), _pad_bucket(nscap // 96)), 1 << 22)


def _pad_bucket(n: int) -> int:
    """Smallest cap >= n from {2^k, 1.5*2^k} (fewer wasted slots than
    pure pow2 while keeping the compile-shape count small)."""
    n = max(int(n), 1 << 12)
    p = 1 << (n - 1).bit_length()
    if n <= (p >> 1) + (p >> 2):
        return (p >> 1) + (p >> 2)
    return p


def _prep_genome(gdb, lens):
    """Host-side input prep for one genome (cheap; packed upload)."""
    import jax.numpy as jnp
    coff = np.zeros(len(lens), np.int64)
    if len(lens) > 1:
        coff[1:] = np.cumsum(lens)[:-1]
    total = int(lens.sum())
    N = _pad_bucket(total)
    from ..utils.dna import compress
    if (np.asarray(lens) % 4 == 0).all() and N % 4 == 0:
        # byte-aligned contigs: concatenate .bps slices directly
        packed_all = gdb._packed()
        bps = np.zeros(N // 4, np.uint8)
        o = 0
        for c in gdb.contigs:
            nb = c.clen // 4
            bps[o:o + nb] = packed_all[c.boff:c.boff + nb]
            o += nb
    else:
        # unpack-repack via get_contig (contig boundaries not
        # byte-aligned in .bps) — still host-cheap
        basespad = np.zeros(N, np.uint8)
        pos = 0
        for r in range(gdb.ncontig):
            c = gdb.get_contig(r)
            basespad[pos:pos + len(c)] = c
            pos += len(c)
        bps = compress(basespad)
    cont_of = np.zeros(N, np.int32)
    cont_of[:total] = np.repeat(
        np.arange(gdb.ncontig, dtype=np.int32), lens)
    cont_of[total:] = gdb.ncontig + 1
    from ..io.gix import _length_perm
    lens_eff = np.concatenate(
        [lens, np.full(max(0, 8 - len(lens)), KMER, np.int64)])
    perm, invp = _length_perm(lens_eff)
    Cpad = 1 << max(3, (len(lens) - 1).bit_length())
    coffp = np.zeros(Cpad, np.int32)
    coffp[:len(lens)] = coff
    clenp = np.zeros(Cpad, np.int32)
    clenp[:len(lens)] = lens
    invpp = np.zeros(Cpad, np.int32)
    invpp[:len(invp[:len(lens)])] = invp[:len(lens)]
    # cont_of stays a HOST array: the main gix path derives it on
    # device (uploading [N] int32 over the tunnel dominated big runs);
    # the sharded/paneled paths convert it once themselves
    return (jnp.asarray(bps), jnp.asarray(coffp), jnp.asarray(clenp),
            cont_of, jnp.asarray(invpp),
            np.int32(len(lens)), N)


def _gix_jit(N, Cpad, ecap):
    import jax
    key = ("gix2", N, Cpad, ecap)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda bps, coff, clen, invp, nc:
                     gix_arrays(bps, 0, coff, clen, invp, nc,
                                ecap=ecap))
        _jit_cache[key] = fn
    return fn


def _cand_jit(N, Cpad):
    import jax
    key = ("cand1", N, Cpad)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = jax.jit(driver_candidates)
        _jit_cache[key] = fn
    return fn


def _drvtab_jit(N, ecap):
    """Compact the unsorted driver candidates into a tight table: one
    12M-row sort (half the rows of the full two-orientation entry sort)
    whose keys fully order and compact the forward entries; the tight
    bucket then halves the combined merge stream every subsequent run."""
    import jax
    import jax.numpy as jnp
    key = ("drvtab", N, ecap)
    fn = _jit_cache.get(key)
    if fn is None:
        def build(C):
            w0a, w1a, w2a, ca, pa, oa, _l, nf, vs = C
            ka, kb_ = pack_entry_keys(jnp, vs != 0, w0a, w1a, w2a,
                                      ca, pa, oa)
            srt = jax.lax.sort((ka, kb_), num_keys=2)
            w0s, w1s, w2s, cs, ps, os = unpack_entry_keys(
                jnp, srt[0][:ecap], srt[1][:ecap])
            return (w0s, w1s, w2s, cs, ps, os, None, nf, None)

        fn = jax.jit(build)
        _jit_cache[key] = fn
    return fn


# Genomes above this padded-base cap are not device-cached: at 50 Mbp+
# the resident tables (~2.4 GB) crowd the chain sweep's panel
# temporaries out of a 16 GB chip's HBM.
_CACHE_MAX_N = 1 << 25


def _dev_cache(gdb, N=0):
    """Per-GDB cache of device-resident seed-phase arrays (the TPU
    analog of the reference's persisted .gix: steady-state runs against
    the same genome skip the index build entirely).  Lives on the GDB
    object so lifetime follows the caller's data; disable with
    FASTGA_TPU_NO_DEVCACHE=1."""
    import os
    if N > _CACHE_MAX_N or os.environ.get("FASTGA_TPU_NO_DEVCACHE") == "1":
        return {}
    c = getattr(gdb, "_fastga_dev_cache", None)
    if c is None:
        c = {}
        try:
            gdb._fastga_dev_cache = c
        except Exception:
            pass
    return c


def _merge_jit(E1, E2, nscap, acap, freq, soft, masks,
               presorted=False):
    import jax
    import jax.numpy as jnp
    key = ("mg2", E1, E2, nscap, acap, freq, soft, masks, presorted)
    fn = _jit_cache.get(key)
    if fn is None:
        def mg(T1, T2, mb1, mb2):
            out = merge_seeds(T1, T2, nscap, freq, acap, soft, masks,
                              mb1, mb2, presorted=presorted)
            pl, ac, ap, bcn, bp, bo, ns, nalive = out
            sidx = jnp.arange(nscap, dtype=jnp.int32)
            plsum = jnp.sum(jnp.where(sidx < ns, pl, 0))
            return pl, ac, ap, bcn, bp, bo, ns, nalive, plsum

        fn = jax.jit(mg)
        _jit_cache[key] = fn
    return fn


def _sym_jit(E1, E2, nscap1, nscap2, acap1, acap2, freq, soft, masks,
             presorted=False):
    """-S symmetric merge: normal pass + flip pass (FastGA.c:2410-2470)
    concatenated compactly into one seed stream."""
    import jax
    import jax.numpy as jnp
    key = ("sym2", E1, E2, nscap1, nscap2, acap1, acap2, freq, soft,
           masks, presorted)
    fn = _jit_cache.get(key)
    if fn is None:
        def mg(T1, T2, mb1, mb2):
            o1 = merge_seeds(T1, T2, nscap1, freq, acap1, soft, masks,
                             mb1, mb2, presorted=presorted)
            o2 = merge_seeds(T2, T1, nscap2, freq, acap2, soft, masks,
                             mb2, mb1, flip=True, presorted=presorted)
            (plA, acA, apA, bcA, bpA, boA, nsA, nalA) = o1
            (plB, acB, apB, bcB, bpB, boB, nsB, nalB) = o2
            nsAc = jnp.minimum(nsA, nscap1)

            def place(a1, a2):
                out = jnp.zeros(nscap1 + nscap2, jnp.int32)
                out = out.at[:nscap1].set(a1.astype(jnp.int32))
                # flip rows slide up against the normal pass's tail
                # ([nsA, nscap1) is padding, so overwriting is safe)
                return jax.lax.dynamic_update_slice(
                    out, a2.astype(jnp.int32), (nsAc,))

            pl = place(plA, plB)
            ac = place(acA, acB)
            ap = place(apA, apB)
            bcn = place(bcA, bcB)
            bp = place(bpA, bpB)
            bo = place(boA, boB)
            ns = nsA + nsB
            over = ((nsA > nscap1).astype(jnp.int32)
                    + (nsB > nscap2).astype(jnp.int32)
                    + (nalA > acap1).astype(jnp.int32)
                    + (nalB > acap2).astype(jnp.int32))
            i1 = jnp.arange(nscap1, dtype=jnp.int32)
            i2 = jnp.arange(nscap2, dtype=jnp.int32)
            plsum = (jnp.sum(jnp.where(i1 < nsA, plA, 0))
                     + jnp.sum(jnp.where(i2 < nsB, plB, 0)))
            return pl, ac, ap, bcn, bp, bo, ns, over, plsum

        fn = jax.jit(mg)
        _jit_cache[key] = fn
    return fn


def _chain_jit(nscap, tcap, chain_break, chain_min):
    import jax
    key = ("ch2", nscap, tcap, chain_break, chain_min)
    fn = _jit_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda sd, ns, amax_, bmax_, alens:
                     chain_tubes_dev(sd, ns, amax_, bmax_, alens,
                                     tcap, chain_break, chain_min))
        _jit_cache[key] = fn
    return fn


def _upload_table(t):
    """Host GixTable -> device entry arrays (for masked tables, where
    the mask bytes only exist host-side).  Returns (T tuple, maskb, E)."""
    import jax.numpy as jnp
    E = _pad_bucket(t.n)
    khi, klo = t.khi_klo()

    def pad32(x, fill=0):
        a = np.full(E, fill, np.int32)
        a[:len(x)] = x
        return jnp.asarray(a)

    w0 = pad32((khi >> np.uint64(32)).astype(np.uint32).view(np.int32))
    w1 = pad32((khi & np.uint64(0xFFFFFFFF)).astype(np.uint32)
               .view(np.int32))
    w2 = pad32((klo.astype(np.uint32) << 16).view(np.int32))
    T = (w0, w1, w2, pad32(t.cont), pad32(t.post),
         pad32(t.comp.astype(np.int32)), pad32(np.minimum(t.lcp, KMER)),
         np.int32(t.n), None)
    return T, pad32(t.maskb), E


# Largest seed bucket the device chain fits in HBM (~420 B/seed-cap of
# stacked sweep temporaries; 1.5*2^24 ~ 10.6 GB, proven at 50 Mbp scale).
CHAIN_DEV_CAP = 3 << 23

# Beyond ~6x the panel cap the acont pre-sort itself outgrows HBM
# alongside the panel temporaries; past that the host sweep takes over.
CHAIN_PANEL_MAX = CHAIN_DEV_CAP * 6


def _seedsort_jit(NS, Cpad):
    """Stable acont-major sort of the seed stream (payload packed into
    two value words) + per-contig panel boundaries via searchsorted."""
    import jax
    import jax.numpy as jnp
    key = ("seedsort", NS, Cpad, CHAIN_DEV_CAP)
    fn = _jit_cache.get(key)
    if fn is None:
        def run(pl, ac, ap, bcn, bp, bo, ns):
            idx = jnp.arange(NS, dtype=jnp.int64)
            valid = idx < ns
            k = jnp.where(valid, (ac.astype(jnp.int64) << 34) | idx,
                          _I64MAX)
            v1 = ((pl.astype(jnp.int64) << 56)
                  | (ap.astype(jnp.int64) << 28)
                  | bp.astype(jnp.int64))
            v2 = (bcn.astype(jnp.int64) << 1) | bo.astype(jnp.int64)
            srt = jax.lax.sort(
                (k, jnp.where(valid, v1, 0), jnp.where(valid, v2, 0)),
                num_keys=1)
            achi = jnp.where(srt[0] == _I64MAX, jnp.int64(MAX_CONT),
                             srt[0] >> 34)
            bounds = jnp.searchsorted(
                achi, jnp.arange(Cpad + 1, dtype=jnp.int64))
            # tail pad one panel so every dynamic_slice window fits
            # without start clamping (a clamped start would shift the
            # window off its panel offset)
            zpad = jnp.zeros(CHAIN_DEV_CAP, jnp.int64)
            return (jnp.concatenate([srt[0], zpad + _I64MAX]),
                    jnp.concatenate([srt[1], zpad]),
                    jnp.concatenate([srt[2], zpad]),
                    bounds.astype(jnp.int32))

        fn = jax.jit(run)
        _jit_cache[key] = fn
    return fn


def _chain_panel_jit(CAP, tcap, chain_break, chain_min):
    """Chain sweep over one acont-contiguous panel of the sorted packed
    seed stream (dynamic offset, static panel cap)."""
    import jax
    import jax.numpy as jnp
    key = ("chpanel", CAP, tcap, chain_break, chain_min)
    fn = _jit_cache.get(key)
    if fn is None:
        def run(k, v1, v2, off, npan, amax_, bmax_, alens):
            ks = jax.lax.dynamic_slice(k, (off,), (CAP,))
            v1s = jax.lax.dynamic_slice(v1, (off,), (CAP,))
            v2s = jax.lax.dynamic_slice(v2, (off,), (CAP,))
            ac = ((ks >> 34) & (MAX_CONT - 1)).astype(jnp.int32)
            pl = (v1s >> 56).astype(jnp.int32)
            ap = ((v1s >> 28) & (MAX_POST - 1)).astype(jnp.int32)
            bp = (v1s & (MAX_POST - 1)).astype(jnp.int32)
            bcn = (v2s >> 1).astype(jnp.int32)
            bo = (v2s & 1).astype(jnp.int32)
            return chain_tubes_dev((pl, ac, ap, bcn, bp, bo), npan,
                                   amax_, bmax_, alens, tcap,
                                   chain_break, chain_min)

        fn = jax.jit(run)
        _jit_cache[key] = fn
    return fn


def _chain_dbg(msg):
    import os
    if os.environ.get("FASTGA_DEVPIPE_DEBUG"):
        import sys
        import time as _t
        sys.stderr.write(f"devpipe chain {msg} [t={_t.time() % 1e4:.2f}]\n")


def _run_chain_paneled(seeds6, ns_host, nscap, tcap, chain_break,
                       chain_min, amax, bmax, alens_pad):
    """Device chain sweep past the single-shot HBM envelope: one stable
    acont-major sort, then per-panel sweeps over contiguous A-contig
    ranges (chains never cross an A-contig and the sweep's primary key
    is the A-contig, so panel concatenation is bit-identical to the
    monolithic sweep — the same argument as the host batching,
    ops/chain.chain_tubes).  Returns host tube arrays or None when a
    single contig's seeds exceed the panel cap (host fallback)."""
    import time as _t

    import jax.numpy as jnp
    pl, ac, ap, bcn, bp, bo = seeds6
    cap = min(_pad_bucket(max(ns_host, 1 << 13)), pl.shape[0])
    t0 = _t.time()
    k, v1, v2, bounds = _seedsort_jit(cap, alens_pad.shape[0])(
        *(x[:cap] for x in (pl, ac, ap, bcn, bp, bo)),
        np.int64(ns_host))
    bounds = np.asarray(bounds).astype(np.int64)
    _chain_dbg(f"seedsort cap={cap}: {_t.time() - t0:.2f}s")
    # greedy panels: largest contig boundary within CAP of the start.
    # Half the single-shot cap: the packed sorted stream (and, on the
    # first panelled run, leftover merge arrays) share HBM with the
    # sweep's ~420 B/row temporaries.
    PANEL = CHAIN_DEV_CAP // 2
    panels = []
    start = 0
    while start < ns_host:
        hi = int(np.searchsorted(bounds, start + PANEL, side="right")) - 1
        end = int(bounds[hi])
        if end <= start:
            # one contig's seeds exceed the panel
            return _decline("chain: one contig's seeds exceed the "
                            "device panel")
        panels.append((start, min(end, ns_host)))
        start = end
    pfn = _chain_panel_jit(PANEL, tcap, chain_break, chain_min)
    outs = []
    total = 0
    for pi, (off, end) in enumerate(panels):
        t0 = _t.time()
        res = pfn(k, v1, v2, np.int64(off), np.int32(end - off),
                  np.int32(amax), np.int32(bmax), jnp.asarray(alens_pad))
        res = [np.asarray(x) for x in res]
        nt = int(res[9])
        _chain_dbg(f"panel {pi + 1}/{len(panels)} rows={end - off} "
                   f"nt={nt}: {_t.time() - t0:.2f}s")
        if nt > tcap:
            return _decline("chain: panel tube overflow")
        outs.append([x[:nt] for x in res[:9]])
        total += nt
    if not outs:
        z = [np.zeros(0, np.int64)] * 9
        return tuple(z) + (np.int64(0),)
    cat = [np.concatenate([o[i] for o in outs]) for i in range(9)]
    return tuple(cat) + (np.int64(total),)


def _run_chain(tubeify, seeds_out, nscap, tcap, chain_break, chain_min,
               amax, bmax, alens_by_rank):
    import jax.numpy as jnp
    (pl, ac, ap, bcn, bp, bo, ns, nalive, plsum) = seeds_out
    alens_pad = np.zeros(1 << max(3, (len(alens_by_rank) - 1)
                                  .bit_length()), np.int32)
    alens_pad[:len(alens_by_rank)] = alens_by_rank
    # adaptive sizing: the seed caps are worst-case (~2 entries/bp) but
    # real seed counts are far smaller — slice to the tight bucket so
    # the chain sorts run on 2*bucket rows instead of 2*nscap
    ns_host = int(np.asarray(ns))
    cap = _pad_bucket(max(ns_host, 1 << 13))
    import os as _os
    if CHAIN_DEV_CAP < cap <= CHAIN_PANEL_MAX \
            and _os.environ.get("FASTGA_TPU_CHAIN") != "host":
        # the monolithic sweep's doubled-stream temporaries exceed HBM
        # at this bucket: panel the device sweep by A-contig ranges
        res = _run_chain_paneled(
            (pl, ac, ap, bcn, bp, bo), ns_host, nscap, tcap,
            chain_break, chain_min, amax, bmax, alens_pad)
        if res is not None:
            return res, ns, nalive, plsum
        _chain_dbg(f"paneled declined (ns={ns_host}) -> host sweep")
    if cap > CHAIN_DEV_CAP:
        # beyond the paneled envelope (or a single contig overflows a
        # panel) — run the memory-bounded host sweep instead (chain.py
        # batches per A-contig panel; bit-identical to the device sweep)
        import time as _t
        t0 = _t.time()
        from . import chain as chainm
        from .merge import SeedBatch
        sb = SeedBatch(
            plen=np.asarray(pl)[:ns_host].astype(np.uint8),
            acont=np.asarray(ac)[:ns_host].astype(np.int32),
            apost=np.asarray(ap)[:ns_host].astype(np.int32),
            bcont=np.asarray(bcn)[:ns_host].astype(np.int32),
            bpost=np.asarray(bp)[:ns_host].astype(np.int32),
            bcomp=np.asarray(bo)[:ns_host].astype(bool))
        t = chainm.chain_tubes(sb, int(amax), int(bmax),
                               np.asarray(alens_by_rank),
                               chain_break, chain_min)
        _chain_dbg(f"host sweep ns={ns_host}: {_t.time() - t0:.2f}s")
        res = (t.acont.astype(np.int64), t.bcont.astype(np.int64),
               t.comp.astype(np.int64), t.dgmin.astype(np.int64),
               t.dgmax.astype(np.int64), t.alow, t.ahgh, t.pairing,
               t.cov, np.int64(t.n))
        return res, ns, nalive, plsum
    if cap < nscap:
        pl, ac, ap, bcn, bp, bo = (
            x[:cap] for x in (pl, ac, ap, bcn, bp, bo))
        nscap = cap
    import time as _t2
    t0 = _t2.time()
    res = _chain_jit(nscap, tcap, chain_break, chain_min)(
        (pl, ac, ap, bcn, bp, bo), ns, np.int32(amax), np.int32(bmax),
        jnp.asarray(alens_pad))
    _chain_dbg(f"monolithic ns={ns_host} cap={nscap}: "
               f"{_t2.time() - t0:.2f}s (dispatch)")
    return res, ns, nalive, plsum


def _finish_tubes(res, ns, nalive, plsum, nscap, acap, tcap, extra_checks):
    from .chain import TubeBatch
    (ga, gb, gc, dgmin, dgmax, alow, ahgh, pair, cov, nt) = \
        [np.asarray(x) for x in res]
    ns, nalive, plsum = int(ns), int(nalive), int(plsum)
    # tube overflow test vs the emitted array length: == tcap for the
    # fixed-cap device sweep, exact (never overflows) for the host sweep
    if ns > nscap or nalive > acap or int(nt) > len(ga) or extra_checks():
        return _decline("seed/tube caps exceeded")
    n = int(nt)
    tubes = TubeBatch(
        acont=ga[:n].astype(np.int32), bcont=gb[:n].astype(np.int32),
        comp=np.asarray(gc[:n]).astype(bool),
        dgmin=dgmin[:n].astype(np.int32),
        dgmax=dgmax[:n].astype(np.int32), alow=alow[:n].astype(np.int64),
        ahgh=ahgh[:n].astype(np.int64), pairing=pair[:n].astype(np.int64),
        cov=cov[:n].astype(np.int64))
    return tubes, ns, plsum


def _self_jit(E1, nscap, acap, freq, soft, masks):
    import jax
    import jax.numpy as jnp
    key = ("self2", E1, nscap, acap, freq, soft, masks)
    fn = _jit_cache.get(key)
    if fn is None:
        def sf(T1, mb1):
            out = self_seeds(T1, nscap, freq, acap, soft, masks, mb1)
            pl, ac, ap, bcn, bp, bo, ns, nalive = out
            sidx = jnp.arange(nscap, dtype=jnp.int32)
            plsum = jnp.sum(jnp.where(sidx < ns, pl, 0))
            return pl, ac, ap, bcn, bp, bo, ns, nalive, plsum

        fn = jax.jit(sf)
        _jit_cache[key] = fn
    return fn


def device_tubes_tables(t1, t2, alens_by_rank, amax: int, bmax: int,
                        freq: int = 10, chain_break: int = 2000,
                        chain_min: int = 170, tcap: int = 1 << 15,
                        soft_mask: bool = False,
                        symmetric: bool = False):
    """TubeBatch from host GixTables uploaded to the device (pair when
    t2 is not t1, else self comparison).  Used when mask bytes are in
    play (they only exist on host tables); returns None when caps or
    field widths are exceeded.  ``symmetric`` adds the -S flip pass."""
    from jax import enable_x64

    selfish = t2 is t1
    if freq > MAX_FREQ:
        return _decline(f"-f {freq} > device merge cap {MAX_FREQ}")
    if t1.n >= (1 << 26) or (not selfish and t2.n >= (1 << 26)):
        return _decline("GIX table exceeds 2^26 entries")
    if len(t1.perm) >= MAX_CONT or len(t2.perm) >= MAX_CONT:
        return _decline(f">= {MAX_CONT} contigs")
    if amax + 2 * bmax >= (1 << 30) or max(amax, bmax) >= MAX_POST:
        return _decline("contig length exceeds device field width")

    has_masks = bool(t1.maskb.any()) or bool(t2.maskb.any()) or soft_mask

    with enable_x64():
        T1, mb1, E1 = _upload_table(t1)
        NSCAP = max(E1 * 2, 1 << 13)
        ACAP = max(E1, 1 << 12)
        if selfish:
            sfn = _self_jit(E1, NSCAP, ACAP, freq, soft_mask, has_masks)
            out = sfn(T1, mb1)
        elif symmetric:
            T2, mb2, E2 = _upload_table(t2)
            NSCAP2 = max(E2 * 2, 1 << 13)
            ACAP2 = max(E2, 1 << 12)
            yfn = _sym_jit(E1, E2, NSCAP, NSCAP2, ACAP, ACAP2, freq,
                           soft_mask, has_masks, presorted=True)
            (pl, ac, ap, bcn, bp, bo, ns, over, plsum) = yfn(
                T1, T2, mb1, mb2)
            if int(np.asarray(over)) > 0:
                return _decline("symmetric merge seed cap exceeded")
            NSCAP = NSCAP + NSCAP2
            out = (pl, ac, ap, bcn, bp, bo, ns, np.int32(0), plsum)
        else:
            T2, mb2, E2 = _upload_table(t2)
            mfn = _merge_jit(E1, E2, NSCAP, ACAP, freq, soft_mask,
                             has_masks, presorted=True)
            out = mfn(T1, T2, mb1, mb2)
        tcap_eff = _tcap_for(NSCAP, tcap)
        for _ in range(3):
            res, ns, nalive, plsum = _run_chain(
                None, out, NSCAP, tcap_eff, chain_break, chain_min,
                amax, bmax, alens_by_rank)
            nt_host = int(np.asarray(res[9]))
            if nt_host <= tcap_eff or tcap_eff >= (1 << 22):
                break
            tcap_eff = min(_pad_bucket(nt_host + (nt_host >> 2)),
                           1 << 22)
        out2 = tuple(np.asarray(x) for x in res) + (
            np.asarray(ns), np.asarray(nalive), np.asarray(plsum))
    res, ns, nalive, plsum = out2[:10], out2[10], out2[11], out2[12]
    return _finish_tubes(res, ns, nalive, plsum, NSCAP, ACAP, tcap_eff,
                         lambda: False)


# ---------------------------------------------------------------------------
# Panel-streamed pipeline (P10): memory-bounded operation at Gbp scale.
# The kmer space splits into equal 24-bit-prefix panels (the reference's
# NPARTS sized for 4GB sorts, GIXmake.c:1907-1920); candidates are
# re-scanned per panel in position blocks, compacted into a bounded panel
# buffer, sorted, merged, and the seeds accumulate on device for one
# global chain pass.  Work grows by ~P x candidate-gen (elementwise,
# cheap); peak memory drops by ~P x.
# ---------------------------------------------------------------------------

def _panel_scan_jit(NB: int, B: int, cap: int, P: int, Cpad: int,
                    nblocks: int):
    """Per-genome, per-panel candidate collection: lax.scan over position
    blocks; each step generates candidates for its block, masks to the
    panel's prefix range, front-compacts with a local sort, and appends
    into the panel buffer with a dynamic slice."""
    import jax
    import jax.numpy as jnp
    key = ("pscan", NB, B, cap, P, Cpad, nblocks)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    HB, HE = 32, 64
    LH = HB + B + HE

    def run(bps, coff, clen, cont_of, invp, nc, panel):
        lo = panel * (NPREFIX // P)
        hi = (panel + 1) * (NPREFIX // P)

        def step(carry, i0):
            buf_a, buf_b, off, over = carry
            i = (i0 - HB) + jnp.arange(LH, dtype=jnp.int32)
            NP4 = bps.shape[0]
            ic = jnp.clip(i, 0, 4 * NP4 - 1)
            bases = (bps[ic >> 2]
                     >> ((ic & 3) << 1).astype(jnp.uint8)) & 3
            co = cont_of[jnp.clip(ic, 0, cont_of.shape[0] - 1)]
            locp = i - coff[jnp.clip(co, 0, Cpad - 1)]
            lnp = clen[jnp.clip(co, 0, Cpad - 1)]
            crk = invp[jnp.clip(co, 0, Cpad - 1)]
            lix = jnp.arange(LH, dtype=jnp.int32)
            inb = (co < nc) & (lix >= HB) & (lix < HB + B)
            ok, w0, w1, w2, cc, pp, oo = entry_candidates(
                jnp, bases.astype(jnp.int32), locp, lnp, crk, inb)
            pre24 = ((w0.astype(jnp.uint32).astype(jnp.int64) >> 8)
                     ).astype(jnp.int32)
            ok = ok & (pre24 >= lo) & (pre24 < hi)
            ka, kb = pack_entry_keys(jnp, ok, w0, w1, w2, cc, pp, oo)
            srt = jax.lax.sort((ka, kb), num_keys=2)
            kas, kbs = srt
            nval = jnp.sum(ok.astype(jnp.int32))
            take = jnp.minimum(nval, cap - off)
            # append [take] rows at off (rows beyond take stay MAX);
            # buffers carry 2*LH pad rows so the fixed-length update
            # window never clamps
            sl = jnp.arange(2 * LH, dtype=jnp.int32)
            kas = jnp.where(sl < take, kas, _I64MAX)
            kbs = jnp.where(sl < take, kbs, _I64MAX)
            upd_a = jax.lax.dynamic_update_slice(
                jnp.full(cap + 2 * LH, _I64MAX, jnp.int64), kas, (off,))
            upd_b = jax.lax.dynamic_update_slice(
                jnp.full(cap + 2 * LH, _I64MAX, jnp.int64), kbs, (off,))
            # kb carries the validity signal (a valid all-T kmer can
            # legitimately have ka == MAX; kb always has bit 63 clear)
            buf_b = jnp.minimum(buf_b, upd_b)
            buf_a = jnp.where(upd_b != _I64MAX, upd_a, buf_a)
            return (buf_a, buf_b, (off + take).astype(jnp.int32),
                    (over + (nval - take)).astype(jnp.int32)), None

        i0s = jnp.arange(nblocks, dtype=jnp.int32) * B
        init = (jnp.full(cap + 2 * LH, _I64MAX, jnp.int64),
                jnp.full(cap + 2 * LH, _I64MAX, jnp.int64),
                jnp.int32(0), jnp.int32(0))
        (ba, bb, off, over), _ = jax.lax.scan(step, init, i0s)
        srt = jax.lax.sort((ba[:cap], bb[:cap]), num_keys=2)
        w0, w1, w2, cs, ps, os_ = unpack_entry_keys(jnp, srt[0], srt[1])
        lcp = adjacent_lcp(jnp, w0, w1, w2)
        vs = (jnp.arange(cap, dtype=jnp.int32) < off).astype(jnp.int32)
        return (w0, w1, w2, cs, ps, os_, lcp, off, vs), over

    fn = jax.jit(run, static_argnames=())
    _jit_cache[key] = fn
    return fn


def _append_seeds_jit(nscap_panel: int, gcap: int):
    """Append one panel's packed seeds into the global device buffer."""
    import jax
    import jax.numpy as jnp
    key = ("sapp", nscap_panel, gcap)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    def run(g1, g2, goff, pl, ac, ap, bcn, bp, bo, ns):
        s1 = ((pl.astype(jnp.int64) << 40)
              | (ac.astype(jnp.int64) << 28) | ap.astype(jnp.int64))
        s2 = ((bcn.astype(jnp.int64) << 29)
              | (bp.astype(jnp.int64) << 1) | bo.astype(jnp.int64))
        sl = jnp.arange(nscap_panel, dtype=jnp.int32)
        take = jnp.minimum(ns, gcap - goff)
        s1 = jnp.where(sl < take, s1, _I64MAX)
        s2 = jnp.where(sl < take, s2, _I64MAX)
        u1 = jax.lax.dynamic_update_slice(
            jnp.full(gcap, _I64MAX, jnp.int64),
            s1[:min(nscap_panel, gcap)], (goff,))
        u2 = jax.lax.dynamic_update_slice(
            jnp.full(gcap, _I64MAX, jnp.int64),
            s2[:min(nscap_panel, gcap)], (goff,))
        g1 = jnp.minimum(g1, u1)
        g2 = jnp.where(u1 != _I64MAX, u2, g2)
        return g1, g2, goff + take, ns - take

    fn = jax.jit(run)
    _jit_cache[key] = fn
    return fn


def _unpack_seeds_jit(gcap: int):
    import jax
    import jax.numpy as jnp
    key = ("sunp", gcap)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    def run(g1, g2):
        pl = (g1 >> 40).astype(jnp.int32)
        ac = ((g1 >> 28) & (MAX_CONT - 1)).astype(jnp.int32)
        ap = (g1 & (MAX_POST - 1)).astype(jnp.int32)
        bcn = ((g2 >> 29) & (MAX_CONT - 1)).astype(jnp.int32)
        bp = ((g2 >> 1) & (MAX_POST - 1)).astype(jnp.int32)
        bo = (g2 & 1).astype(jnp.int32)
        return pl, ac, ap, bcn, bp, bo

    fn = jax.jit(run)
    _jit_cache[key] = fn
    return fn


def device_tubes_paneled(gdb1, gdb2, alens_by_rank, freq: int = 10,
                         chain_break: int = 2000, chain_min: int = 170,
                         tcap: int = 1 << 17, panels: int = 0,
                         verbose: bool = False):
    """Memory-bounded pipeline for genomes beyond the single-shot HBM
    budget: kmer-panel streaming with on-device seed accumulation.
    Bit-identical to device_tubes / the host path.

    Pass the same GDB object twice (or ``gdb2=None``) for paneled
    self-comparison: adaptamer groups are runs of equal kmers and the
    panels split on the 24-bit (12-base) kmer prefix, while group
    membership requires a >=12-base shared prefix — so no group spans a
    panel boundary and panel concatenation is bit-identical to the
    single-shot self pipeline (same argument as the pair merge)."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from .chain import TubeBatch

    selfish = gdb2 is None or gdb2 is gdb1
    if selfish:
        gdb2 = gdb1
    lens1 = gdb1.contig_lengths()
    lens2 = lens1 if selfish else gdb2.contig_lengths()
    if len(lens1) >= MAX_CONT or len(lens2) >= MAX_CONT:
        return _decline(f">= {MAX_CONT} contigs")
    amax, bmax = int(lens1.max()), int(lens2.max())
    if amax + 2 * bmax >= (1 << 30) or max(amax, bmax) >= MAX_POST:
        return _decline("contig length exceeds device field width")
    if freq > MAX_FREQ:
        return _decline(f"-f {freq} > device merge cap {MAX_FREQ}")
    tot1, tot2 = int(lens1.sum()), int(lens2.sum())

    with enable_x64():
        prep1 = _prep_genome(gdb1, lens1)
        prep2 = prep1 if selfish else _prep_genome(gdb2, lens2)
        N1, N2 = prep1[6], prep2[6]
        NB = max(N1, N2)
        if panels <= 0:
            # size panels so a panel's merge stream stays ~16M rows
            panels = max(2, -(-(2 * NB) // (1 << 24)))
            panels = 1 << (panels - 1).bit_length()
        P = panels
        B = 1 << 22                      # positions per scan block
        nblocks = -(-NB // B)
        # per-panel caps: ~1.1 entries/bp / P with 2x slack
        cap1 = _pad_bucket(max((2 * N1) // P, 1 << 14))
        cap2c = _pad_bucket(max((2 * N2) // P, 1 << 14))
        # self fan-out is up to freq-2 per entry (vs ~1 for pairs)
        NSCAP_P = max(2 * cap1 if selfish else cap1, 1 << 13)
        GCAP = _pad_bucket(max(tot1, 1) * 2)

        scan1 = _panel_scan_jit(N1, B, cap1, P, len(prep1[1]), nblocks)
        scan2 = scan1 if selfish else _panel_scan_jit(
            N2, B, cap2c, P, len(prep2[1]), nblocks)
        # upload the big position maps ONCE (the per-panel loop would
        # otherwise re-upload them every iteration)
        cof1_d = jnp.asarray(prep1[3])
        cof2_d = cof1_d if selfish else jnp.asarray(prep2[3])
        acap_p = max(cap1 if selfish else cap1 // 2, 1 << 12)
        if selfish:
            sfn = _self_jit(cap1, NSCAP_P, acap_p, freq, False, False)
        else:
            mfn = _merge_jit(cap1, cap2c, NSCAP_P, acap_p,
                             freq, False, False, presorted=True)
        afn = _append_seeds_jit(NSCAP_P, GCAP)

        g1 = jnp.full(GCAP, _I64MAX, jnp.int64)
        g2 = jnp.full(GCAP, _I64MAX, jnp.int64)
        goff = jnp.int32(0)
        over_tot = 0
        nseeds_tot = 0
        plsum_tot = 0
        import os
        import sys
        import time as _t
        dbg = os.environ.get("FASTGA_DEVPIPE_DEBUG") or (
            "1" if verbose else "")
        for p in range(P):
            t0 = _t.time()
            T1, ova = scan1(prep1[0], prep1[1], prep1[2], cof1_d,
                            prep1[4], np.int32(prep1[5]), np.int32(p))
            if selfish:
                T2, ovb = T1, np.int32(0)
                out = sfn(T1, None)
            else:
                T2, ovb = scan2(prep2[0], prep2[1], prep2[2], cof2_d,
                                prep2[4], np.int32(prep2[5]), np.int32(p))
                out = mfn(T1, T2, None, None)
            (pl, ac, ap, bcn, bp, bo, ns, nalive, plsum) = out
            g1, g2, goff, lost = afn(g1, g2, goff, pl, ac, ap, bcn, bp,
                                     bo, ns)
            over = int(np.asarray(ova)) + int(np.asarray(ovb)) \
                + int(np.asarray(lost)) \
                + int(int(np.asarray(ns)) > NSCAP_P) \
                + int(int(np.asarray(nalive)) > acap_p)
            over_tot += over
            nseeds_tot += int(np.asarray(ns))
            plsum_tot += int(np.asarray(plsum))
            if dbg:
                sys.stderr.write(
                    f"devpipe panel {p+1}/{P}: ns={int(np.asarray(ns))} "
                    f"over={over} {_t.time()-t0:.2f}s\n")
            if over_tot:
                return _decline("paneled merge seed cap exceeded")
            del T1, T2, out
        spl, sac, sap, sbc, sbp, sbo = _unpack_seeds_jit(GCAP)(g1, g2)
        del g1, g2
        tcap_eff = _tcap_for(GCAP, tcap)
        seeds9 = (spl, sac, sap, sbc, sbp, sbo, goff,
                  jnp.int32(0), jnp.int32(0))
        for _ in range(3):
            res, ns_, nal_, pls_ = _run_chain(
                None, seeds9, GCAP, tcap_eff, chain_break, chain_min,
                amax, bmax, alens_by_rank)
            nt_host = int(np.asarray(res[9]))
            if nt_host <= tcap_eff or tcap_eff >= (1 << 22):
                break
            tcap_eff = min(_pad_bucket(nt_host + (nt_host >> 2)),
                           1 << 22)
        outv = tuple(np.asarray(x) for x in res) + (np.asarray(goff),)
    (ga, gb, gc, dgmin, dgmax, alow, ahgh, pair, cov, nt,
     goff_h) = outv
    if int(goff_h) != nseeds_tot or int(nt) > len(ga):
        return _decline("paneled chain tube cap exceeded")
    n = int(nt)
    tubes = TubeBatch(
        acont=ga[:n].astype(np.int32), bcont=gb[:n].astype(np.int32),
        comp=np.asarray(gc[:n]).astype(bool),
        dgmin=dgmin[:n].astype(np.int32),
        dgmax=dgmax[:n].astype(np.int32), alow=alow[:n].astype(np.int64),
        ahgh=ahgh[:n].astype(np.int64), pairing=pair[:n].astype(np.int64),
        cov=cov[:n].astype(np.int64))
    return tubes, nseeds_tot, plsum_tot


def device_tubes_self(gdb1, alens_by_rank, freq: int = 10,
                      chain_break: int = 2000, chain_min: int = 170,
                      tcap: int = 1 << 15):
    """Self-comparison TubeBatch with the GIX built on device (unmasked
    genomes; masked tables go through device_tubes_tables)."""
    from jax import enable_x64

    lens1 = gdb1.contig_lengths()
    if int(lens1.sum()) == 0 or int(lens1.sum()) > _MAX_DEV_BASES:
        return _decline("genome exceeds single-shot device bases")
    if len(lens1) >= MAX_CONT:
        return _decline(f">= {MAX_CONT} contigs")
    if freq > MAX_FREQ:
        return _decline(f"-f {freq} > device merge cap {MAX_FREQ}")
    amax = int(lens1.max())
    if 3 * amax >= (1 << 30) or amax >= MAX_POST:
        return _decline("contig length exceeds device field width")

    bps1, coff1, clen1, cof1, invp1, nc1, N1 = _prep_genome(gdb1, lens1)
    E1 = max(1 << 12, N1)
    NSCAP = max(E1 * 2, 1 << 13)
    ACAP = max(E1, 1 << 12)

    with enable_x64():
        T1 = _gix_jit(N1, len(coff1), E1)(bps1, coff1, clen1,
                                          invp1, nc1)
        sfn = _self_jit(E1, NSCAP, ACAP, freq, False, False)
        out = sfn(T1, None)
        ne1 = T1[7]
        del T1
        tcap_eff = _tcap_for(NSCAP, tcap)
        for _ in range(3):
            res, ns, nalive, plsum = _run_chain(
                None, out, NSCAP, tcap_eff, chain_break, chain_min,
                amax, amax, alens_by_rank)
            nt_host = int(np.asarray(res[9]))
            if nt_host <= tcap_eff or tcap_eff >= (1 << 22):
                break
            tcap_eff = min(_pad_bucket(nt_host + (nt_host >> 2)),
                           1 << 22)
        out2 = tuple(np.asarray(x) for x in res) + (
            np.asarray(ns), np.asarray(nalive), np.asarray(plsum),
            np.asarray(ne1))
    res, ns, nalive, plsum, ne1 = out2[:10], out2[10], out2[11], \
        out2[12], out2[13]
    return _finish_tubes(res, ns, nalive, plsum, NSCAP, ACAP, tcap_eff,
                         lambda: int(ne1) > E1)


def device_tubes(gdb1, gdb2, alens_by_rank, freq: int = 10,
                 chain_break: int = 2000, chain_min: int = 170,
                 tcap: int = 1 << 15, verbose: bool = False,
                 symmetric: bool = False):
    """TubeBatch for a genome pair via the device pipeline, or None when
    the device path does not apply (self comparison and masked tables
    are handled by the table-upload variant; here: size/caps exceeded).
    ``symmetric`` adds the -S flip pass (genome 1 then gets a full
    two-orientation table, since flip members need rc entries for the
    lcp/frequency windows)."""
    import jax
    import jax.numpy as jnp

    from .chain import TubeBatch

    lens1 = gdb1.contig_lengths()
    lens2 = gdb2.contig_lengths()
    tot = int(lens1.sum()) + int(lens2.sum())
    if tot == 0 or int(lens1.sum()) > _MAX_DEV_BASES \
            or int(lens2.sum()) > _MAX_DEV_BASES:
        return _decline("genome exceeds single-shot device bases")
    if len(lens1) >= MAX_CONT or len(lens2) >= MAX_CONT:
        return _decline(f">= {MAX_CONT} contigs")
    amax, bmax = int(lens1.max()), int(lens2.max())
    if amax + 2 * bmax >= (1 << 30) or max(amax, bmax) >= MAX_POST:
        return _decline("contig length exceeds device field width")
    if freq > MAX_FREQ:
        return _decline(f"-f {freq} > device merge cap {MAX_FREQ}")

    N1 = _pad_bucket(int(lens1.sum()))
    N2 = _pad_bucket(int(lens2.sum()))
    cache1 = _dev_cache(gdb1, N1)
    cache2 = _dev_cache(gdb2, N2)
    # seed/alive caps track the genome size, not the (tighter) entry
    # buckets: seed fan-out per driving entry is up to `freq`
    NSCAP_FULL = max(N1, 1 << 13)
    # steady-state runs against the same pair reuse the previous seed
    # count to size the expansion tightly (the reference analog: seed
    # temp files are exactly sized on re-import, FastGA.c:4256-4345);
    # an overflow against the tight cap retries at the full cap
    est_key = ("ns_est", N1, N2, freq, symmetric)
    est = cache1.get(est_key)
    NSCAP = (min(_pad_bucket(max(est + (est >> 2), 1 << 13)),
                 NSCAP_FULL)
             if est is not None else NSCAP_FULL)
    ACAP = max(N1 // 2, 1 << 12)

    import os
    import time as _time

    from jax import enable_x64
    dbg = os.environ.get("FASTGA_DEVPIPE_DEBUG") or (
        "1" if verbose else "")

    def _tick(label, t0, *vals):
        if dbg:
            jax.block_until_ready(vals)
            import sys
            sys.stderr.write(
                f"devpipe {label}: {_time.time() - t0:.2f}s\n")
        return _time.time()

    # x64 context: the packed keys / fill scans are int64 (int32 would
    # silently truncate under the default x64-disabled config)
    def _full_table(cache, gdb, lens, N):
        """Two-orientation sorted table for one genome, cached."""
        T = cache.get(("tab", N))
        if T is None:
            bps, coff, clen, _, invp, nc, _n = _prep_genome(gdb, lens)
            Ef = max(1 << 12, N)
            Tf = _gix_jit(N, len(coff), Ef)(bps, coff, clen, invp, nc)
            ne = int(np.asarray(Tf[7]))
            if ne > Ef:
                return _decline("GIX entry cap exceeded")
            Et = min(_pad_bucket(ne), Ef)
            T = tuple(x[:Et] for x in Tf[:7]) + (Tf[7], Tf[8][:Et])
            cache[("tab", N)] = T
        return T

    # x64 context: the packed keys / fill scans are int64 (int32 would
    # silently truncate under the default x64-disabled config)
    with enable_x64():
        t0 = _time.time()
        if symmetric:
            # flip members need genome 1's rc entries too
            T1 = _full_table(cache1, gdb1, lens1, N1)
        else:
            T1 = cache1.get(("drv", N1))
            if T1 is None:
                # unsorted forward candidates -> count -> tight
                # compacted driver table (one half-size sort; cached
                # per GDB)
                bps1, coff1, clen1, _, invp1, nc1, _n = \
                    _prep_genome(gdb1, lens1)
                C1 = _cand_jit(N1, len(coff1))(bps1, coff1, clen1,
                                               invp1, nc1)
                E1t = _pad_bucket(int(np.asarray(C1[7])))
                T1 = _drvtab_jit(N1, min(E1t, N1))(C1)
                C1 = None
                cache1[("drv", N1)] = T1
        if T1 is None:
            return _decline("GIX entry cap exceeded")
        E1 = T1[0].shape[0]
        t0 = _tick("gix1", t0, T1[:6])
        T2 = _full_table(cache2, gdb2, lens2, N2)
        if T2 is None:
            return _decline("GIX entry cap exceeded")
        E2 = T2[0].shape[0]
        t0 = _tick("gix2", t0, T2)
        caps = [NSCAP] + ([NSCAP_FULL] if NSCAP < NSCAP_FULL else [])
        for ci, nscap_try in enumerate(caps):
            if symmetric:
                NSCAP2 = max(N2, 1 << 13)
                ACAP2 = max(N2 // 2, 1 << 12)
                yfn = _sym_jit(E1, E2, nscap_try, NSCAP2, ACAP, ACAP2,
                               freq, False, False, presorted=True)
                (spl, sac, sap, sbc, sbp, sbo, sns, sover, spls) = yfn(
                    T1, T2, None, None)
                if int(np.asarray(sover)) > 0:
                    if ci + 1 < len(caps):
                        continue   # tight estimate overflowed: full cap
                    return _decline("merge seed cap exceeded")
                NSCAP = nscap_try + NSCAP2
                mout = (spl, sac, sap, sbc, sbp, sbo, sns, np.int32(0),
                        spls)
                cache1[est_key] = int(np.asarray(sns))
                break
            mout = _merge_jit(E1, E2, nscap_try, ACAP, freq, False,
                              False, presorted=True)(T1, T2, None, None)
            ns_host = int(np.asarray(mout[6]))
            if ns_host <= nscap_try or ci + 1 == len(caps):
                NSCAP = nscap_try
                cache1[est_key] = ns_host
                break
        (pl, ac, ap, bcn, bp, bo, ns, nalive, plsum) = mout
        t0 = _tick("merge", t0, ns)
        ne1, ne2 = T1[7], T2[7]
        T1 = T2 = None   # beyond-cache sizes: release the entry arrays
                         # before the chain sweep's panel temporaries
        tcap_eff = _tcap_for(NSCAP, tcap)
        for _ in range(3):
            res, ns, nalive, plsum = _run_chain(
                None, mout, NSCAP, tcap_eff, chain_break, chain_min,
                amax, bmax, alens_by_rank)
            nt_host = int(np.asarray(res[9]))
            if nt_host <= tcap_eff or tcap_eff >= (1 << 22):
                break
            # overflow backstop: the seeds are still device-resident,
            # so only the chain stage reruns (one extra shape class)
            tcap_eff = min(_pad_bucket(nt_host + (nt_host >> 2)),
                           1 << 22)
        t0 = _tick("chain", t0, res)
        out = tuple(res) + (ns, nalive, plsum, ne1, ne2)
    (ga, gb, gc, dgmin, dgmax, alow, ahgh, pair, cov, nt, ns, nalive,
     plsum, ne1, ne2) = [np.asarray(x) for x in out]
    if int(ne1) > E1 or int(ne2) > E2 or int(ns) > NSCAP \
            or int(nalive) > ACAP or int(nt) > tcap_eff:
        return _decline("seed/tube caps exceeded")
    n = int(nt)
    tubes = TubeBatch(
        acont=ga[:n].astype(np.int32), bcont=gb[:n].astype(np.int32),
        comp=gc[:n].astype(bool), dgmin=dgmin[:n].astype(np.int32),
        dgmax=dgmax[:n].astype(np.int32), alow=alow[:n].astype(np.int64),
        ahgh=ahgh[:n].astype(np.int64), pairing=pair[:n].astype(np.int64),
        cov=cov[:n].astype(np.int64))
    return tubes, int(ns), int(plsum)
