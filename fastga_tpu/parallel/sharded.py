"""The REAL sharded seed pipeline over a device mesh (SURVEY §2.5).

Maps the reference's parallelism onto collectives, end to end:

- P2 (contig/position-space split): genome positions are blocked over the
  mesh axis; each device generates syncmer entry candidates for its block
  (with a 64-position halo handled by masking);
- P1 (k-mer-space split): each device owns an equal range of the 2^24
  k-mer prefix space.  Prefix panels never split an adaptamer group
  (groups share >= 12 bases = 24 bits), so per-shard merges are exact;
- P3 (all-to-all shuffle): candidates are routed to their prefix owner,
  and merged seeds to their A-contig owner, with `lax.all_to_all`;
- P4 (sort + fingers): per-shard `lax.sort` with payload packed in the
  keys (ops/device_pipeline machinery, unchanged);
- P7 (deterministic merge): shards own ascending A-contig-rank ranges and
  emit tubes in local host order, so concatenating shard outputs in mesh
  order reproduces the single-device tube order bit for bit.

`sharded_tubes` returns exactly what ops/device_pipeline.device_tubes
returns; tests/test_sharded.py asserts equality against both the
single-device pipeline and the host numpy path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

from ..ops import device_pipeline as dp
from ..ops.constants import KMER, TMER
from ..ops.device_pipeline import (_I64MAX, MAX_CONT, MAX_POST, MAX_FREQ,
                                   _pad_bucket)

AXIS = "shards"


def make_mesh(n_devices: int):
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, (AXIS,))


def _route(jnp, jax_, dest, ka, kb, cap2, D):
    """Per-device routing into the [D, cap2] all_to_all send buffers.

    Sorts local rows by (dest, ka, kb) — keys carry everything — then
    scatters each row at (dest, rank-within-dest).  Returns the two send
    buffers plus a per-destination overflow indicator."""
    L = dest.shape[0]
    dk = jnp.where(ka == _I64MAX, jnp.int64(D), dest.astype(jnp.int64))
    srt = jax_.lax.sort((dk, ka, kb), num_keys=3)
    dks, kas, kbs = srt
    ridx = jnp.arange(L, dtype=jnp.int32)
    newd = (ridx == 0) | (dks != jnp.roll(dks, 1))
    start = dp._ffill_tagged(jax_, jnp, newd,
                             ridx.astype(jnp.int64), 32).astype(jnp.int32)
    rank = ridx - start
    valid = (dks < D) & (rank < cap2)
    flat = jnp.where(valid, dks.astype(jnp.int32) * cap2 + rank,
                     D * cap2)
    buf_a = jnp.full(D * cap2 + 1, _I64MAX, jnp.int64) \
        .at[flat].set(kas, mode="drop")[:-1].reshape(D, cap2)
    buf_b = jnp.full(D * cap2 + 1, _I64MAX, jnp.int64) \
        .at[flat].set(kbs, mode="drop")[:-1].reshape(D, cap2)
    over = jnp.sum(((dks < D) & (rank >= cap2)).astype(jnp.int32))
    return buf_a, buf_b, over


def _fragment_table(jnp, jax_, ka, kb):
    """Received rows -> sorted per-shard table fragment in the
    device_pipeline T-tuple layout."""
    srt = jax_.lax.sort((ka, kb), num_keys=2)
    kas, kbs = srt
    w0, w1, w2, cs, ps, os_ = dp.unpack_entry_keys(jnp, kas, kbs)
    n = jnp.sum((kbs != _I64MAX).astype(jnp.int32))
    lcp = dp.adjacent_lcp(jnp, w0, w1, w2)
    vs = (jnp.arange(ka.shape[0], dtype=jnp.int32) < n).astype(jnp.int32)
    return (w0, w1, w2, cs, ps, os_, lcp, n, vs)


def build_sharded_tubes(mesh, L: int, cap2: int, nscap: int, scap: int,
                        tcap: int, freq: int,
                        chain_break: int, chain_min: int, D: int,
                        selfish: bool = False):
    """Compile the sharded seed pipeline (one shape class).

    L: per-device position-block length; cap2: per (src,dst) candidate
    slots; nscap: per-shard seed cap; scap: per (src,dst) seed slots;
    tcap: per-shard tube cap.  ``selfish`` compiles the self-comparison
    variant (per-shard self_seeds over the one routed table; exact for
    the same prefix-panel reason as the pair merge).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    HB = 32              # leading halo: rc kmer words read up to 28
    HE = 64              # positions back; syncmer+kmer windows read up
    LH = HB + L + HE     # to 60 ahead

    def candidates(bps, coff, clen, cont_of, invp, ncontig, i0):
        i = (i0 - HB) + jnp.arange(LH, dtype=jnp.int32)
        NP4 = bps.shape[0]
        ic = jnp.clip(i, 0, 4 * NP4 - 1)
        bases = (bps[ic >> 2] >> ((ic & 3) << 1).astype(jnp.uint8)) & 3
        co = cont_of[jnp.clip(ic, 0, cont_of.shape[0] - 1)]
        loc = i - coff[jnp.clip(co, 0, coff.shape[0] - 1)]
        ln = clen[jnp.clip(co, 0, coff.shape[0] - 1)]
        cranks = invp[jnp.clip(co, 0, coff.shape[0] - 1)]
        lix = jnp.arange(LH, dtype=jnp.int32)
        in_block = (co < ncontig) & (lix >= HB) & (lix < HB + L)
        return dp.entry_candidates(jnp, bases.astype(jnp.int32), loc, ln,
                                   cranks, in_block)

    def local(bps1, coff1, clen1, cof1, invp1, nc1,
              bps2, coff2, clen2, cof2, invp2, nc2,
              i0s, owner_of_rank, alens_pad, amax, bmax):
        i0 = i0s[0]
        nc1 = nc1[0]
        nc2 = nc2[0]

        def gen_route(bps, coff, clen, cof, invp, nc):
            ok, w0, w1, w2, cc, pp, oo = candidates(
                bps, coff, clen, cof, invp, nc, i0)
            ka, kb = dp.pack_entry_keys(jnp, ok, w0, w1, w2, cc, pp, oo)
            # destination = prefix-range owner (top 24 kmer bits)
            w0u = w0.astype(jnp.uint32).astype(jnp.int64)
            pre24 = (w0u >> 8).astype(jnp.int32)
            dest = (pre24.astype(jnp.int64) * D >> 24).astype(jnp.int32)
            sa, sb, over = _route(jnp, jax, dest, ka, kb, cap2, D)
            ra = jax.lax.all_to_all(sa, AXIS, 0, 0, tiled=True)
            rb = jax.lax.all_to_all(sb, AXIS, 0, 0, tiled=True)
            return _fragment_table(jnp, jax, ra.reshape(-1),
                                   rb.reshape(-1)), over

        T1, ov1 = gen_route(bps1, coff1, clen1, cof1, invp1, nc1)

        # per-shard adaptamer merge (exact: prefix panels own whole
        # adaptamer groups)
        acap = max(nscap // 2, 1 << 10)
        if selfish:
            ov2 = jnp.int32(0)
            (pl, ac, ap, bcn, bp, bo, ns, nalive) = dp.self_seeds(
                T1, nscap, freq, acap)
        else:
            T2, ov2 = gen_route(bps2, coff2, clen2, cof2, invp2, nc2)
            (pl, ac, ap, bcn, bp, bo, ns, nalive) = dp.merge_seeds(
                T1, T2, nscap, freq, acap)
        sidx = jnp.arange(nscap, dtype=jnp.int32)
        vseed = sidx < ns
        plsum = jnp.sum(jnp.where(vseed, pl, 0))

        # route seeds to their A-contig owner (contig-space split);
        # pack each seed into two int64 words
        s1 = ((pl.astype(jnp.int64) << 40) | (ac.astype(jnp.int64) << 28)
              | ap.astype(jnp.int64))
        s2 = ((bcn.astype(jnp.int64) << 29) | (bp.astype(jnp.int64) << 1)
              | bo.astype(jnp.int64))
        s1 = jnp.where(vseed, s1, _I64MAX)
        s2 = jnp.where(vseed, s2, _I64MAX)
        dest2 = owner_of_rank[jnp.clip(ac, 0, owner_of_rank.shape[0] - 1)]
        # order-preserving routing: rows are already in (x, y) seed order
        # and _route's (dest, s1-as-ka...) sort must NOT reorder them, so
        # sort by (dest, position) instead
        pos = jnp.arange(nscap, dtype=jnp.int64)
        dk = jnp.where(vseed, dest2.astype(jnp.int64), jnp.int64(D))
        srt = jax.lax.sort((dk, pos, s1, s2), num_keys=2)
        dks, _, s1s, s2s = srt
        ridx = jnp.arange(nscap, dtype=jnp.int32)
        newd = (ridx == 0) | (dks != jnp.roll(dks, 1))
        start = dp._ffill_tagged(jax, jnp, newd, ridx.astype(jnp.int64),
                                 32).astype(jnp.int32)
        rank = ridx - start
        okr = (dks < D) & (rank < scap)
        flat = jnp.where(okr, dks.astype(jnp.int32) * scap + rank,
                         D * scap)
        sb1 = jnp.full(D * scap + 1, _I64MAX, jnp.int64) \
            .at[flat].set(s1s, mode="drop")[:-1].reshape(D, scap)
        sb2 = jnp.full(D * scap + 1, _I64MAX, jnp.int64) \
            .at[flat].set(s2s, mode="drop")[:-1].reshape(D, scap)
        ov3 = jnp.sum(((dks < D) & (rank >= scap)).astype(jnp.int32))
        rb1 = jax.lax.all_to_all(sb1, AXIS, 0, 0, tiled=True).reshape(-1)
        rb2 = jax.lax.all_to_all(sb2, AXIS, 0, 0, tiled=True).reshape(-1)

        # received seeds: [src shard, slot] order == global (x, y) order
        # restricted to this shard's contigs (shards own ascending kmer
        # ranges, seeds per shard are x-ordered) — compact to the front
        rvalid = rb1 != _I64MAX
        rpos = jnp.arange(D * scap, dtype=jnp.int64)
        ck = jnp.where(rvalid, rpos, _I64MAX)
        csrt = jax.lax.sort((ck, rb1, rb2), num_keys=1)
        r1, r2 = csrt[1], csrt[2]
        ns2 = jnp.sum(rvalid.astype(jnp.int32))
        spl = (r1 >> 40).astype(jnp.int32)
        sac = ((r1 >> 28) & (MAX_CONT - 1)).astype(jnp.int32)
        sap = (r1 & (MAX_POST - 1)).astype(jnp.int32)
        sbc = ((r2 >> 29) & (MAX_CONT - 1)).astype(jnp.int32)
        sbp = ((r2 >> 1) & (MAX_POST - 1)).astype(jnp.int32)
        sbo = (r2 & 1).astype(jnp.int32)

        res = dp.chain_tubes_dev(
            (spl, sac, sap, sbc, sbp, sbo), ns2, amax[0], bmax[0],
            alens_pad, tcap, chain_break, chain_min)
        (ga, gb, gc, dgmin, dgmax, alow, ahgh, pair, cov, nt) = res
        nseeds_tot = jax.lax.psum(ns, AXIS)
        plsum_tot = jax.lax.psum(plsum, AXIS)
        over_l = (ov1 + ov2 + ov3 + (ns > nscap).astype(jnp.int32)
                  + (nalive > acap).astype(jnp.int32)
                  + (nt > tcap).astype(jnp.int32))
        over = jax.lax.psum(over_l, AXIS)
        return (ga[None], gb[None], gc[None], dgmin[None], dgmax[None],
                alow[None], ahgh[None], pair[None], cov[None], nt[None],
                nseeds_tot, plsum_tot, over)

    Pn = P(None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(Pn,) * 6 + (Pn,) * 6 + (P(AXIS), Pn, Pn, Pn, Pn),
        out_specs=(P(AXIS),) * 10 + (P(), P(), P()),
        check_rep=False)
    import jax as _jax
    return _jax.jit(fn)


_shard_cache = {}


def sharded_tubes(gdb1, gdb2, alens_by_rank, mesh, freq: int = 10,
                  chain_break: int = 2000, chain_min: int = 170,
                  tcap: int = 1 << 13):
    """TubeBatch via the sharded pipeline; bit-identical to
    device_tubes / the host pipeline.  Returns None when caps exceeded.
    Pass the same GDB twice (or ``gdb2=None``) for sharded
    self-comparison."""
    import jax
    import jax.numpy as jnp
    from jax import enable_x64

    from ..ops.chain import TubeBatch

    selfish = gdb2 is None or gdb2 is gdb1
    if selfish:
        gdb2 = gdb1
    D = mesh.devices.size
    lens1 = gdb1.contig_lengths()
    lens2 = lens1 if selfish else gdb2.contig_lengths()
    amax, bmax = int(lens1.max()), int(lens2.max())
    if len(lens1) >= MAX_CONT or len(lens2) >= MAX_CONT \
            or freq > MAX_FREQ or amax + 2 * bmax >= (1 << 30):
        return None

    with enable_x64():
        prep1 = dp._prep_genome(gdb1, lens1)
        prep2 = prep1 if selfish else dp._prep_genome(gdb2, lens2)
        N = max(prep1[6], prep2[6])
        # common position-block length across genomes (same mesh step)
        L = -(-N // D)
        L = ((L + 15) // 16) * 16
        cap2 = max(256, (-(-2 * L // D)) * 2)
        nscap = max(1 << 12, _pad_bucket((4 if selfish else 2) * L))
        scap = max(256, (-(-nscap // D)) * 2)

        # A-contig owner map: contiguous rank ranges balanced by bp
        ranks_len = np.asarray(alens_by_rank, np.int64)
        cum = np.cumsum(ranks_len)
        tot = int(cum[-1]) if len(cum) else 1
        owner = np.minimum((cum - 1) * D // max(tot, 1),
                           D - 1).astype(np.int32)
        opad = np.zeros(1 << max(3, (len(owner) - 1).bit_length()),
                        np.int32)
        opad[:len(owner)] = owner
        alens_pad = np.zeros(1 << max(3, (len(alens_by_rank) - 1)
                                      .bit_length()), np.int32)
        alens_pad[:len(alens_by_rank)] = alens_by_rank

        key = (D, L, cap2, nscap, scap, tcap, freq, chain_break,
               chain_min, selfish)
        fn = _shard_cache.get(key)
        if fn is None:
            fn = build_sharded_tubes(mesh, L, cap2, nscap, scap,
                                     tcap, freq, chain_break, chain_min,
                                     D, selfish)
            _shard_cache[key] = fn
        i0s = (np.arange(D) * L).astype(np.int32)
        out = fn(prep1[0], prep1[1], prep1[2], prep1[3], prep1[4],
                 jnp.asarray([int(prep1[5])], np.int32),
                 prep2[0], prep2[1], prep2[2], prep2[3], prep2[4],
                 jnp.asarray([int(prep2[5])], np.int32),
                 jnp.asarray(i0s), jnp.asarray(opad),
                 jnp.asarray(alens_pad),
                 jnp.asarray([amax], np.int32),
                 jnp.asarray([bmax], np.int32))
        import jax as _jax
        if _jax.process_count() > 1:
            from . import distributed as _dist
            out = [_dist.gather_host(x) for x in out]
        else:
            out = [np.asarray(x) for x in out]
    (ga, gb, gc, dgmin, dgmax, alow, ahgh, pair, cov, nt, nseeds,
     plsum, over) = out
    if int(over) > 0:
        return None
    parts = []
    for d in range(D):
        n = int(nt[d])
        parts.append((ga[d][:n], gb[d][:n], gc[d][:n], dgmin[d][:n],
                      dgmax[d][:n], alow[d][:n], ahgh[d][:n],
                      pair[d][:n], cov[d][:n]))
    cat = [np.concatenate([p[i] for p in parts]) for i in range(9)]
    tubes = TubeBatch(
        acont=cat[0].astype(np.int32), bcont=cat[1].astype(np.int32),
        comp=cat[2].astype(bool), dgmin=cat[3].astype(np.int32),
        dgmax=cat[4].astype(np.int32), alow=cat[5].astype(np.int64),
        ahgh=cat[6].astype(np.int64), pairing=cat[7].astype(np.int64),
        cov=cat[8].astype(np.int64))
    return tubes, int(nseeds), int(plsum)
