"""FastGA pipeline driver: seeds -> tubes -> wave alignments -> dedup -> .1aln.

Orchestrates the full comparison of two genomes (FastGA.c main path, see
SURVEY.md §3.1): adaptamer merge (ops.merge), chain sweep (ops.chain), the
per-tube anti-diagonal tiling loop around Local_Alignment
(FastGA.c:3227-3341), the per-contig-pair redundancy elimination
(equal/contained endpoints, entwine fusing, fuzzy-box elimination,
FastGA.c:3435-3694), and the deterministic (aread, abpos, bread, comp)
output order (SORT_MAP FastGA.c:3800 + la_merge heap).

This module is the host-side driver; the wave engine is pluggable
(`engine="ref"` uses the exact scalar oracle ops/wave_ref.py, `engine="jax"`
the batched device kernel ops/wave.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.alncode import Overlap
from ..io.gdb import GDB
from ..io.gix import GixTable
from ..ops import chain as chainm
from ..ops import merge as mergem
from ..ops import wave_ref
from ..utils import dna

TSPACE = 100
BUCK_ANTI = 128
BOX_FUZZ = 10

ELIMINATED = 0x4


@dataclass
class FastGAParams:
    """Option defaults per FastGA.c:4451-4507 (post doubling/inversion)."""
    freq: int = 10            # -f adaptamer frequency cutoff
    chain_break: int = 2000   # -s*2 (anti units)
    chain_min: int = 170      # -c*2 (anti units)
    align_min: int = 100      # -l
    align_rate: float = 0.3   # 1 - (-i identity)
    tspace: int = TSPACE
    soft_mask: bool = False   # -M


def align_genomes(gdb1: GDB, gdb2: GDB, t1: GixTable, t2: GixTable,
                  params: FastGAParams = FastGAParams(),
                  engine: str = "ref",
                  verbose: bool = False) -> Tuple[List[Overlap], dict]:
    """Full FastGA comparison; returns (overlaps in output order, stats)."""
    stats = {}
    seeds = mergem.adaptamer_seeds(t1, t2, freq=params.freq,
                                   soft_mask=params.soft_mask)
    stats["nseeds"] = seeds.n
    stats["seed_len_avg"] = (float(seeds.plen.astype(np.float64).mean())
                             if seeds.n else 0.0)

    lens1 = gdb1.contig_lengths()
    lens2 = gdb2.contig_lengths()
    amax = int(lens1.max()) if len(lens1) else 1
    bmax = int(lens2.max()) if len(lens2) else 1
    perm1 = np.asarray(t1.perm)
    perm2 = np.asarray(t2.perm)
    # rank -> length (fake short-fix ranks map to their KMER length)
    alens_by_rank = np.where(perm1 < len(lens1), lens1[np.minimum(
        perm1, len(lens1) - 1)], t1.kmer)

    tubes = chainm.chain_tubes(seeds, amax, bmax, alens_by_rank,
                               chain_break=params.chain_break,
                               chain_min=params.chain_min)
    stats["nhits"] = tubes.n

    spec = wave_ref.AlignSpec(1.0 - params.align_rate, params.tspace,
                              False, tuple(gdb1.freq))

    aln_min = params.align_min - 50
    aln_rate = params.align_rate + 0.05

    out: List[Overlap] = []
    nlas = 0
    # iterate per (acont,bcont,comp) group in tube order
    i = 0
    n = tubes.n
    seq_cache: Dict[Tuple[int, int], np.ndarray] = {}

    def get_a(rank: int, comp: bool) -> np.ndarray:
        key = (rank, comp)
        if key not in seq_cache:
            s = gdb1.get_contig(int(perm1[rank]))
            seq_cache[key] = dna.revcomp(s) if comp else s
        return seq_cache[key]

    def get_b(rank: int) -> np.ndarray:
        key = (rank, None)
        if key not in seq_cache:
            seq_cache[key] = gdb2.get_contig(int(perm2[rank]))
        return seq_cache[key]

    while i < n:
        ac, bc, cm = int(tubes.acont[i]), int(tubes.bcont[i]), bool(tubes.comp[i])
        j = i
        while (j < n and tubes.acont[j] == ac and tubes.bcont[j] == bc
               and bool(tubes.comp[j]) == cm):
            j += 1
        group = list(range(i, j))
        i = j

        ctg1 = int(perm1[ac])
        ctg2 = int(perm2[bc])
        alen = int(lens1[ctg1])
        blen = int(lens2[ctg2])
        mlen = alen + blen
        A = get_a(ac, cm)
        B = get_b(bc)

        ovls: List[Overlap] = []
        alast = -1
        cur_pairing = None
        for ti in group:
            if tubes.pairing[ti] != cur_pairing:
                cur_pairing = tubes.pairing[ti]
                alast = -1
            dgmin = int(tubes.dgmin[ti])
            dgmax = int(tubes.dgmax[ti])
            alow = int(tubes.alow[ti])
            ahgh = int(tubes.ahgh[ti])
            if ahgh <= alast:
                continue  # BLOCKED (FastGA.c:3334)
            if alow < alast:
                alow = alast
            ahgh -= BUCK_ANTI
            while True:
                amid = alow + BUCK_ANTI
                if amid > ahgh:
                    amid = ahgh
                    if amid + dgmin < 0:
                        dgmin = -amid
                        if dgmin > dgmax:
                            break
                p = wave_ref.local_alignment(
                    spec, A, B, dgmin, dgmax, amid, -1, -1,
                    selfie=False, acomp=cm, alen=alen, blen=blen)
                rlen = p.aepos - p.abpos
                if rlen >= aln_min and aln_rate * rlen >= p.diffs:
                    ovls.append(Overlap(
                        aread=ctg1, bread=ctg2,
                        abpos=p.abpos, aepos=p.aepos,
                        bbpos=p.bbpos, bepos=p.bepos,
                        diffs=p.diffs, bcomp=cm,
                        trace=list(p.trace)))
                    nlas += 1
                if cm:
                    eant = mlen - (p.abpos + p.bbpos)
                else:
                    eant = p.aepos + p.bepos
                if eant <= alow:
                    alow = amid
                else:
                    alow = eant
                if alow >= ahgh:
                    break
            alast = alow

        out.extend(dedup_group(ovls))

    stats["nlas"] = nlas
    stats["nlive"] = len(out)
    stats["cov"] = sum(o.aepos - o.abpos for o in out)

    # deterministic output order (SORT_MAP + la_merge heap)
    out.sort(key=lambda o: (o.aread, o.abpos, o.bread, o.bcomp))
    return out, stats


# -- redundancy elimination (FastGA.c:3435-3694) -----------------------------


def entwine(op: Overlap, wp: Overlap) -> Tuple[int, int]:
    """Trace-distance between two overlapping paths (FastGA.c:2818-2947).

    Returns (min signed b-distance over shared trace points, where):
    where = A trace point at which the paths meet exactly, else -1.
    """
    where = -1
    y2 = op.bbpos
    b2 = wp.bbpos
    jt = [v for pair in op.trace for v in pair]   # flat (d,b) trace
    kt = [v for pair in wp.trace for v in pair]
    j = op.abpos // TSPACE
    k = wp.abpos // TSPACE
    ac = k * TSPACE

    j = 1 + 2 * (k - j)
    k = 1
    for i in range(1, j, 2):
        y2 += jt[i]

    if j == 1:
        yp = y2 + (jt[j] * (wp.abpos - op.abpos)) // (ac + TSPACE - op.abpos)
    else:
        yp = y2 + (jt[j] * (wp.abpos - ac)) // TSPACE

    num = b2 - yp
    mn = num

    ae = min(op.aepos, wp.aepos)

    ac += TSPACE
    while ac < ae:
        y2 += jt[j]
        b2 += kt[k]
        j += 2
        k += 2
        i = b2 - y2
        if mn < 0 and mn < i:
            mn = 0 if i >= 0 else i
        elif mn > 0 and mn > i:
            mn = 0 if i <= 0 else i
        if i == 0:
            where = ac
        ac += TSPACE

    ac -= TSPACE
    # C indexes one past the trace when ae == ac; the product is 0 there
    jtj = jt[j] if j < len(jt) else 0
    ktk = kt[k] if k < len(kt) else 0
    if ae == op.aepos:
        y2 = op.bepos
        if wp.aepos >= ac:
            b2 += (ktk * (ae - ac)) // TSPACE
        else:
            b2 += (ktk * (ae - ac)) // (wp.aepos - ac)
    else:
        b2 = wp.bepos
        if op.aepos >= ac:
            y2 += (jtj * (ae - ac)) // TSPACE
        else:
            y2 += (jtj * (ae - ac)) // (op.aepos - ac)

    i = b2 - y2
    if mn < 0 and mn < i:
        mn = 0 if i >= 0 else i
    elif mn > 0 and mn > i:
        mn = 0 if i <= 0 else i
    return mn, where


def dedup_group(ovls: List[Overlap]) -> List[Overlap]:
    """Per-(contig pair, strand) redundancy elimination."""
    nlas = len(ovls)
    if nlas == 0:
        return []
    perm = sorted(range(nlas), key=lambda ix: ovls[ix].abpos)
    os = [ovls[ix] for ix in perm]
    flags = [0] * nlas

    # pass 1: identical / shared-endpoint containment (FastGA.c:3441-3491)
    for j in range(nlas - 1, -1, -1):
        op = os[j]
        for k in range(j + 1, nlas):
            wp = os[k]
            if op.aepos <= wp.abpos:
                break
            if flags[k] & ELIMINATED:
                continue
            if op.abpos == wp.abpos and op.bbpos == wp.bbpos:
                if op.aepos == wp.aepos and op.bepos == wp.bepos:
                    # (sic) the reference compares diffs against aepos here
                    if op.diffs < wp.aepos:
                        flags[k] |= ELIMINATED
                        continue
                    else:
                        flags[j] |= ELIMINATED
                        break
                else:
                    if op.aepos > wp.aepos:
                        flags[k] |= ELIMINATED
                        continue
                    else:
                        flags[j] |= ELIMINATED
                        break
            elif op.aepos == wp.aepos and op.bepos == wp.bepos:
                if op.abpos < wp.abpos:
                    flags[k] |= ELIMINATED
                    continue
                else:
                    flags[j] |= ELIMINATED
                    break

    # pass 2: entwine fuse + fuzzy box elimination (FastGA.c:3494-3597)
    for j in range(nlas - 1, -1, -1):
        op = os[j]
        if flags[j] & ELIMINATED:
            continue
        for k in range(j + 1, nlas):
            wp = os[k]
            if op.aepos <= wp.abpos:
                break
            if flags[k] & ELIMINATED:
                continue
            if op.bepos <= wp.bbpos or op.bbpos >= wp.bepos:
                continue
            dist, where = entwine(op, wp)
            if where != -1:
                # fuse at the shared trace point (FastGA.c:3530-3570)
                ocut = (where - op.abpos - 1) // TSPACE + 1
                wcut = (where - wp.abpos - 1) // TSPACE + 1
                ntrace = op.trace[:ocut] + wp.trace[wcut:]
                op.trace = ntrace
                op.diffs = sum(d for d, _ in ntrace)
                op.aepos = wp.aepos
                op.bepos = wp.bepos
                flags[k] |= ELIMINATED
                continue
            if dist != 0:
                if (op.aepos - op.abpos) + BOX_FUZZ >= wp.aepos - wp.abpos:
                    if (wp.aepos <= op.aepos + BOX_FUZZ
                            and wp.bbpos >= op.bbpos - BOX_FUZZ
                            and wp.bepos <= op.bepos + BOX_FUZZ):
                        flags[k] |= ELIMINATED
                        continue
                else:
                    if (op.aepos <= wp.aepos + BOX_FUZZ
                            and op.bbpos >= wp.bbpos - BOX_FUZZ
                            and op.bepos <= wp.bepos + BOX_FUZZ
                            and op.abpos >= wp.abpos - BOX_FUZZ):
                        flags[j] |= ELIMINATED
                        continue

    return [o for o, f in zip(os, flags) if not (f & ELIMINATED)]
