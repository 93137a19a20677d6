"""Device wave kernel vs the scalar oracle (runs on the CPU backend)."""

import numpy as np
import pytest

from fastga_tpu.ops import seqpack, wave as wk, wave_batch as wb
from fastga_tpu.ops import wave_ref as wr
from fastga_tpu.utils import dna


@pytest.fixture(scope="module")
def spec():
    return wr.AlignSpec(0.7)


def make_cases(rng, nt):
    cases = []
    for i in range(nt):
        n = int(rng.integers(2000, 6000))
        A = rng.integers(0, 4, n).astype(np.uint8)
        B = A.copy()
        div = rng.uniform(0.0, 0.1)
        mut = rng.random(n) < div
        B[mut] = (B[mut] + rng.integers(1, 4, mut.sum())) % 4
        B = np.delete(B, rng.integers(0, len(B), int(div * 100) + 1))
        ins = rng.integers(0, len(B), int(div * 100) + 1)
        B = np.insert(B, ins, rng.integers(0, 4, len(ins)))
        if i % 3 == 1:
            q = len(B) // 4
            B[:q] = rng.integers(0, 4, q)
            B[len(B) - q:] = rng.integers(0, 4, q)
        if i % 5 == 4:
            B = rng.integers(0, 4, n).astype(np.uint8)  # unrelated pair
        cases.append((A, B))
    return cases


def test_batched_local_alignment_exact(spec, rng):
    nt = 12
    cases = make_cases(rng, nt)
    seqs = {}
    for i, (A, B) in enumerate(cases):
        seqs[("A", i)] = A
        seqs[("Ar", i)] = dna.revcomp(A)
        seqs[("B", i)] = B
    pool = seqpack.SeqPool.build(seqs)
    cfg = wk.WaveConfig(n=16, w=256, chunk=64, max_chunks=64)
    ba = wb.BatchAligner(spec, pool.words, pool.offs, lambda k: seqs[k], cfg)

    items, refs = [], []
    for i, (A, B) in enumerate(cases):
        acomp = i % 4 == 3
        anti = int((len(A) // 2 + rng.integers(-200, 200)) * 2)
        dgmin, dgmax = int(rng.integers(-40, 0)), int(rng.integers(1, 40))
        items.append(wb.WorkItem(("Ar" if acomp else "A", i), ("B", i),
                                 dgmin, dgmax, anti, acomp, len(A), len(B)))
        Ause = seqs[("Ar" if acomp else "A", i)]
        refs.append(wr.local_alignment(spec, Ause, B, dgmin, dgmax, anti,
                                       -1, -1, selfie=False, acomp=acomp,
                                       alen=len(A), blen=len(B)))
    paths = ba.run(items)
    for i, (p, q) in enumerate(zip(refs, paths)):
        assert (p.abpos, p.bbpos, p.aepos, p.bepos, p.diffs) == \
               (q.abpos, q.bbpos, q.aepos, q.bepos, q.diffs), i
        assert p.trace == q.trace, i


def test_requeue_long_lane_exact(spec, rng, monkeypatch):
    """Deliberately under-predicted batches must decapitate stragglers
    onto the narrow sibling engine (requeue > 0) without changing any
    result vs the scalar reference."""
    import threading

    monkeypatch.setenv("FASTGA_TPU_WAVE", "pallas")
    # cap 4 keeps long_T positive (hint 5 starts in the wide lane) while
    # the 48-wave budget forces divergent pairs through decapitation
    monkeypatch.setenv("FASTGA_TPU_PRED_CAP", "4")
    cases = make_cases(rng, 10)
    seqs = {}
    for i, (A, B) in enumerate(cases):
        seqs[("A", i)] = A
        seqs[("B", i)] = B
    pool = seqpack.SeqPool.build(seqs)
    cfg = wk.WaveConfig(n=64, w=256, chunk=16, max_chunks=256)
    eng = wk.WaveEngine(spec, cfg)
    small = wk.WaveEngine(spec, wk.WaveConfig(n=32, w=256, chunk=16,
                                              max_chunks=256))
    evt = threading.Event()
    evt.set()
    small._warm_evt = evt
    small._warm_exc = None
    eng._small = small
    ba = wb.BatchAligner(spec, pool.words, pool.offs,
                         lambda k: seqs[k], cfg, engine=eng)

    refs, first = [], []
    for i, (A, B) in enumerate(cases):
        anti = int((len(A) // 2 + rng.integers(-200, 200)) * 2)
        dgmin, dgmax = int(rng.integers(-40, 0)), int(rng.integers(1, 40))
        # hint=5 waves: far below the actual need for divergent pairs
        first.append((i, wb.WorkItem(("A", i), ("B", i), dgmin, dgmax,
                                     anti, False, len(A), len(B),
                                     waves_hint=5)))
        refs.append(wr.local_alignment(spec, A, B, dgmin, dgmax, anti,
                                       -1, -1, selfie=False, acomp=False,
                                       alen=len(A), blen=len(B)))
    got = {}

    def more_fn(token, p, waves=-1):
        got[token] = p
        return []

    ba.run_stream(first, more_fn)
    assert ba.stats["requeues"] > 0, "expected straggler requeues"
    for i, p in enumerate(refs):
        q = got[i]
        assert (p.abpos, p.bbpos, p.aepos, p.bepos, p.diffs) == \
               (q.abpos, q.bbpos, q.aepos, q.bepos, q.diffs), i
        assert p.trace == q.trace, i


def test_e2e_jax_engine_matches_ref_engine(tmp_path, rng):
    from fastga_tpu.io import gdb as gdbm, gix as gixm
    from fastga_tpu.models import aligner
    from tests.conftest import mutate
    from tests.test_gdb import write_fasta

    a = rng.integers(0, 4, 30000).astype(np.uint8)
    b = mutate(rng, a, sub=0.03, ins=0.006, dele=0.006)
    # add an inversion
    b = np.concatenate([b[:8000], (3 - b[8000:16000])[::-1], b[16000:]])
    write_fasta(tmp_path / "a.fa", [("a", dna.to_ascii(a, True).decode())])
    write_fasta(tmp_path / "b.fa", [("b", dna.to_ascii(b, True).decode())])
    g1, _ = gdbm.create_gdb(tmp_path / "a.fa", tmp_path / "a")
    g2, _ = gdbm.create_gdb(tmp_path / "b.fa", tmp_path / "b")
    t1 = gixm.build_gix(g1)
    t2 = gixm.build_gix(g2)
    o1, s1 = aligner.align_genomes(g1, g2, t1, t2, engine="ref")
    o2, s2 = aligner.align_genomes(g1, g2, t1, t2, engine="jax")
    assert len(o1) == len(o2) and len(o1) > 0
    for a_, b_ in zip(o1, o2):
        assert (a_.aread, a_.abpos, a_.aepos, a_.bread, a_.bbpos, a_.bepos,
                a_.bcomp, a_.diffs) == \
               (b_.aread, b_.abpos, b_.aepos, b_.bread, b_.bbpos, b_.bepos,
                b_.bcomp, b_.diffs)
        assert a_.trace == b_.trace
