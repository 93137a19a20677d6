"""Paired fwd+rev device submission (one fetch per batch) must produce
the same alignments as the classic per-direction path.  Runs the Pallas
engine in interpret mode on CPU (FASTGA_TPU_WAVE=pallas)."""

import numpy as np
import pytest

from fastga_tpu.models import aligner
from fastga_tpu.utils import synth


def _align(g1, g2):
    ovls, stats = aligner.align_genomes(g1, g2, engine="jax")
    return [(o.aread, o.bread, o.bcomp, o.abpos, o.aepos, o.bbpos,
             o.bepos, o.diffs, tuple(map(tuple, o.trace)))
            for o in ovls]


def test_long_lane_matches_classic(monkeypatch):
    """Mixed short/long alignments through an engine WITH a narrow
    sibling: straggler decapitation + long-lane resubmission must not
    change any alignment (vs the classic per-direction XLA path)."""
    from fastga_tpu.models.aligner import _ENGINE_CACHE

    rng = np.random.default_rng(0x51DE)
    # one long pair (drives thousands of waves => requeue+long lane at
    # the tiny chunk budget below) + several short contigs
    A = [rng.integers(0, 4, 30000).astype(np.uint8)]
    B = [synth.mutate(rng, A[0], 0.05)]
    for i in range(3):
        c = rng.integers(0, 4, 3000).astype(np.uint8)
        A.append(c)
        B.append(synth.mutate(rng, c, 0.02))
    g1, _ = synth.to_gdb("a", A)
    g2, _ = synth.to_gdb("b", B)

    _ENGINE_CACHE.clear()
    ref = _align(g1, g2)
    assert ref, "expected alignments"

    monkeypatch.setenv("FASTGA_TPU_WAVE", "pallas")
    # n=128 main engine spawns an n=64 sibling; chunk=16 with cap 2
    # forces the 30 kb alignment through decapitation + the long lane
    monkeypatch.setenv("FASTGA_TPU_WAVE_CFG",
                       "n=128,w=256,chunk=16,max_chunks=512")
    monkeypatch.setenv("FASTGA_TPU_PRED_CAP", "2")
    _ENGINE_CACHE.clear()
    aligner.release_pool_cache(g1)
    from fastga_tpu.models.aligner import wait_engine_warmups
    aligner.prewarm(g1, g2)
    wait_engine_warmups()   # the sibling must be warm for the long lane
    got = _align(g1, g2)
    stats_requeues = None
    _ENGINE_CACHE.clear()
    assert got == ref


def test_pair_mode_matches_classic(monkeypatch):
    rng = np.random.default_rng(0xABCD)
    pair = synth.uniform_pair(rng, 2, 5000, div=0.03)
    g1, _ = synth.to_gdb("a", pair["A"])
    g2, _ = synth.to_gdb("b", pair["B"])

    aligner._ENGINE_CACHE.clear()
    ref = _align(g1, g2)
    assert ref, "expected alignments"

    # same pair through the Pallas engine (interpret on CPU): the
    # stream scheduler takes the submit_pair path
    monkeypatch.setenv("FASTGA_TPU_WAVE", "pallas")
    monkeypatch.setenv("FASTGA_TPU_WAVE_CFG",
                       "n=64,w=256,chunk=32,max_chunks=64")
    aligner._ENGINE_CACHE.clear()
    aligner.release_pool_cache(g1)
    got = _align(g1, g2)
    aligner._ENGINE_CACHE.clear()
    assert got == ref
