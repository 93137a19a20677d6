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
