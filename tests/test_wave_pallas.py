"""The Pallas in-VMEM chunk stepper must be bit-identical to the XLA
graph stepper (ops/wave.py), which in turn replays against the scalar
reference (test_wave_device.py).  Runs in interpret mode on CPU; the
same kernel compiles via Mosaic on TPU."""

import numpy as np

from conftest import INTERPRET
import pytest


def _mutate(seq, rate, rng):
    out = []
    for b in seq:
        r = rng.random()
        if r < rate * 0.6:
            out.append(rng.integers(0, 4))
        elif r < rate * 0.8:
            continue
        else:
            out.append(b)
            if r > 1 - rate * 0.2:
                out.append(rng.integers(0, 4))
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("direction", [+1, -1])
def test_pallas_chunk_matches_xla(direction):
    import jax.numpy as jnp

    from fastga_tpu.ops import seqpack, wave as wavek, wave_pallas
    from fastga_tpu.ops.wave_ref import AlignSpec

    rng = np.random.default_rng(7)
    A = rng.integers(0, 4, 30000).astype(np.uint8)
    B = _mutate(A, 0.10, rng)
    pool = seqpack.SeqPool.build({"a": A, "b": B})
    spec = AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))
    cfg = wavek.WaveConfig(n=32, w=256, chunk=24, max_chunks=64)

    w0 = wavek.build_wave0(cfg, direction)
    xla_chunk, _ = wavek.build_forward_chunk(
        cfg, spec.ave_path, np.asarray(spec.table), np.asarray(spec.score),
        direction)
    pal = wave_pallas.build_chunk_pallas(
        cfg, spec.ave_path, spec.mscore, spec.dscore, direction,
        interpret=INTERPRET)

    pw = jnp.asarray(pool.words)
    aw, alen = pool.offs["a"]
    bw, blen = pool.offs["b"]
    n = cfg.n

    def pad(v, fill=0):
        x = np.full(n, fill, np.int32)
        x[:] = v
        return jnp.asarray(x)

    targs = (pad(aw), pad(alen, 1), pad(bw), pad(blen, 1),
             pad(-(1 << 30)), pad(1 << 30))
    # staggered live seeds across all tubes
    anti = np.asarray([2 * (8000 + 137 * i) for i in range(n)], np.int32)
    stx, _ = w0(pw, targs, pad(-20), pad(20), jnp.asarray(anti))
    stp = stx
    for ch in range(3):
        stx, cx, bx = xla_chunk(pw, targs, stx)
        stp, cp, bp = pal(pw, targs, stp)
        for i, (a_, b_) in enumerate(zip(stx, stp)):
            assert np.array_equal(np.asarray(a_), np.asarray(b_)), \
                f"chunk {ch} state[{i}]"
        assert np.array_equal(np.asarray(cx), np.asarray(cp)), \
            f"chunk {ch} choice log"
        assert np.array_equal(np.asarray(bx), np.asarray(bp)), \
            f"chunk {ch} band log"


def test_backtrack_walk_matches_scan():
    """The pallas path walk must reproduce the XLA scan's emissions
    (d0 and D[w+1] = diag before stepping wave w) on random logs."""
    import jax.numpy as jnp

    from fastga_tpu.ops import wave as wavek, wave_pallas

    rng = np.random.default_rng(3)
    cfg = wavek.WaveConfig(n=32, w=256, chunk=24, max_chunks=64)
    N, W = cfg.n, cfg.w
    G = 2 * cfg.chunk
    ch = rng.integers(0, 4, (G, N, W)).astype(np.uint8)
    kb = rng.integers(-40, 40, (G, N)).astype(np.int32)
    trim_diag = rng.integers(-100, 100, N).astype(np.int32)
    trim_wave = rng.integers(0, G + 1, N).astype(np.int32)

    # scalar reference of the scan emission
    D_ref = np.zeros((G + 1, N), np.int32)
    diag = trim_diag.copy()
    for w in range(G - 1, -1, -1):
        D_ref[w + 1] = diag
        wv = w + 1
        for n in range(N):
            if wv <= trim_wave[n]:
                slot = min(max(diag[n] - kb[w, n], 0), W - 1)
                cc = ch[w, n, slot]
                if cc == wavek.CH_LOW:
                    diag[n] -= 1
                elif cc == wavek.CH_HIGH:
                    diag[n] += 1
    D_ref[0] = diag

    walk = wave_pallas.build_backtrack_walk(cfg, G, interpret=INTERPRET)
    d0, Ds = walk(jnp.asarray(np.transpose(ch, (0, 2, 1)).copy()),
                  jnp.asarray(kb), jnp.asarray(trim_diag),
                  jnp.asarray(trim_wave))
    assert np.array_equal(np.asarray(d0), D_ref[0])
    assert np.array_equal(np.asarray(Ds), D_ref[1:])


@pytest.mark.parametrize("kmax,resumes", [(8, False), (2, True)])
def test_fused_run_matches_chunked(monkeypatch, kmax, resumes):
    """engine.run via the fused while_loop+walk program must equal the
    chunked-poll path bit for bit — including the resume-to-chunked
    handoff when tubes outlive the KMAX budget (kmax=2 forces it)."""
    import jax.numpy as jnp

    from fastga_tpu.ops import seqpack, wave as wavek
    from fastga_tpu.ops.wave_ref import AlignSpec

    monkeypatch.setenv("FASTGA_TPU_WAVE", "pallas")
    rng = np.random.default_rng(11)
    A = rng.integers(0, 4, 30000).astype(np.uint8)
    B = _mutate(A, 0.10, rng)
    pool = seqpack.SeqPool.build({"a": A, "b": B})
    spec = AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))
    cfg = wavek.WaveConfig(n=32, w=256, chunk=24, max_chunks=64)
    aw, alen = pool.offs["a"]
    bw, blen = pool.offs["b"]
    n = cfg.n
    tubes = dict(
        aw=np.full(n, aw, np.int32), alen=np.full(n, alen, np.int32),
        bw=np.full(n, bw, np.int32), blen=np.full(n, blen, np.int32),
        dgmin=np.full(n, -20, np.int32), dgmax=np.full(n, 20, np.int32),
        anti=np.asarray([2 * (8000 + 137 * i) for i in range(n)],
                        np.int32))
    pw = jnp.asarray(pool.words)

    monkeypatch.setenv("FASTGA_TPU_WAVE_FUSED", "0")
    eng_c = wavek.WaveEngine(spec, cfg)
    res_c, diags_c = eng_c.run(pw, tubes, +1)

    monkeypatch.setenv("FASTGA_TPU_WAVE_FUSED", "1")
    monkeypatch.setenv("FASTGA_TPU_WAVE_KMAX", str(kmax))
    eng_f = wavek.WaveEngine(spec, cfg)
    res_f, diags_f = eng_f.run(pw, tubes, +1)

    for fc, ff in zip(res_c, res_f):
        assert np.array_equal(np.asarray(fc), np.asarray(ff))
    # diags agree wherever both walks are defined (shapes may differ by
    # chunk padding; compare the common prefix past every trim point)
    k = min(diags_c.shape[0], diags_f.shape[0])
    tw = np.asarray(res_c.trim_wave)
    assert int(tw.max()) < k
    for i in range(n):
        assert np.array_equal(diags_c[:tw[i] + 1, i],
                              diags_f[:tw[i] + 1, i]), f"tube {i}"


def test_pool_tail_page_fetch_exact():
    """Sequences ending within the pool's last PGS words must fetch
    exactly: the anchor page for those words is the pool's final page,
    which build_pool_pages must materialize with true content (an
    edge-replica pad there returned data off by PGS words and silently
    truncated long alignments — the r4 latent-fetch-corruption bug)."""
    import os

    from fastga_tpu.ops import seqpack, wave as wavek
    from fastga_tpu.ops.wave_batch import BatchAligner, WorkItem
    from fastga_tpu.ops.wave_ref import AlignSpec, local_alignment

    os.environ["FASTGA_TPU_WAVE"] = "pallas"
    try:
        rng = np.random.default_rng(7)
        spec = AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))
        A = rng.integers(0, 4, 30000).astype(np.uint8)
        B = A.copy()
        idx = rng.integers(0, len(B), 2400)
        B[idx] = (B[idx] + rng.integers(1, 4, 2400)) % 4
        seqs = {("a", 0, False): A, ("b", 0): B}
        pool = seqpack.SeqPool.build(seqs)
        # B's data must reach into the last PGS words of the pool for
        # the regression to bite
        assert pool.offs[("b", 0)][0] + len(B) // 16 \
            > len(pool.words) - 512
        cfg = wavek.WaveConfig(n=64, w=256, chunk=96, max_chunks=64)
        eng = wavek.WaveEngine(spec, cfg)
        ba = BatchAligner(spec, pool.words, pool.offs,
                          lambda k: seqs[k], cfg, engine=eng)
        items = [WorkItem(("a", 0, False), ("b", 0), -20, 20,
                          2000 + 9000 * i, False, len(A), len(B))
                 for i in range(3)]
        results = {}
        ba.run_stream([(i, it) for i, it in enumerate(items)],
                      lambda tok, p, waves=-1: results.__setitem__(
                          tok, p) or [])
        for i, it in enumerate(items):
            ref = local_alignment(spec, A, B, it.dgmin, it.dgmax,
                                  it.anti, -1, -1)
            p = results[i]
            assert (p.abpos, p.bbpos, p.aepos, p.bepos, p.diffs,
                    p.trace) == (ref.abpos, ref.bbpos, ref.aepos,
                                 ref.bepos, ref.diffs, ref.trace), i
    finally:
        del os.environ["FASTGA_TPU_WAVE"]


def test_band_overflow_rescue_lane():
    """Device-flagged tubes (band overflow / exhausted wave budget)
    must defer to the wide rescue lane (W=512, deep budget) and still
    match the scalar reference exactly.  A max_chunks=1 main engine
    guarantees budget exhaustion here."""
    import os

    from fastga_tpu.ops import seqpack, wave as wavek
    from fastga_tpu.ops.wave_batch import BatchAligner, WorkItem
    from fastga_tpu.ops.wave_ref import AlignSpec, local_alignment

    os.environ["FASTGA_TPU_WAVE"] = "pallas"
    try:
        rng = np.random.default_rng(11)
        spec = AlignSpec(0.7, 100, False, (0.25, 0.25, 0.25, 0.25))
        A = rng.integers(0, 4, 20000).astype(np.uint8)
        B = _mutate(A, 0.08, rng)
        seqs = {("a", 0, False): A, ("b", 0): B}
        pool = seqpack.SeqPool.build(seqs)
        cfg = wavek.WaveConfig(n=32, w=256, chunk=96, max_chunks=1)
        eng = wavek.WaveEngine(spec, cfg)
        ba = BatchAligner(spec, pool.words, pool.offs,
                          lambda k: seqs[k], cfg, engine=eng)
        items = [WorkItem(("a", 0, False), ("b", 0), -10, 10,
                          1000 + 4000 * i, False, len(A), len(B))
                 for i in range(4)]
        results = {}
        ba.run_stream([(i, it) for i, it in enumerate(items)],
                      lambda tok, p, waves=-1: results.__setitem__(
                          tok, p) or [])
        assert ba.stats.get("rescued", 0) > 0, ba.stats
        for i, it in enumerate(items):
            ref = local_alignment(spec, A, B, it.dgmin, it.dgmax,
                                  it.anti, -1, -1)
            p = results[i]
            assert (p.abpos, p.bbpos, p.aepos, p.bepos, p.diffs,
                    p.trace) == (ref.abpos, ref.bbpos, ref.aepos,
                                 ref.bepos, ref.diffs, ref.trace), i
    finally:
        del os.environ["FASTGA_TPU_WAVE"]
