"""The device seed pipeline (gix arrays + adaptamer merge + chain sweep
as XLA programs) must produce bit-identical TubeBatches to the host
numpy pipeline."""

import numpy as np

from fastga_tpu.io import gdb as gdbm
from fastga_tpu.io import gix as gixm
from fastga_tpu.ops import chain as chainm
from fastga_tpu.ops import device_pipeline as dp
from fastga_tpu.ops import merge as mergem
from fastga_tpu.utils.dna import compress


def _gdb(contigs):
    g = gdbm.GDB()
    boff = 0
    counts = np.zeros(4, np.int64)
    packs = []
    for i, c in enumerate(contigs):
        g.contigs.append(gdbm.Contig(len(c), 0, boff, i))
        g.scaffolds.append(gdbm.Scaffold(len(c), i, i + 1, f"c{i}"))
        pk = compress(c)
        packs.append(pk)
        boff += len(pk)
        counts += np.bincount(c, minlength=4)[:4]
        g.maxctg = max(g.maxctg, len(c))
    g.seqtot = int(counts.sum())
    g.freq = counts / g.seqtot
    g._bps = np.concatenate(packs)
    return g


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


def _tube_eq(tubes_d, tubes_h):
    assert tubes_d.n == tubes_h.n
    for f in ("acont", "bcont", "comp", "dgmin", "dgmax", "alow",
              "ahgh", "pairing"):
        assert np.array_equal(
            np.asarray(getattr(tubes_d, f)).astype(np.int64),
            np.asarray(getattr(tubes_h, f)).astype(np.int64)), f


def test_device_tubes_self_match_host():
    rng = np.random.default_rng(31)
    for rep in range(2):
        nc = int(rng.integers(2, 5))
        A = []
        for _ in range(nc):
            base = rng.integers(0, 4, int(rng.integers(2000, 8000))
                                ).astype(np.uint8)
            # add an internal repeat so self-seeds exist
            rep_seg = base[:len(base) // 3]
            A.append(np.concatenate([base, _mutate(rep_seg, 0.03, rng)]))
        g1 = _gdb(A)
        t1 = gixm.build_gix(g1)
        seeds_h = mergem.self_adaptamer_seeds(t1, freq=10)
        lens1 = g1.contig_lengths()
        perm1 = np.asarray(t1.perm)
        alens = np.where(perm1 < len(lens1),
                         lens1[np.minimum(perm1, len(lens1) - 1)], 40)
        amax = int(lens1.max())
        tubes_h = chainm.chain_tubes(seeds_h, amax, amax, alens)
        dres = dp.device_tubes_tables(t1, t1, alens, amax, amax)
        assert dres is not None
        tubes_d, nseeds, plsum = dres
        assert nseeds == seeds_h.n
        assert plsum == int(seeds_h.plen.astype(np.int64).sum())
        _tube_eq(tubes_d, tubes_h)


def test_device_tubes_masked_match_host():
    rng = np.random.default_rng(47)
    for soft in (False, True):
        nc = 3
        A = [rng.integers(0, 4, int(rng.integers(3000, 9000)))
             .astype(np.uint8) for _ in range(nc)]
        B = [_mutate(a, 0.04, rng) for a in A]
        g1, g2 = _gdb(A), _gdb(B)
        masks1 = [gdbm.MaskIval(0, 100, 1200),
                  gdbm.MaskIval(2, 0, len(A[2]) // 2)]
        masks2 = [gdbm.MaskIval(1, 500, 2500)]
        t1 = gixm.build_gix(g1, masks=masks1)
        t2 = gixm.build_gix(g2, masks=masks2)
        seeds_h = mergem.adaptamer_seeds(t1, t2, freq=10, soft_mask=soft)
        lens1 = g1.contig_lengths()
        lens2 = g2.contig_lengths()
        perm1 = np.asarray(t1.perm)
        alens = np.where(perm1 < len(lens1),
                         lens1[np.minimum(perm1, len(lens1) - 1)], 40)
        amax, bmax = int(lens1.max()), int(lens2.max())
        tubes_h = chainm.chain_tubes(seeds_h, amax, bmax, alens)
        dres = dp.device_tubes_tables(t1, t2, alens, amax, bmax,
                                      soft_mask=soft)
        assert dres is not None
        tubes_d, nseeds, plsum = dres
        assert nseeds == seeds_h.n, (nseeds, seeds_h.n, soft)
        assert plsum == int(seeds_h.plen.astype(np.int64).sum())
        _tube_eq(tubes_d, tubes_h)


def test_paneled_tubes_match_host():
    """The kmer-panel-streamed pipeline (P10 memory bounding) must be
    bit-identical to the host path."""
    rng = np.random.default_rng(53)
    A = [rng.integers(0, 4, int(rng.integers(4000, 12000)))
         .astype(np.uint8) for _ in range(4)]
    B = [_mutate(a, 0.04, rng) for a in A]
    g1, g2 = _gdb(A), _gdb(B)
    t1h, t2h = gixm.build_gix(g1), gixm.build_gix(g2)
    seeds_h = mergem.adaptamer_seeds(t1h, t2h, freq=10)
    lens1 = g1.contig_lengths()
    lens2 = g2.contig_lengths()
    perm1 = np.asarray(t1h.perm)
    alens = np.where(perm1 < len(lens1),
                     lens1[np.minimum(perm1, len(lens1) - 1)], 40)
    tubes_h = chainm.chain_tubes(seeds_h, int(lens1.max()),
                                 int(lens2.max()), alens)
    dres = dp.device_tubes_paneled(g1, g2, alens, panels=4)
    assert dres is not None
    tubes_d, nseeds, plsum = dres
    assert nseeds == seeds_h.n
    assert plsum == int(seeds_h.plen.astype(np.int64).sum())
    _tube_eq(tubes_d, tubes_h)


def test_paneled_self_tubes_match_host():
    """Paneled self-comparison (P10 for FastGA A): bit-identical to the
    host self pipeline — no adaptamer group spans a 12-base-prefix
    panel boundary."""
    rng = np.random.default_rng(59)
    A = []
    for _ in range(3):
        base = rng.integers(0, 4, int(rng.integers(4000, 9000))
                            ).astype(np.uint8)
        rep_seg = base[:len(base) // 3]
        A.append(np.concatenate([base, _mutate(rep_seg, 0.03, rng)]))
    g1 = _gdb(A)
    t1 = gixm.build_gix(g1)
    seeds_h = mergem.self_adaptamer_seeds(t1, freq=10)
    lens1 = g1.contig_lengths()
    perm1 = np.asarray(t1.perm)
    alens = np.where(perm1 < len(lens1),
                     lens1[np.minimum(perm1, len(lens1) - 1)], 40)
    amax = int(lens1.max())
    tubes_h = chainm.chain_tubes(seeds_h, amax, amax, alens)
    dres = dp.device_tubes_paneled(g1, None, alens, panels=4)
    assert dres is not None
    tubes_d, nseeds, plsum = dres
    assert nseeds == seeds_h.n
    assert plsum == int(seeds_h.plen.astype(np.int64).sum())
    _tube_eq(tubes_d, tubes_h)


def test_device_tubes_match_host():
    rng = np.random.default_rng(23)
    for rep in range(3):
        nc = int(rng.integers(3, 8))
        A = [rng.integers(0, 4, int(rng.integers(1500, 12000)))
             .astype(np.uint8) for _ in range(nc)]
        B = []
        for i, a in enumerate(A):
            b = _mutate(a, float(rng.uniform(0.02, 0.08)), rng)
            if i % 3 == 2:
                q = len(b) // 3
                b[q:2 * q] = (3 - b[q:2 * q])[::-1]
            B.append(b)
        g1, g2 = _gdb(A), _gdb(B)
        t1h, t2h = gixm.build_gix(g1), gixm.build_gix(g2)
        seeds_h = mergem.adaptamer_seeds(t1h, t2h, freq=10)
        lens1 = g1.contig_lengths()
        lens2 = g2.contig_lengths()
        perm1 = np.asarray(t1h.perm)
        alens = np.where(perm1 < len(lens1),
                         lens1[np.minimum(perm1, len(lens1) - 1)], 40)
        tubes_h = chainm.chain_tubes(seeds_h, int(lens1.max()),
                                     int(lens2.max()), alens)
        dres = dp.device_tubes(g1, g2, alens)
        assert dres is not None
        tubes_d, nseeds, plsum = dres
        assert nseeds == seeds_h.n
        assert plsum == int(seeds_h.plen.astype(np.int64).sum())
        assert tubes_d.n == tubes_h.n
        for f in ("acont", "bcont", "comp", "dgmin", "dgmax", "alow",
                  "ahgh", "pairing"):
            assert np.array_equal(
                np.asarray(getattr(tubes_d, f)).astype(np.int64),
                np.asarray(getattr(tubes_h, f)).astype(np.int64)), f


def _big_chain_setup():
    rng = np.random.default_rng(53)
    A = [rng.integers(0, 4, int(rng.integers(4000, 12000)))
         .astype(np.uint8) for _ in range(4)]
    B = [_mutate(a, 0.04, rng) for a in A]
    g1, g2 = _gdb(A), _gdb(B)
    t1h, t2h = gixm.build_gix(g1), gixm.build_gix(g2)
    seeds_h = mergem.adaptamer_seeds(t1h, t2h, freq=10)
    lens1 = g1.contig_lengths()
    lens2 = g2.contig_lengths()
    perm1 = np.asarray(t1h.perm)
    alens = np.where(perm1 < len(lens1),
                     lens1[np.minimum(perm1, len(lens1) - 1)], 40)
    tubes_h = chainm.chain_tubes(seeds_h, int(lens1.max()),
                                 int(lens2.max()), alens)
    return g1, g2, alens, seeds_h, tubes_h


def _check_big_chain(g1, g2, alens, seeds_h, tubes_h):
    for dres in (dp.device_tubes(g1, g2, alens),
                 dp.device_tubes_paneled(g1, g2, alens, panels=4)):
        assert dres is not None
        tubes_d, nseeds, plsum = dres
        assert nseeds == seeds_h.n
        assert plsum == int(seeds_h.plen.astype(np.int64).sum())
        _tube_eq(tubes_d, tubes_h)


def test_device_chain_paneled_match(monkeypatch):
    """Past CHAIN_DEV_CAP the sweep panels by A-contig ranges on
    device; tubes must stay bit-identical to the monolithic host
    sweep."""
    monkeypatch.setattr(dp, "CHAIN_DEV_CAP", 1 << 12)
    _check_big_chain(*_big_chain_setup())


def test_host_chain_fallback_match(monkeypatch):
    """Past CHAIN_PANEL_MAX (here: forced) the chain runs host-side on
    the device seeds; also covers the single-contig panel overflow,
    where _run_chain_paneled declines."""
    monkeypatch.setattr(dp, "CHAIN_DEV_CAP", 1 << 12)
    monkeypatch.setenv("FASTGA_TPU_CHAIN", "host")
    args = _big_chain_setup()
    _check_big_chain(*args)
    # contig overflow: panels smaller than one contig's seeds decline
    monkeypatch.delenv("FASTGA_TPU_CHAIN")
    monkeypatch.setattr(dp, "CHAIN_DEV_CAP", 1 << 8)
    monkeypatch.setattr(dp, "CHAIN_PANEL_MAX", 1 << 30)
    _check_big_chain(*args)


def _sym_seeds_host(t1h, t2h, soft=False):
    seeds = mergem.adaptamer_seeds(t1h, t2h, freq=10, soft_mask=soft)
    extra = mergem.adaptamer_seeds_flip(t1h, t2h, freq=10,
                                        soft_mask=soft)
    return mergem.SeedBatch(*[
        np.concatenate([getattr(seeds, f), getattr(extra, f)])
        for f in ("plen", "acont", "apost", "bcont", "bpost", "bcomp")])


def test_device_tubes_symmetric_match_host():
    """-S symmetric mode through the device pipeline (normal + flip
    merge passes) must give the host path's tubes."""
    rng = np.random.default_rng(67)
    A = [rng.integers(0, 4, int(rng.integers(3000, 9000)))
         .astype(np.uint8) for _ in range(4)]
    # B repeats an A segment twice so the flip pass finds seeds the
    # normal pass drops (unique in G2, repetitive in G1)
    B = []
    for i, a in enumerate(A):
        b = _mutate(a, 0.04, rng)
        B.append(b)
    A[1] = np.concatenate([A[1], _mutate(A[1][:2000], 0.02, rng),
                           _mutate(A[1][:2000], 0.02, rng)])
    g1, g2 = _gdb(A), _gdb(B)
    t1h, t2h = gixm.build_gix(g1), gixm.build_gix(g2)
    seeds_h = _sym_seeds_host(t1h, t2h)
    lens1 = g1.contig_lengths()
    lens2 = g2.contig_lengths()
    perm1 = np.asarray(t1h.perm)
    alens = np.where(perm1 < len(lens1),
                     lens1[np.minimum(perm1, len(lens1) - 1)], 40)
    amax, bmax = int(lens1.max()), int(lens2.max())
    tubes_h = chainm.chain_tubes(seeds_h, amax, bmax, alens)

    dres = dp.device_tubes(g1, g2, alens, symmetric=True)
    assert dres is not None
    tubes_d, nseeds, plsum = dres
    assert nseeds == seeds_h.n
    assert plsum == int(seeds_h.plen.astype(np.int64).sum())
    _tube_eq(tubes_d, tubes_h)

    # the table-upload variant (mask path) with symmetric
    dres2 = dp.device_tubes_tables(t1h, t2h, alens, amax, bmax,
                                   symmetric=True)
    assert dres2 is not None
    tubes_d2, nseeds2, plsum2 = dres2
    assert nseeds2 == seeds_h.n
    assert plsum2 == int(seeds_h.plen.astype(np.int64).sum())
    _tube_eq(tubes_d2, tubes_h)


def test_device_tubes_symmetric_masked_match_host():
    rng = np.random.default_rng(71)
    A = [rng.integers(0, 4, 6000).astype(np.uint8) for _ in range(3)]
    B = [_mutate(a, 0.04, rng) for a in A]
    g1, g2 = _gdb(A), _gdb(B)
    masks1 = [gdbm.MaskIval(0, 100, 1500)]
    masks2 = [gdbm.MaskIval(1, 500, 2500)]
    t1 = gixm.build_gix(g1, masks=masks1)
    t2 = gixm.build_gix(g2, masks=masks2)
    for soft in (False, True):
        seeds_h = _sym_seeds_host(t1, t2, soft=soft)
        lens1 = g1.contig_lengths()
        lens2 = g2.contig_lengths()
        perm1 = np.asarray(t1.perm)
        alens = np.where(perm1 < len(lens1),
                         lens1[np.minimum(perm1, len(lens1) - 1)], 40)
        amax, bmax = int(lens1.max()), int(lens2.max())
        tubes_h = chainm.chain_tubes(seeds_h, amax, bmax, alens)
        dres = dp.device_tubes_tables(t1, t2, alens, amax, bmax,
                                      soft_mask=soft, symmetric=True)
        assert dres is not None
        tubes_d, nseeds, plsum = dres
        assert nseeds == seeds_h.n, (nseeds, seeds_h.n, soft)
        assert plsum == int(seeds_h.plen.astype(np.int64).sum())
        _tube_eq(tubes_d, tubes_h)


def test_device_tubes_scan_kernel_path(monkeypatch):
    """The fused Pallas scan-kernel path (forced, interpret mode) must
    produce the same tubes as the XLA scan fallback the other tests
    cover."""
    monkeypatch.setenv("FASTGA_TPU_SCAN_KERNEL", "force")
    monkeypatch.setenv("FASTGA_TPU_SCAN_INTERPRET", "1")
    rng = np.random.default_rng(77)
    A = [rng.integers(0, 4, int(rng.integers(3000, 9000)))
         .astype(np.uint8) for _ in range(4)]
    B = []
    for i, a in enumerate(A):
        b = _mutate(a, 0.05, rng)
        if i % 2 == 1:
            q = len(b) // 3
            b[q:2 * q] = (3 - b[q:2 * q])[::-1]
        B.append(b)
    g1, g2 = _gdb(A), _gdb(B)
    t1h, t2h = gixm.build_gix(g1), gixm.build_gix(g2)
    seeds_h = mergem.adaptamer_seeds(t1h, t2h, freq=10)
    lens1 = g1.contig_lengths()
    lens2 = g2.contig_lengths()
    perm1 = np.asarray(t1h.perm)
    alens = np.where(perm1 < len(lens1),
                     lens1[np.minimum(perm1, len(lens1) - 1)], 40)
    tubes_h = chainm.chain_tubes(seeds_h, int(lens1.max()),
                                 int(lens2.max()), alens)
    dres = dp.device_tubes(g1, g2, alens)
    assert dres is not None
    tubes_d, nseeds, plsum = dres
    assert nseeds == seeds_h.n
    assert plsum == int(seeds_h.plen.astype(np.int64).sum())
    _tube_eq(tubes_d, tubes_h)

    # self-comparison path (start_slot fill via the kernel)
    seeds_s = mergem.self_adaptamer_seeds(t1h, freq=10)
    amax = int(lens1.max())
    tubes_sh = chainm.chain_tubes(seeds_s, amax, amax, alens)
    dress = dp.device_tubes_self(g1, alens)
    assert dress is not None
    tubes_sd, nseeds_s, plsum_s = dress
    assert nseeds_s == seeds_s.n
    _tube_eq(tubes_sd, tubes_sh)
