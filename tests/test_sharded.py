"""The sharded seed pipeline (position-block candidate gen -> all_to_all
to k-mer-prefix owners -> per-shard sort/merge -> all_to_all of seeds to
A-contig owners -> per-shard chain) must reproduce the single-device
pipeline bit for bit, including tube order, on an 8-virtual-device mesh.
"""

import numpy as np

from fastga_tpu.ops import chain as chainm
from fastga_tpu.ops import device_pipeline as dp
from fastga_tpu.ops import merge as mergem
from fastga_tpu.io import gix as gixm
from fastga_tpu.parallel import sharded
from tests.test_device_pipeline import _gdb, _mutate


def test_sharded_tubes_match_single_device():
    rng = np.random.default_rng(77)
    nc = 6
    A = [rng.integers(0, 4, int(rng.integers(3000, 14000)))
         .astype(np.uint8) for _ in range(nc)]
    B = []
    for i, a in enumerate(A):
        b = _mutate(a, float(rng.uniform(0.02, 0.06)), rng)
        if i % 3 == 1:
            q = len(b) // 3
            b[q:2 * q] = (3 - b[q:2 * q])[::-1]
        B.append(b)
    g1, g2 = _gdb(A), _gdb(B)
    lens1 = g1.contig_lengths()
    lens2 = g2.contig_lengths()
    t1h = gixm.build_gix(g1)
    perm1 = np.asarray(t1h.perm)
    alens = np.where(perm1 < len(lens1),
                     lens1[np.minimum(perm1, len(lens1) - 1)], 40)

    # host oracle
    t2h = gixm.build_gix(g2)
    seeds_h = mergem.adaptamer_seeds(t1h, t2h, freq=10)
    tubes_h = chainm.chain_tubes(seeds_h, int(lens1.max()),
                                 int(lens2.max()), alens)

    mesh = sharded.make_mesh(8)
    sres = sharded.sharded_tubes(g1, g2, alens, mesh)
    assert sres is not None
    tubes_s, nseeds, plsum = sres
    assert nseeds == seeds_h.n
    assert plsum == int(seeds_h.plen.astype(np.int64).sum())
    assert tubes_s.n == tubes_h.n
    for f in ("acont", "bcont", "comp", "dgmin", "dgmax", "alow",
              "ahgh", "pairing"):
        assert np.array_equal(
            np.asarray(getattr(tubes_s, f)).astype(np.int64),
            np.asarray(getattr(tubes_h, f)).astype(np.int64)), f


def test_sharded_e2e_overlaps_match():
    """Full sharded seed phase + shared wave phase == single-device
    align_genomes output (the §2.5 acceptance: same overlap list)."""
    from fastga_tpu.models import aligner

    rng = np.random.default_rng(99)
    A = [rng.integers(0, 4, 9000).astype(np.uint8) for _ in range(3)]
    B = [_mutate(a, 0.03, rng) for a in A]
    g1, g2 = _gdb(A), _gdb(B)

    ovls_single, stats_single = aligner.align_genomes(
        g1, g2, engine="jax")

    mesh = sharded.make_mesh(8)
    ovls_sharded, stats_sharded = aligner.align_genomes(
        g1, g2, engine="jax", mesh=mesh)
    assert stats_sharded.get("sharded") == mesh.devices.size
    assert stats_sharded["nseeds"] == stats_single["nseeds"]
    assert len(ovls_sharded) == len(ovls_single)
    for a, b in zip(ovls_sharded, ovls_single):
        assert (a.aread, a.bread, a.bcomp, a.abpos, a.aepos, a.bbpos,
                a.bepos, a.diffs, a.trace) == \
               (b.aread, b.bread, b.bcomp, b.abpos, b.aepos, b.bbpos,
                b.bepos, b.diffs, b.trace)


def test_sharded_self_tubes_match_host():
    """Sharded self-comparison (FastGA A over the mesh) must reproduce
    the host self pipeline bit for bit, including tube order."""
    rng = np.random.default_rng(101)
    A = []
    for _ in range(4):
        base = rng.integers(0, 4, int(rng.integers(4000, 10000))
                            ).astype(np.uint8)
        rep_seg = base[:len(base) // 3]
        A.append(np.concatenate([base, _mutate(rep_seg, 0.03, rng)]))
    g1 = _gdb(A)
    lens1 = g1.contig_lengths()
    t1h = gixm.build_gix(g1)
    perm1 = np.asarray(t1h.perm)
    alens = np.where(perm1 < len(lens1),
                     lens1[np.minimum(perm1, len(lens1) - 1)], 40)
    seeds_h = mergem.self_adaptamer_seeds(t1h, freq=10)
    amax = int(lens1.max())
    tubes_h = chainm.chain_tubes(seeds_h, amax, amax, alens)

    mesh = sharded.make_mesh(8)
    sres = sharded.sharded_tubes(g1, None, alens, mesh)
    assert sres is not None
    tubes_s, nseeds, plsum = sres
    assert nseeds == seeds_h.n
    assert plsum == int(seeds_h.plen.astype(np.int64).sum())
    assert tubes_s.n == tubes_h.n
    for f in ("acont", "bcont", "comp", "dgmin", "dgmax", "alow",
              "ahgh", "pairing"):
        assert np.array_equal(
            np.asarray(getattr(tubes_s, f)).astype(np.int64),
            np.asarray(getattr(tubes_h, f)).astype(np.int64)), f


def test_sharded_self_e2e_overlaps_match():
    """align_genomes(mesh=...) self == single-device self output."""
    from fastga_tpu.models import aligner

    rng = np.random.default_rng(103)
    A = []
    for _ in range(3):
        base = rng.integers(0, 4, 8000).astype(np.uint8)
        A.append(np.concatenate([base, _mutate(base[:3000], 0.03, rng)]))
    g1 = _gdb(A)

    ovls_single, stats_single = aligner.align_genomes(
        g1, g1, engine="jax")
    mesh = sharded.make_mesh(8)
    ovls_sharded, stats_sharded = aligner.align_genomes(
        g1, g1, engine="jax", mesh=mesh)
    assert stats_sharded.get("sharded") == mesh.devices.size
    assert stats_sharded["nseeds"] == stats_single["nseeds"]
    assert len(ovls_sharded) == len(ovls_single)
    for a, b in zip(ovls_sharded, ovls_single):
        assert (a.aread, a.bread, a.bcomp, a.abpos, a.aepos, a.bbpos,
                a.bepos, a.diffs, a.trace) == \
               (b.aread, b.bread, b.bcomp, b.abpos, b.aepos, b.bbpos,
                b.bepos, b.diffs, b.trace)
