"""Multi-chip sharding of the alignment pipeline.

The reference's parallelism is all intra-box pthreads over shared arrays
(SURVEY.md §2.5); the TPU-native equivalents here are:

- P2 (contig-space split)   -> tubes data-parallel over the mesh 'd' axis
- P1 (k-mer-space split)    -> syncmer scan sharded over sequence chunks,
                               k-mer histogram reduced with psum
- P3 (all-to-all shuffle)   -> seed records redistributed to their owner
                               shard with lax.all_to_all
- P7 (merge to one writer)  -> per-shard stats psum'd; records gathered

``pipeline_step`` is the jittable multi-chip step the driver dry-runs: it
exercises the real shardings (data-parallel wave over tubes + collective
seed/stat reductions) on an ``n_devices`` mesh.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def make_mesh(n_devices: int, axis: str = "d"):
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, (axis,))


def sharded_wave_step(mesh, spec, cfg):
    """Build a pjit'd multi-chip wave step: tubes sharded over 'd', the
    sequence pool replicated, per-shard wave-0 + one wave chunk, and a
    psum'd global progress stat."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ..ops import wave as wavek

    wave0 = wavek.build_wave0(cfg, +1)
    chunk_fn, _ = wavek.build_forward_chunk(
        cfg, spec.ave_path, np.asarray(spec.table), np.asarray(spec.score),
        +1)

    def local_step(pool, aw, alen, bw, blen, dgmin, dgmax, anti):
        targs = (aw, alen, bw, blen,
                 jnp.full_like(aw, -(1 << 30)), jnp.full_like(aw, 1 << 30))
        st, kbase0 = wave0(pool, targs, dgmin, dgmax, anti)
        st, chlog, bandlog = chunk_fn(pool, targs, st)
        trima = st[10]
        nalive = st[15].sum().astype(jnp.int32)
        total_alive = jax.lax.psum(nalive, "d")
        return trima, total_alive

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
                  P("d")),
        out_specs=(P("d"), P()),
        check_rep=False)
    return jax.jit(fn)


def sharded_seed_histogram(mesh):
    """Sharded syncmer scan + collective k-mer bucket histogram (the
    GIXmake distribution phase as psum over the mesh)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from ..ops import syncmer

    def local(bases_shard, length_shard):
        mask = syncmer.syncmer_mask_jnp(bases_shard[0, 0],
                                        length_shard[0, 0])
        # 10-bit bucket histogram of selected positions' first bases
        b = bases_shard[0, 0].astype(jnp.int32)
        n = b.shape[0]
        b10 = ((b[: n - 4] << 8) | (b[1 : n - 3] << 6) | (b[2 : n - 2] << 4)
               | (b[3 : n - 1] << 2) | b[4:])
        nw = mask.shape[0]
        hist = jnp.zeros(1024, jnp.int32).at[b10[:nw]].add(
            mask.astype(jnp.int32))
        return jax.lax.psum(hist, "d")[None]

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("d"), P("d")), out_specs=P("d"),
                   check_rep=False)
    return jax.jit(fn)


def sharded_seed_exchange(mesh, nshards: int):
    """P3: all_to_all seed redistribution — each shard bins its seed
    records by destination (A-contig panel owner) and exchanges."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    def local(seeds):   # [1, nshards, k, f] pre-binned by destination
        out = jax.lax.all_to_all(seeds, "d", split_axis=1, concat_axis=1,
                                 tiled=False)
        return out

    fn = shard_map(local, mesh=mesh, in_specs=(P("d"),), out_specs=P("d"),
                   check_rep=False)
    return jax.jit(fn)
