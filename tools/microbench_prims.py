#!/usr/bin/env python
"""Primitive-level TPU microbench for the seed-phase building blocks.

Times (steady-state, jitted, synced via np.asarray of a scalar probe —
block_until_ready is unreliable over the axon tunnel) the primitives the
device seed pipeline is composed of, at the shapes the 192x50kb bench
pair actually uses, so optimization effort lands where the time is:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_prims.py

Shapes: M = merged-stream rows (~2 * entry cap), NS = seed-expansion cap.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fastga_tpu.ops import device_pipeline as devp

    M = int(os.environ.get("MB_M", 25165824))      # 24M merged rows
    NS = int(os.environ.get("MB_NS", 4194304))     # 4M seed cap
    rep = int(os.environ.get("MB_REP", 5))

    rng = np.random.default_rng(7)
    with jax.enable_x64():
        k64a = jnp.asarray(np.sort(
            rng.integers(-2**62, 2**62, M // 2, dtype=np.int64)))
        k64b = jnp.asarray(np.sort(
            rng.integers(-2**62, 2**62, M // 2, dtype=np.int64)))
        v64 = jnp.asarray(rng.integers(0, 2**62, M, dtype=np.int64))
        v64b = jnp.asarray(rng.integers(0, 2**62, M, dtype=np.int64))
        k64 = jnp.concatenate([k64a, k64b])
        ns_idx = jnp.asarray(
            rng.integers(0, NS, M, dtype=np.int64).astype(np.int32))
        m_idx = jnp.asarray(
            rng.integers(0, M, NS, dtype=np.int64).astype(np.int32))
        mark = jnp.asarray(rng.random(M) < 0.3)
        val32 = jnp.asarray(
            rng.integers(0, 2**18, M, dtype=np.int64).astype(np.int32))
        kch1 = jnp.asarray(rng.integers(0, 2**62, NS, dtype=np.int64))
        kch2 = jnp.asarray(rng.integers(0, 2**62, NS, dtype=np.int64))
        vch = jnp.asarray(rng.integers(0, 2**62, NS, dtype=np.int64))

        def timed(name, fn, *a):
            f = jax.jit(fn)
            try:
                r = f(*a)   # compile
            except Exception as e:
                print(f"{name:<28s} FAILED {type(e).__name__}: {e}")
                return
            _sync(r)
            t0 = time.time()
            for _ in range(rep):
                r = f(*a)
            _sync(r)
            dt = (time.time() - t0) / rep
            rows = (a[0].shape[0] if hasattr(a[0], "shape") else M)
            print(f"{name:<28s} {dt*1e3:8.2f} ms   "
                  f"{rows/dt/1e6:9.1f} Mrows/s", flush=True)

        def _sync(r):
            x = r[0] if isinstance(r, (tuple, list)) else r
            np.asarray(jax.device_get(x.ravel()[0]))

        print(f"M={M} NS={NS} rep={rep} "
              f"dev={jax.devices()[0].platform}", flush=True)

        timed("cumsum_i64_M", lambda x: jnp.cumsum(x), v64)
        timed("cummax_i64_M", lambda x: jax.lax.cummax(x, axis=0), v64)
        timed("cumsum_i32_M",
              lambda x: jnp.cumsum(x), val32)
        timed("cummax_i32_M",
              lambda x: jax.lax.cummax(x, axis=0), val32)
        timed("ffill_tagged_M(18b)",
              lambda m, v: devp._ffill_tagged(jax, jnp, m, v, 18),
              mark, val32)
        timed("flip_i64_M", lambda x: jnp.flip(x), v64)
        timed("elementwise_decode_M",
              lambda k, v: ((k >> 34) & 0xFFF) + ((v >> 6) & 0xFFFFFFF)
              + jnp.roll(k, 1), k64, v64)
        timed("clz_xor_roll_M",
              lambda a: devp._clz32_arr(
                  jnp, (a ^ jnp.roll(a, 1)).astype(jnp.int32)), v64)
        timed("scatter_add_M_to_NS",
              lambda i: jnp.zeros(NS, jnp.int32).at[i].add(
                  1, mode="drop"), ns_idx)
        timed("scatter_max_M_to_NS",
              lambda i, v: jnp.zeros(NS, jnp.int32).at[i].max(
                  v, mode="drop"),
              ns_idx, jnp.arange(M, dtype=jnp.int32))
        timed("gather_NS_from_M",
              lambda e, v: v[e], m_idx, v64)
        timed("sort1_i64_M", lambda k: jax.lax.sort((k,), num_keys=1)[0],
              v64)
        timed("sort_3op_NS",
              lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2)[0],
              kch1, kch2, vch)
        timed("sort_3op_M",
              lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2)[0],
              k64, v64, v64b)

        if jax.devices()[0].platform == "tpu":
            from fastga_tpu.ops import merge_pallas as mp
            if mp.supported(M // 2, M // 2):
                timed("merge_kernel_2op_M",
                      lambda a, b, c, d: mp.merge_sorted_streams(
                          (a, c), (b, d))[0],
                      k64a, k64b, v64[:M // 2], v64[M // 2:])
    return 0




def sorted_variants():
    """Monotonic-index scatter/gather (the expansion's actual pattern)."""
    import jax
    import jax.numpy as jnp
    M = int(os.environ.get("MB_M", 25165824))
    NS = int(os.environ.get("MB_NS", 4194304))
    rep = int(os.environ.get("MB_REP", 5))
    rng = np.random.default_rng(11)
    with jax.enable_x64():
        ns_sorted = jnp.asarray(np.sort(
            rng.integers(0, NS, M, dtype=np.int64)).astype(np.int32))
        m_sorted = jnp.asarray(np.sort(
            rng.integers(0, M, NS, dtype=np.int64)).astype(np.int32))
        v64 = jnp.asarray(rng.integers(0, 2**62, M, dtype=np.int64))

        def timed(name, fn, *a):
            f = jax.jit(fn)
            r = f(*a)
            np.asarray(jax.device_get(r.ravel()[0]))
            t0 = time.time()
            for _ in range(rep):
                r = f(*a)
            np.asarray(jax.device_get(r.ravel()[0]))
            dt = (time.time() - t0) / rep
            print(f"{name:<28s} {dt*1e3:8.2f} ms", flush=True)

        timed("scatter_add_sorted_M_to_NS",
              lambda i: jnp.zeros(NS, jnp.int32).at[i].add(1, mode="drop"),
              ns_sorted)
        timed("scatter_max_sorted_M_to_NS",
              lambda i, v: jnp.zeros(NS, jnp.int32).at[i].max(
                  v, mode="drop"),
              ns_sorted, jnp.arange(M, dtype=jnp.int32))
        timed("gather_sorted_NS_from_M",
              lambda e, v: v[e], m_sorted, v64)
        timed("cummax_i32_NS",
              lambda x: jax.lax.cummax(x, axis=0),
              jnp.asarray(rng.integers(0, 2**30, NS).astype(np.int32)))


if __name__ == "__main__":
    if os.environ.get("MB_SORTED"):
        sorted_variants()
        sys.exit(0)
    sys.exit(main())
