"""Multi-host (multi-process) execution for the sharded seed pipeline.

The reference is single-node (SURVEY §2.5: pthreads + temp files); the
TPU build's distributed story is BASELINE's north star instead: the
P1-P4/P7 pipeline of parallel/sharded.py runs unchanged over a mesh
that spans processes — `jax.distributed` + one global 1-D mesh whose
device order keeps each process's devices contiguous, so the
prefix-routing `lax.all_to_all` moves intra-host segments over ICI and
only the cross-host remainder over DCN.

Usage (one call per process, before any jax op):

    from fastga_tpu.parallel import distributed as dist
    dist.init(coordinator="host0:12345", num_processes=2, process_id=i)
    mesh = dist.global_mesh()
    tubes = sharded.sharded_tubes(gdb1, gdb2, alens, mesh)

On CPU test rigs, set ``local_device_count`` to multiply virtual
devices per process (XLA_FLAGS --xla_force_host_platform_device_count).

tests/test_distributed.py runs the 2-process x 4-virtual-device CPU
correctness gate: sharded_tubes over the global mesh must equal the
single-process pipeline record for record.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .sharded import AXIS


def init(coordinator: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None,
         local_device_count: Optional[int] = None) -> bool:
    """Initialize jax.distributed for a multi-process run.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).  Returns False (no-op) when no
    multi-process configuration is present — single-process callers can
    call this unconditionally."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator or not num_processes or num_processes <= 1:
        return False
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        tok = f"--xla_force_host_platform_device_count={local_device_count}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + tok).strip()
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh():
    """1-D mesh over every device of every process (the sharded
    pipeline's AXIS).  jax.devices() orders devices process-major, so
    collectives ride ICI within a host and DCN only across hosts."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (AXIS,))


def is_multiprocess() -> bool:
    import jax
    return jax.process_count() > 1


def gather_host(x) -> np.ndarray:
    """Full host copy of a (possibly cross-process) device array:
    replicate over the global mesh inside jit, then read locally."""
    import jax
    if jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(global_mesh(), PartitionSpec())
        x = jax.jit(lambda a: a, out_shardings=rep)(x)
    return np.asarray(x)
