"""Test config: force an 8-virtual-device CPU platform before jax imports.

The driver's dryrun validates real multi-chip sharding separately; tests use
XLA's host-platform device-count override so sharded code paths execute on any
machine (including the single-TPU dev box).

Compiled-device lane (VERDICT r4 #6): ``FASTGA_TPU_TEST_DEVICE=1`` keeps
the real TPU backend instead and sets ``INTERPRET = False`` so the pallas
kernel equality tests exercise the Mosaic-compiled kernels — the code that
actually ships.  Run the kernel subset on the dev chip with:

    FASTGA_TPU_TEST_DEVICE=1 python -m pytest tests/test_wave_pallas.py \\
        tests/test_wave0_pallas.py tests/test_merge_pallas.py \\
        tests/test_scan_pallas.py -q

(Tests needing the 8-device CPU mesh auto-skip under this lane.)
"""

import os

DEVICE_LANE = os.environ.get("FASTGA_TPU_TEST_DEVICE") == "1"
INTERPRET = not DEVICE_LANE

if not DEVICE_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()


def _force_cpu_backend():
    """This box's sitecustomize pre-registers a TPU backend at interpreter
    boot; env vars alone don't override it once registered.  Set the
    platform unconditionally (probing jax.devices() first would try to
    initialize the TPU backend — which hangs or raises when the remote
    tunnel is down)."""
    import jax
    import jax.extend
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.extend.backend.clear_backends()
    except Exception:
        pass


if not DEVICE_LANE:
    _force_cpu_backend()

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    if not DEVICE_LANE:
        return
    skip = pytest.mark.skip(
        reason="needs the 8-virtual-device CPU mesh (device lane runs "
               "on the single real chip)")
    for it in items:
        if any(k in str(it.fspath) for k in
               ("test_sharded", "test_distributed")):
            it.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xFA57A)


def make_genome(rng, length, gc=0.42):
    """Random numeric-coded genome with the given GC content."""
    p_at = (1.0 - gc) / 2
    p_gc = gc / 2
    return rng.choice(4, size=length, p=[p_at, p_gc, p_gc, p_at]).astype(np.uint8)


def mutate(rng, codes, sub=0.02, ins=0.005, dele=0.005):
    """Apply random substitutions/indels; returns the mutated numeric sequence."""
    out = []
    i = 0
    n = len(codes)
    while i < n:
        r = rng.random()
        if r < sub:
            out.append((codes[i] + rng.integers(1, 4)) % 4)
            i += 1
        elif r < sub + ins:
            out.append(rng.integers(0, 4))
        elif r < sub + ins + dele:
            i += 1
        else:
            out.append(codes[i])
            i += 1
    return np.array(out, dtype=np.uint8)
