"""2-process multi-host correctness gate (VERDICT r2 task 8).

Spawns two subprocesses that initialize `jax.distributed` (CPU backend,
4 virtual devices each), build the global 8-device mesh, and run the
sharded seed pipeline on a synthetic pair.  Process 0 also runs the
single-device pipeline locally and asserts tube-for-tube equality —
the same gate dryrun_multichip applies single-process.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys, pickle
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
outf = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))) if "__file__" in dir() else ".")

from fastga_tpu.parallel import distributed as dist
ok = dist.init(coordinator=f"localhost:{port}", num_processes=2,
               process_id=pid)
assert ok

import jax
assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

from fastga_tpu.utils import synth
from fastga_tpu.parallel import sharded
from fastga_tpu.ops import device_pipeline as devp
from fastga_tpu.io.gix import _length_perm

rng = np.random.default_rng(99)
pair = synth.uniform_pair(rng, 3, 24000, div=0.02)
g1, _ = synth.to_gdb("a", pair["A"])
g2, _ = synth.to_gdb("b", pair["B"])
lens1 = g1.contig_lengths()
lens_eff = np.concatenate([lens1, np.full(max(0, 8 - len(lens1)), 40,
                                          np.int64)])
perm = np.asarray(_length_perm(lens_eff)[0])
alens = np.where(perm < len(lens1),
                 lens1[np.minimum(perm, len(lens1) - 1)], 40)

mesh = dist.global_mesh()
res = sharded.sharded_tubes(g1, g2, alens, mesh)
assert res is not None
tubes, nseeds, plsum = res

# full end-to-end under the 2-process mesh: every process drives the
# wave phase over its local devices; process 0 also runs the
# single-device pipeline and asserts the FINAL OVERLAP RECORDS equal
# (VERDICT r4 #7: the old gate stopped at tube descriptors)
from fastga_tpu.models import aligner
ovls_s, stats_s = aligner.align_genomes(g1, g2, engine="jax",
                                        mesh=mesh)
assert stats_s.get("sharded") == 8, stats_s

if pid == 0:
    ref = devp.device_tubes(g1, g2, alens)
    assert ref is not None
    rt, rn, rp = ref
    rows = lambda t: [tuple(int(v) for v in row) for row in zip(
        t.acont, t.bcont, t.comp, t.dgmin, t.dgmax, t.alow, t.ahgh,
        t.pairing, t.cov)]
    assert nseeds == rn and plsum == rp, (nseeds, rn, plsum, rp)
    assert rows(tubes) == rows(rt), "tube mismatch"
    ovls_1, _ = aligner.align_genomes(g1, g2, engine="jax")
    assert len(ovls_s) == len(ovls_1) and all(
        (a.aread, a.abpos, a.aepos, a.bbpos, a.bepos, a.diffs, a.trace)
        == (b.aread, b.abpos, b.aepos, b.bbpos, b.bepos, b.diffs,
            b.trace)
        for a, b in zip(ovls_s, ovls_1)), "overlap mismatch"
    with open(outf, "w") as f:
        f.write(f"OK {tubes.n} tubes {nseeds} seeds "
                f"{len(ovls_s)} overlaps")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_sharded_equality(tmp_path):
    port = _free_port()
    w = tmp_path / "worker.py"
    w.write_text(WORKER)
    outf = tmp_path / "result.txt"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=str(REPO),
               JAX_ENABLE_X64="0")
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [subprocess.Popen(
        [sys.executable, str(w), str(i), str(port), str(outf)],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-3000:]}"
    assert outf.exists() and outf.read_text().startswith("OK"), outs[0]
