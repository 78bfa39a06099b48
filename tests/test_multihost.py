"""Two-process jax.distributed smoke test on CPU — the multi-host paths
(run.multihost init in cli/common.apply_platform and the validate() mAP
process_allgather, cli/train.py) that the reference can only exercise on a
real cluster (TCP rendezvous, actnet/main_dist.py:47-80). Spawns two real
processes that rendezvous over localhost."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, {root!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

# drive the framework's own multihost entry (cli/common.apply_platform):
# explicit run.coordinator rendezvous, CPU platform forced pre-backend-init
import dataclasses
from adafocus_tpu.config import RunConfig
from adafocus_tpu.cli.common import apply_platform

apply_platform(dataclasses.replace(
    RunConfig(), platform="cpu", multihost=True,
    coordinator="localhost:{port}", num_processes=2,
    process_id=int(sys.argv[1])))
import jax
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 hosts x 2 devices
assert jax.local_device_count() == 2

# the validate() mAP gather path (cli/train.py): every host contributes its
# score shard; all hosts see the full set
pid = jax.process_index()
scores = np.full((3, 5), float(pid), np.float32)
from jax.experimental import multihost_utils

gathered = np.concatenate(multihost_utils.process_allgather(scores))
assert gathered.shape == (6, 5), gathered.shape
np.testing.assert_array_equal(gathered[:3], 0.0)
np.testing.assert_array_equal(gathered[3:], 1.0)

# per-host dataset sharding (the reference's DistributedSampler,
# main_dist.py:234): hosts must read disjoint record subsets
from adafocus_tpu.data.pipeline import LoaderConfig, SyntheticVideoSource, VideoLoader
from adafocus_tpu.cli.common import synthetic_records

records = synthetic_records(8, num_classes=4)
loader = VideoLoader(records, SyntheticVideoSource(), LoaderConfig(
    batch_size=2, num_workers=0, num_segments=2, host_id=pid, num_hosts=2))
seen = sorted(r.path for r in loader.records)
all_seen = multihost_utils.process_allgather(
    np.array([hash(p) % 10**9 for p in seen], np.int64))
assert len(set(all_seen.reshape(-1).tolist())) == 8, "hosts overlap"

print("WORKER_OK", pid, flush=True)
"""


_TRAIN_WORKER = r"""
import os, sys
sys.path.insert(0, {root!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import dataclasses
from adafocus_tpu.config import RunConfig
from adafocus_tpu.cli.common import apply_platform

apply_platform(dataclasses.replace(
    RunConfig(), platform="cpu", multihost=True,
    coordinator="localhost:{port}", num_processes=2,
    process_id=int(sys.argv[1])))
import jax
import numpy as np

assert jax.process_count() == 2 and jax.device_count() == 4

from adafocus_tpu.parallel.mesh import replicate, replicate_key, shard_batch
from tests.multihost_train_common import build, fingerprint

mesh, state, pstep, batch, key = build()
pid = jax.process_index()
# each process contributes ITS rows of the global batch (the reference's
# DistributedSampler semantics, main_dist.py:234): p0 -> rows [0:4),
# p1 -> rows [4:8) (mesh device order is process-major). These are the
# PRODUCTION helpers cli/train.py uses on a real multi-host slice.
local = jax.tree.map(lambda x: x[pid * 4:(pid + 1) * 4], batch)
gbatch = shard_batch(local, mesh)
gstate = replicate(state, mesh)
gkey = replicate_key(key, mesh)

new_state, metrics = pstep(gstate, gbatch, gkey)
loss = float(np.asarray(metrics["loss"].addressable_shards[0].data))
print("TRAIN_LOSS %.17g" % loss, flush=True)
print("TRAIN_FP %s" % fingerprint(new_state.params), flush=True)
print("WORKER_OK", pid, flush=True)
"""

_TRAIN_REF = r"""
import os, sys
sys.path.insert(0, {root!r})
# numerics-matched backend: same per-process virtual device count as each
# distributed worker (see multihost_train_common.emulate_reference)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from tests.multihost_train_common import emulate_reference
print(emulate_reference(), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cpu(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    code = _WORKER.format(root=root, port=port)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out


@pytest.mark.slow
def test_two_process_sharded_train_step():
    """One jitted stage-1 training step over a mesh spanning two processes
    must reproduce the single-controller result on the same global batch —
    the cross-DCN analog of DDP's gradient all-reduce
    (actnet/main_dist.py:136,492).

    The reference is a per-shard emulation (4 separate b=2 steps with the
    sharded program's exact per-shard rng folds, grads meaned on host, one
    real optimizer update) run in a subprocess whose XLA CPU backend
    matches each worker's 2-device config — XLA:CPU conv numerics vary
    with the virtual device count, so only a matched backend compares
    beyond ~1% (see multihost_train_common.emulate_reference). Against
    that reference, the distributed loss and updated-params digest must
    agree to float-reduction precision."""
    import re

    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}

    ref_proc = subprocess.run(
        [sys.executable, "-c", _TRAIN_REF.format(root=root)],
        env=env, capture_output=True, text=True, timeout=900)
    assert ref_proc.returncode == 0, ref_proc.stdout + ref_proc.stderr
    m = re.search(r"REF_LOSS (\S+) REF_FP abs=(\S+) sum=(\S+)",
                  ref_proc.stdout)
    assert m, ref_proc.stdout
    ref_loss, ref_abs, ref_sum = map(float, m.groups())

    port = _free_port()
    code = _TRAIN_WORKER.format(root=root, port=port)
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
    fps = set()
    for out in outs:
        loss = float(re.search(r"TRAIN_LOSS (\S+)", out).group(1))
        w = re.search(r"TRAIN_FP abs=(\S+) sum=(\S+)", out)
        fps.add(w.group(0))
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-6)
        np.testing.assert_allclose(float(w.group(1)), ref_abs, rtol=1e-5)
        # signed sum is cancellation-prone; bound it by the L1 mass
        assert abs(float(w.group(2)) - ref_sum) < 1e-5 * ref_abs
    # both processes must hold the identical replicated result
    assert len(fps) == 1, fps
