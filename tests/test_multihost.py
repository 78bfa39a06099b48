"""Two-process jax.distributed smoke test on CPU — the multi-host paths
(run.multihost init in cli/common.apply_platform and the validate() mAP
process_allgather, cli/train.py) that the reference can only exercise on a
real cluster (TCP rendezvous, actnet/main_dist.py:47-80). Spawns two real
processes that rendezvous over localhost."""

import os
import socket
import subprocess
import sys

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
