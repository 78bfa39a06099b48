"""Device mesh + data-parallel sharding helpers.

TPU-native replacement for the reference's distributed stack
(actnet/main_dist.py:53-80,136,234 in /root/reference: mp.spawn one process
per GPU, NCCL process groups, DDP gradient all-reduce, DistributedSampler):
here a single pjit/shard_map program runs over a 1-D ``data`` mesh axis,
gradients/metrics are pmean'd over ICI inside the program, and the "sampler"
is just the batch axis sharded across devices. This also lifts the
reference's single-GPU restriction on PPO training
(actnet/main_dist.py:112-114): stage-2 shards like any other step because
its episode memory is device-resident arrays (adafocus_tpu/ppo/core.py).

The models here are <=ResNet-50 scale, so tensor/pipeline parallelism buys
nothing (SURVEY.md section 2.3) — the mesh is deliberately 1-D data
parallel; batch-norm statistics stay per-replica (matching DDP semantics)
unless modules are built with axis_name for cross-replica stats.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place a host batch with the leading dim sharded over the mesh.

    On a multi-process mesh (real multi-host, jax.process_count() > 1) the
    input is each process's LOCAL loader batch (the per-host record shard,
    data/pipeline.py host_id/num_hosts); the global batch is their
    concatenation in process order — the reference's DistributedSampler
    contract (actnet/main_dist.py:234)."""
    sharding = NamedSharding(mesh, P(axis))
    if sharding.is_fully_addressable:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Every device holds the full value. Works on multi-process meshes
    (each process must pass the same host value — true for seeded state)."""
    sharding = NamedSharding(mesh, P())
    if sharding.is_fully_addressable:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        arrs = [jax.device_put(x, d) for d in sharding.addressable_devices]
        return jax.make_array_from_single_device_arrays(x.shape, sharding, arrs)

    return jax.tree.map(put, tree)


def replicate_key(key: jax.Array, mesh: Mesh) -> jax.Array:
    """Replicate a typed PRNG key over a (possibly multi-process) mesh.
    Key arrays can't ride the numpy paths above; go through key_data."""
    data = replicate(jax.random.key_data(key), mesh)
    return jax.random.wrap_key_data(data)


def shard_train_step(
    step_fn: Callable,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    donate_state: bool = True,
) -> Callable:
    """Lift step(state, batch, rng) -> (state, metrics) onto the mesh.

    state/rng replicated, batch sharded on its leading axis. ``step_fn``
    must have been built with axis_name=axis so its gradients/metrics are
    pmean'd (the jit-internal analog of DDP's all-reduce). Each shard folds
    the axis index into its rng so stochastic choices (patch sampling,
    dropout, PPO exploration) decorrelate across replicas — the analog of
    the reference's per-rank seeds.
    """

    def wrapped(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return step_fn(state, batch, rng)

    sharded = shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        # the GRU scans start from unvarying zero carries which become
        # axis-varying after one step; skip the strict vma typecheck.
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate_state else ())
