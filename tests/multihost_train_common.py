"""Shared builder for the multi-process sharded-training smoke test.

Used from two places that must produce bit-comparable programs:
tests/test_multihost.py's in-process single-controller reference run
(1 process, 4 virtual CPU devices) and the 2-process jax.distributed
workers (2 devices each). Both run the SAME jitted stage-1 step over a
4-device 'data' mesh on the SAME deterministic global batch — the
cross-process pmean must therefore reproduce the single-process result
(the reference's DDP all-reduce semantics, actnet/main_dist.py:136,492).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.parallel.mesh import make_mesh, shard_train_step
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import create_train_state, make_stage_train_step

CFG = GFVConfig(
    num_classes=5, num_frames=2, image_size=24, glance_size=16, patch_size=16,
    action_dim=4, hidden_dim=16, policy_hidden=16, dtype=jnp.float32,
)
BATCH = 8


def global_batch() -> dict:
    """Deterministic 8-video batch, as host numpy (sliceable per process)."""
    rng = np.random.RandomState(0)
    t = CFG.num_frames
    frames = rng.randn(
        BATCH * t, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    flat = np.asarray(pad_for_extraction(jnp.asarray(frames)))
    return {
        "frames_flat": flat.reshape(BATCH, t, *flat.shape[1:]),
        "frames_small": rng.randn(
            BATCH, t, CFG.glance_size, CFG.glance_size, 3
        ).astype(np.float32),
        "labels": rng.randint(0, CFG.num_classes, size=(BATCH,)),
    }


def build():
    """(mesh, initial state, sharded jitted step, host batch, root key).

    The mesh is always 4 devices so the per-shard rng folds
    (parallel/mesh.py shard_train_step) are identical whether those four
    devices live in one process or two.
    """
    mesh = make_mesh(4)
    model = GFV(CFG)
    tx = make_stage_optimizer(1, OptimConfig(epochs=2, steps_per_epoch=2))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    step = make_stage_train_step(model, 1, tx, axis_name="data")
    pstep = shard_train_step(step, mesh, donate_state=False)
    return mesh, state, pstep, global_batch(), jax.random.key(1)


def fingerprint(tree) -> str:
    """Order-stable scalar digest of a (replicated) pytree: total L1 mass
    and signed sum, accumulated in float64 on host."""
    tot_abs = 0.0
    tot = 0.0
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            x = np.asarray(leaf.addressable_shards[0].data, np.float64)
        else:
            x = np.asarray(leaf, np.float64)
        tot_abs += float(np.abs(x).sum())
        tot += float(x.sum())
    return "abs=%.17g sum=%.17g" % (tot_abs, tot)


def emulate_reference() -> str:
    """Single-controller emulation of the 4-shard sharded step: per-shard
    losses and grads (each shard b=2 with rng = fold_in(key, shard)), mean
    the grads (= the step's pmean), apply the REAL stage-1 optimizer once.

    MUST run in a process whose XLA CPU backend has the same
    --xla_force_host_platform_device_count as each distributed worker (2):
    XLA:CPU conv numerics vary with the virtual device count (measured:
    per-shard CE on this model differs by up to ~13% between 2- and
    8-device backends through 50 conv+BN layers), so only a matched
    backend is bit-comparable.

    Grad extraction trick: a probe step with sgd(lr=1.0) updates
    params to (params - g), so g = params - new_params, without
    re-implementing the loss.
    """
    import optax

    mesh, state, pstep, batch, key = build()
    del mesh, pstep
    model = GFV(CFG)
    probe_tx = optax.sgd(1.0)
    probe = jax.jit(make_stage_train_step(model, 1, probe_tx))
    probe_state = state.replace(opt_state=probe_tx.init(state.params))
    losses, grads = [], []
    for i in range(4):
        rows = jax.tree.map(lambda x: x[2 * i:2 * (i + 1)], batch)
        new_state, m = probe(probe_state, rows, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
        grads.append(jax.tree.map(
            lambda p, q: np.asarray(p, np.float64) - np.asarray(q, np.float64),
            state.params, new_state.params))
    mean_g = jax.tree.map(
        lambda *gs: (sum(gs) / len(gs)).astype(np.float32), *grads)
    tx = make_stage_optimizer(1, OptimConfig(epochs=2, steps_per_epoch=2))
    updates, _ = tx.update(mean_g, state.opt_state, state.params)
    params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return ("REF_LOSS %.17g REF_FP %s" %
            (float(np.mean(losses)), fingerprint(params)))
