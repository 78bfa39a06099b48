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


def test_ppo_update_device_count_invariant():
    """Sharding the episode batch over 8 devices must produce the SAME
    policy update as one device on the identical global batch (reference
    normalizes returns over the full batch, ppo.py:151-157; per-shard
    normalization would change semantics with device count)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from adafocus_tpu.ppo.core import (
        discounted_returns, make_policy, ppo_init, ppo_update,
    )

    policy = make_policy(CFG)
    T, B, gh, gw, c = CFG.num_frames, 8, 2, 2, 8
    k = jax.random.key(11)
    fmaps = jax.random.normal(k, (T, B, gh, gw, c))
    params = policy.init(
        jax.random.key(12), policy.initial_hidden(B), fmaps[0]
    )["params"]
    ppo_cfg = PPOConfig()
    state = ppo_init(params, ppo_cfg)
    idx = jax.random.randint(jax.random.key(13), (T, B), 0, CFG.action_dim)
    logp = -jnp.abs(jax.random.normal(jax.random.key(14), (T, B)))
    rewards = jax.random.normal(jax.random.key(15), (T, B))

    def update(state, fmaps, idx, logp, rewards, axis):
        memory = {
            "fmaps": fmaps, "actions": idx, "old_logprob": logp,
            "returns": discounted_returns(rewards, ppo_cfg.gamma,
                                          axis_name=axis),
        }
        new_state, _, _ = ppo_update(policy, state, None, memory, ppo_cfg,
                                     axis_name=axis)
        return new_state.params

    single = update(state, fmaps, idx, logp, rewards, None)

    mesh = make_mesh()
    sharded_fn = shard_map(
        partial(update, axis="data"), mesh=mesh,
        in_specs=(P(), P(None, "data"), P(None, "data"), P(None, "data"),
                  P(None, "data")),
        out_specs=P(),
        check_vma=False,  # GRU scan carries start unvarying (see mesh.py)
    )
    sharded = jax.jit(sharded_fn)(state, fmaps, idx, logp, rewards)
    # atol: float-accumulation noise through Adam's sqrt normalization;
    # per-shard return normalization (the bug guarded against) diverges ~1e-1
    for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


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
