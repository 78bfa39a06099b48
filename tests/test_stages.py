"""Integration tests for the stage train/eval steps on tiny synthetic data
(SURVEY.md section 4: the test layer the reference lacks). Each stage step
must run jitted, update exactly its trainable components, and keep frozen
components bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.ppo.core import PPOConfig
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import (
    create_train_state,
    make_eval_step,
    make_stage2_step,
    make_stage_train_step,
)

CFG = GFVConfig(
    num_classes=6,
    num_frames=3,
    image_size=32,
    glance_size=16,
    patch_size=16,
    action_dim=4,
    hidden_dim=24,
    policy_hidden=16,
    dtype=jnp.float32,
)
OPT = OptimConfig(epochs=2, steps_per_epoch=4)


@pytest.fixture(scope="module")
def model_and_batch():
    model = GFV(CFG)
    b, t = 2, CFG.num_frames
    rng = np.random.RandomState(0)
    frames = rng.randn(b * t, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    flat = pad_for_extraction(jnp.asarray(frames))
    batch = {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": jnp.asarray(
            rng.randn(b, t, CFG.glance_size, CFG.glance_size, 3).astype(np.float32)
        ),
        "labels": jnp.asarray([1, 4]),
    }
    return model, batch


def max_delta(a, b):
    return max(
        jax.tree.leaves(
            jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
        )
    )


@pytest.mark.parametrize("stage,frozen,trained", [
    (0, ["policy"], ["glancer", "focuser", "classifier"]),
    (1, ["glancer", "policy"], ["focuser", "classifier"]),
    (3, ["glancer", "focuser", "policy"], ["classifier"]),
])
def test_supervised_stage_updates(model_and_batch, stage, frozen, trained):
    model, batch = model_and_batch
    tx = make_stage_optimizer(stage, OPT)
    state = create_train_state(model, jax.random.key(stage), tx=tx)
    step = jax.jit(make_stage_train_step(model, stage, tx))
    new_state, metrics = step(state, batch, jax.random.key(7))
    assert np.isfinite(float(metrics["loss"]))
    for k in frozen:
        assert max_delta(state.params[k], new_state.params[k]) == 0, k
    for k in trained:
        assert max_delta(state.params[k], new_state.params[k]) > 0, k
    assert int(new_state.step) == 1


def test_stage2_ppo_updates_policy_only(model_and_batch):
    model, batch = model_and_batch
    ppo_cfg = PPOConfig()
    state = create_train_state(model, jax.random.key(2), ppo_cfg=ppo_cfg)
    step = jax.jit(make_stage2_step(model, ppo_cfg))
    new_state, metrics = step(state, batch, jax.random.key(8))
    assert max_delta(state.params["policy"], new_state.params["policy"]) > 0
    for k in ("glancer", "focuser", "classifier"):
        assert max_delta(state.params[k], new_state.params[k]) == 0, k
    # old policy synced to new after update (reference ppo.py:178)
    assert max_delta(new_state.ppo.params, new_state.ppo.params_old) == 0
    assert np.isfinite(float(metrics["ppo/loss"]))
    assert np.isfinite(float(metrics["reward_mean"]))


def test_stage2_reward_modes_run(model_and_batch):
    model, batch = model_and_batch
    for mode in ("conf", "prev"):
        ppo_cfg = PPOConfig(reward_mode=mode)
        state = create_train_state(model, jax.random.key(3), ppo_cfg=ppo_cfg)
        step = jax.jit(make_stage2_step(model, ppo_cfg))
        _, metrics = step(state, batch, jax.random.key(9))
        assert np.isfinite(float(metrics["reward_mean"])), mode


def test_lookahead_baseline_matches_sequential_reference(model_and_batch):
    """The stage-2 random baseline is a one-step lookahead from the POLICY
    trajectory's GRU hidden (reference gfv_net.py:174-206 + :449-457:
    test_single_forward reads hx without writing it back). The batched
    implementation (classify_seq_with_hiddens + one vectorized
    classifier_lookahead) must equal the hand-rolled sequential MDP loop."""
    model, _ = model_and_batch
    state = create_train_state(model, jax.random.key(5))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    b, t, d = 2, CFG.num_frames, CFG.fused_dim
    rng = np.random.RandomState(1)
    fused_policy = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    fused_rand = jnp.asarray(rng.randn(b, t, d).astype(np.float32))

    # batched path (what make_stage2_step runs)
    _, hiddens = model.apply(
        variables, fused_policy, method=GFV.classify_seq_with_hiddens
    )
    h_prefix = jnp.concatenate(
        [jnp.zeros_like(hiddens[:, :1]), hiddens[:, :-1]], axis=1
    )
    batched = model.apply(
        variables, h_prefix.reshape(b * t, -1), fused_rand.reshape(b * t, -1),
        method=GFV.classifier_lookahead,
    ).reshape(b, t, -1)

    # sequential reference: carry h along the policy trajectory; at each t
    # peek one GRU step with the random features without advancing h
    h = jnp.zeros((b, CFG.hidden_dim), jnp.float32)
    seq = []
    for i in range(t):
        seq.append(model.apply(
            variables, h, fused_rand[:, i], method=GFV.classifier_lookahead
        ))
        h, _ = model.apply(
            variables, h, fused_policy[:, i], method=GFV.classifier_step
        )
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(jnp.stack(seq, axis=1)), atol=1e-5
    )


def test_eval_step(model_and_batch):
    model, batch = model_and_batch
    state = create_train_state(model, jax.random.key(4))
    step = jax.jit(make_eval_step(model))
    logits, metrics = step(state, batch, jax.random.key(10))
    assert logits.shape == (2, CFG.num_frames, CFG.num_classes)
    assert 0.0 <= float(metrics["top1"]) <= 1.0
