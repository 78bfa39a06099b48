"""Sth-Sth family tests: sum-consensus forwards, per-division policy,
incremental divisional rewards (exact parity vs the reference's
accumulate-and-rerun formulation), and all three stage steps."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.models.gfv_sthsth import (
    actions_per_frame,
    divisional_confidences,
    forward_random_sthsth,
    inference_sthsth,
)
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.ppo.core import PPOConfig
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import create_train_state
from adafocus_tpu.train.stages_sthsth import (
    make_sthsth_eval_step,
    make_sthsth_stage2_step,
    make_sthsth_train_step,
)


def tiny_cfg(**kw):
    base = dict(
        num_classes=5, num_frames=4, num_frames_focuser=6, image_size=24,
        glance_size=16, patch_size=16, action_dim=4, hidden_dim=16,
        policy_hidden=16, classifier="consensus", tsm=True, video_div=2,
        dtype=jnp.float32,
    )
    base.update(kw)
    return GFVConfig(**base)


def make_batch(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    tf = cfg.t_focuser
    frames = jnp.asarray(
        rng.normal(size=(b * tf, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    flat = pad_for_extraction(frames)
    return {
        "frames_flat": flat.reshape(b, tf, *flat.shape[1:]),
        "frames_small": jnp.asarray(
            rng.normal(size=(b, cfg.num_frames, cfg.glance_size,
                             cfg.glance_size, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, cfg.num_classes, b), jnp.int32),
    }


@pytest.fixture(scope="module")
def model_state():
    cfg = tiny_cfg()
    model = GFV(cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=2))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig())
    return model, tx, state


def test_actions_per_frame():
    a = jnp.asarray([[[0.1, 0.2], [0.7, 0.8]]])  # (1, D=2, 2)
    out = actions_per_frame(a, 6)
    assert out.shape == (1, 6, 2)
    np.testing.assert_allclose(out[0, :3], np.tile([0.1, 0.2], (3, 1)))
    np.testing.assert_allclose(out[0, 3:], np.tile([0.7, 0.8], (3, 1)))


def test_divisional_confidences_match_naive_recompute():
    """The running-mean formulation must equal the reference's
    recompute-consensus-over-all-accumulated-frames (gfv_net.py:162-188)."""
    rng = np.random.default_rng(0)
    b, tf, c, d = 3, 12, 7, 4
    f = tf // d
    local = jnp.asarray(rng.normal(size=(b, tf, c)), jnp.float32)
    rand = jnp.asarray(rng.normal(size=(b, tf, c)), jnp.float32)
    glob = jnp.asarray(rng.normal(size=(b, 8, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, b), jnp.int32)

    conf, base = divisional_confidences(local, rand, glob, labels, d)

    def naive_conf(logits_bt):  # consensus over however many frames given
        total = logits_bt.mean(axis=1) + np.asarray(glob).mean(axis=1)
        probs = jax.nn.softmax(jnp.asarray(total), axis=-1)
        return np.take_along_axis(np.asarray(probs),
                                  np.asarray(labels)[:, None], 1)[:, 0]

    for di in range(d):
        upto = np.asarray(local[:, : (di + 1) * f])
        np.testing.assert_allclose(np.asarray(conf[:, di]), naive_conf(upto),
                                   rtol=1e-5)
        swapped = np.concatenate(
            [np.asarray(local[:, : di * f]),
             np.asarray(rand[:, di * f : (di + 1) * f])], axis=1)
        np.testing.assert_allclose(np.asarray(base[:, di]),
                                   naive_conf(swapped), rtol=1e-5)


def test_stage1_forward_and_step(model_state):
    model, tx, state = model_state
    batch = make_batch(model.cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    total = forward_random_sthsth(
        model, variables, batch["frames_flat"], batch["frames_small"],
        jax.random.key(1), train=False,
    )
    assert total.shape == (2, 5)

    step = jax.jit(make_sthsth_train_step(model, 1, tx))
    new_state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    # glancer + policy frozen; focuser + classifier train
    def delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )
    assert delta(new_state.params["glancer"], state.params["glancer"]) == 0
    assert delta(new_state.params["policy"], state.params["policy"]) == 0
    assert delta(new_state.params["focuser"], state.params["focuser"]) > 0
    assert delta(new_state.params["classifier"], state.params["classifier"]) > 0


def test_stage2_ppo_step(model_state):
    model, _, state = model_state
    batch = make_batch(model.cfg)
    step = jax.jit(make_sthsth_stage2_step(model, PPOConfig()))
    new_state, metrics = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["ppo/loss"]))
    assert np.isfinite(float(metrics["reward_mean"]))
    def delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )
    assert delta(new_state.params["policy"], state.params["policy"]) > 0
    assert delta(new_state.params["focuser"], state.params["focuser"]) == 0


def test_stage3_step(model_state):
    model, tx, state = model_state
    batch = make_batch(model.cfg)
    step = jax.jit(make_sthsth_train_step(model, 3, tx))
    new_state, metrics = step(state, batch, jax.random.key(4))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_and_inference(model_state):
    model, _, state = model_state
    batch = make_batch(model.cfg)
    step = jax.jit(make_sthsth_eval_step(model))
    total, metrics = step(state, batch, jax.random.key(5))
    assert total.shape == (2, 5)
    assert 0.0 <= float(metrics["top1"]) <= 1.0
    # greedy inference is deterministic given params
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    t2 = inference_sthsth(model, variables, batch["frames_flat"],
                          batch["frames_small"], jax.random.key(99))
    np.testing.assert_allclose(np.asarray(total), np.asarray(t2), atol=1e-5)


def test_continuous_policy_stage2():
    cfg = tiny_cfg(continuous_policy=True, action_std=0.2, policy_bn=False)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), ppo_cfg=PPOConfig())
    batch = make_batch(cfg)
    step = jax.jit(make_sthsth_stage2_step(model, PPOConfig()))
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["ppo/loss"]))


def test_continuous_policy_stage2_bn_encoder():
    """The published sth-sth recipe trains the continuous policy WITH a
    BatchNorm state encoder (reference train_stage2.sh:
    actorcritic_with_bn=True action_std=0.25; ppo_continuous.py:32-41).
    The stage-2 step must (a) run at all (BN in train mode needs a mutable
    pass), (b) keep behavior/evaluate logprobs consistent (ratio==1 on the
    first update), and (c) ADVANCE the encoder's BN running statistics —
    in the reference, evaluate() under model.train() does this; greedy
    eval then normalizes with converged stats rather than init zeros/ones.
    """
    cfg = tiny_cfg(continuous_policy=True, action_std=0.25,
                   policy_bn=True, policy_channels=8)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), ppo_cfg=PPOConfig())
    before = jax.tree.map(jnp.copy, state.batch_stats["policy"])
    batch = make_batch(cfg)
    step = jax.jit(make_sthsth_stage2_step(model, PPOConfig()))
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["ppo/loss"]))
    assert abs(float(metrics["ppo/ratio_mean"]) - 1.0) < 1e-3
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         before, new_state.batch_stats["policy"])
    assert max(jax.tree.leaves(moved)) > 0
    # second step consumes the advanced stats; greedy inference (eval-mode
    # BN, running averages) runs without error on the updated state
    new_state, _ = step(new_state, batch, jax.random.key(2))
    variables = {"params": new_state.params,
                 "batch_stats": new_state.batch_stats}
    total = inference_sthsth(model, variables, batch["frames_flat"],
                             batch["frames_small"], jax.random.key(3))
    assert np.isfinite(np.asarray(total)).all()


def test_without_glancer():
    cfg = tiny_cfg(with_glancer=False)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0))
    batch = make_batch(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    total = inference_sthsth(model, variables, batch["frames_flat"],
                             batch["frames_small"], jax.random.key(1))
    assert total.shape == (2, 5)


def test_partial_bn_freezes_block_bn_affines():
    """TSM partialBN: stem BN trains, every block BN (stats AND affine
    params) stays frozen (reference tsn.py:146-162)."""
    cfg = tiny_cfg(partial_bn=True)
    model = GFV(cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=2),
                              partial_bn=True)
    state = create_train_state(model, jax.random.key(0), tx=tx)
    from adafocus_tpu.train.stages_sthsth import make_sthsth_train_step

    step = jax.jit(make_sthsth_train_step(model, 1, tx))
    batch = make_batch(cfg)
    new_state, _ = step(state, batch, jax.random.key(1))

    foc0, foc1 = state.params["focuser"], new_state.params["focuser"]
    stem_delta = float(jnp.abs(
        foc1["stem"]["bn"]["scale"] - foc0["stem"]["bn"]["scale"]).max())
    assert stem_delta > 0  # stem BN trains
    block = next(k for k in foc0 if k.startswith("layer"))
    inner = next(ck for ck in foc0[block] if "bn" in foc0[block][ck])
    blk_delta = float(jnp.abs(
        foc1[block][inner]["bn"]["scale"] - foc0[block][inner]["bn"]["scale"]
    ).max())
    assert blk_delta == 0  # block BN affine frozen
    conv_delta = float(jnp.abs(
        foc1[block][inner]["conv"]["kernel"] - foc0[block][inner]["conv"]["kernel"]
    ).max())
    assert conv_delta > 0  # convs still train
    # statistics frozen too: block bn stats unchanged
    s0 = state.batch_stats["focuser"][block][inner]["bn"]["mean"]
    s1 = new_state.batch_stats["focuser"][block][inner]["bn"]["mean"]
    assert float(jnp.abs(jnp.asarray(s1) - jnp.asarray(s0)).max()) == 0
