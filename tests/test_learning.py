"""Does the framework actually LEARN? Synthetic learnable tasks:

  * stage 1: classification where the label is visible in the frame —
    loss must fall and accuracy must beat chance by a wide margin;
  * stage 2: a task where the *patch location* determines how much
    evidence the focuser sees — PPO must raise the policy's advantage
    over the random-patch baseline.

These are the closest thing to the reference's validation-as-test loop
(SURVEY.md section 4) that runs without real datasets.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.ppo.core import PPOConfig
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import (
    create_train_state,
    make_stage2_step,
    make_stage_train_step,
)

CFG = GFVConfig(
    num_classes=4, num_frames=2, image_size=32, glance_size=16,
    patch_size=16, action_dim=4, hidden_dim=32, policy_hidden=32,
    dtype=jnp.float32,
)


def _quadrant_batch(key, b=16, noise=0.1):
    """Class c in {0..3} = which image quadrant holds a bright 8x8 blob.
    Visible in the downsampled glance, and croppable by the right patch."""
    kc, kn = jax.random.split(key)
    labels = jax.random.randint(kc, (b,), 0, 4)
    t, s = CFG.num_frames, CFG.image_size
    frames = noise * jax.random.normal(kn, (b, t, s, s, 3), jnp.float32)
    qy = (labels // 2) * 16 + 4
    qx = (labels % 2) * 16 + 4
    blob = jnp.ones((8, 8, 3), jnp.float32) * 2.0

    def put(frame_t, y, x):
        return jax.lax.dynamic_update_slice(frame_t, blob, (y, x, 0))

    frames = jax.vmap(
        lambda fr, y, x: jax.vmap(lambda f: put(f, y, x))(fr)
    )(frames, qy, qx)
    flat = pad_for_extraction(frames.reshape(b * t, s, s, 3))
    small = jax.image.resize(frames, (b, t, 16, 16, 3), "linear")
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": small,
        "labels": labels,
    }


@pytest.mark.slow
def test_stage1_learns_quadrant_classification():
    model = GFV(CFG)
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.05, fc_lr=0.05, epochs=1,
                       steps_per_epoch=60, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    step = jax.jit(make_stage_train_step(model, 0, tx))

    accs = []
    for i in range(60):
        batch = _quadrant_batch(jax.random.key(1000 + i))
        state, metrics = step(state, batch, jax.random.key(i))
        accs.append(float(metrics["top1"]))
    early = np.mean(accs[:10])
    late = np.mean(accs[-10:])
    assert late > 0.7, f"no learning: acc {early:.2f} -> {late:.2f}"
    assert late > early + 0.2


def _texture_batch(key, b=16, noise=0.1):
    """Class c in {0..3} = the TEXTURE of an 8x8 blob placed in a random
    quadrant: horizontal stripes / vertical stripes / checker / inverted
    checker, all period 2 and brightness-matched so the 2x-downsampled
    glance reveals only WHERE the blob is, never its class. Random 16^2
    patches hit the blob ~25% of the time; a trained policy always can —
    accuracy through the full pipeline is therefore policy-limited, the
    same structure as the real AdaFocus task."""
    kc, kq, kn = jax.random.split(key, 3)
    labels = jax.random.randint(kc, (b,), 0, 4)
    quad = jax.random.randint(kq, (b,), 0, 4)
    t, s = CFG.num_frames, CFG.image_size
    frames = noise * jax.random.normal(kn, (b, t, s, s, 3), jnp.float32)
    yy, xx = jnp.mgrid[0:8, 0:8]
    patterns = jnp.stack([
        (yy % 2), (xx % 2), ((yy + xx) % 2), ((yy + xx + 1) % 2)
    ]).astype(jnp.float32) * 2.0                     # (4, 8, 8)
    blob = patterns[..., None] * jnp.ones((1, 1, 1, 3))  # (4, 8, 8, 3)
    qy = (quad // 2) * 16 + 4
    qx = (quad % 2) * 16 + 4

    def put(frame_t, tex, y, x):
        return jax.lax.dynamic_update_slice(frame_t, tex, (y, x, 0))

    frames = jax.vmap(
        lambda fr, c, y, x: jax.vmap(lambda f: put(f, blob[c], y, x))(fr)
    )(frames, labels, qy, qx)
    flat = pad_for_extraction(frames.reshape(b * t, s, s, 3))
    small = jax.image.resize(frames, (b, t, 16, 16, 3), "linear")
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": small,
        "labels": labels,
    }


@pytest.mark.slow
def test_full_staged_recipe_composes():
    """The reference's whole training story end to end (main_dist.py
    stages): backbone+head pretrain with random patches -> PPO policy
    training -> classifier finetune under the frozen greedy policy ->
    deployment eval. On the texture task the glance can only localize, so
    improvement must flow through patch placement. Asserted: stage-1 eval
    beats chance; stage-2 PPO raises its reward (policy-patch confidence
    over the lookahead random baseline) to positive while entropy falls;
    stage-3 composes on top without regressing eval, ending above chance
    with margin. (A large greedy-eval accuracy LIFT from PPO is not
    asserted: with from-scratch backbones in a CPU test budget the
    classifier's patch sensitivity stays weak — measured rewards are
    ~0.01-0.05 in confidence units — so a +0.1 accuracy threshold is
    noise-dominated. The patches-beat-random mechanism itself is pinned by
    test_stage2_ppo_improves_over_random_baseline below.)"""
    from adafocus_tpu.ppo.core import ppo_init
    from adafocus_tpu.train.stages import make_eval_step

    model = GFV(CFG)
    eval_step = jax.jit(make_eval_step(model))

    def eval_acc(state, n=6):
        accs = []
        for i in range(n):
            batch = _texture_batch(jax.random.key(9000 + i))
            logits, _ = eval_step(state, batch, jax.random.key(i))
            pred = jnp.argmax(logits[:, -1], axis=-1)
            accs.append(float(jnp.mean(pred == batch["labels"])))
        return float(np.mean(accs))

    # stage 0/1: joint pretrain, random patches. lr 0.05/80 steps diverges
    # on this task (loss spikes >20); 0.01 with a longer cosine is stable.
    tx0 = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=300, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx0)
    warm = jax.jit(make_stage_train_step(model, 0, tx0))
    for i in range(300):
        batch = _texture_batch(jax.random.key(4000 + i))
        state, _ = warm(state, batch, jax.random.key(i))
    acc_stage1 = eval_acc(state)

    # stage 2: PPO (policy only)
    ppo_cfg = PPOConfig(lr=1e-3)
    state = state.replace(ppo=ppo_init(state.params["policy"], ppo_cfg))
    ppo_step = jax.jit(make_stage2_step(model, ppo_cfg))
    rewards, entropies = [], []
    for i in range(60):
        batch = _texture_batch(jax.random.key(5000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(700 + i))
        rewards.append(float(metrics["reward_mean"]))
        entropies.append(float(metrics["ppo/entropy"]))
    acc_stage2 = eval_acc(state)

    # stage 3: classifier finetune under the frozen greedy policy
    tx3 = make_stage_optimizer(
        3, OptimConfig(fc_lr=0.02, epochs=1, steps_per_epoch=30))
    state = state.replace(opt_state=tx3.init(state.params))
    tune = jax.jit(make_stage_train_step(model, 3, tx3))
    for i in range(30):
        batch = _texture_batch(jax.random.key(6000 + i))
        state, _ = tune(state, batch, jax.random.key(800 + i))
    acc_stage3 = eval_acc(state)

    assert acc_stage1 > 0.27, f"stage 1 never beat chance: {acc_stage1:.3f}"
    late_r, early_r = np.mean(rewards[-10:]), np.mean(rewards[:10])
    assert late_r > early_r, (
        f"PPO reward did not improve: {early_r:.4f} -> {late_r:.4f}")
    assert late_r > 0.0, f"policy no better than its baseline ({late_r:.4f})"
    assert np.mean(entropies[-10:]) < np.mean(entropies[:10]), (
        "policy entropy did not fall during stage 2")
    assert acc_stage3 >= acc_stage2 - 0.05, (
        f"stage 3 regressed: {acc_stage2:.3f} -> {acc_stage3:.3f}")
    assert acc_stage3 > 0.28, f"final accuracy at chance: {acc_stage3:.3f}"


PLUS_CFG = GFVConfig(
    num_classes=4, num_frames=6, image_size=32, glance_size=16,
    patch_size=16, action_dim=4, hidden_dim=32, policy_hidden=32,
    frame_budget=2, selector_hidden=16, plus_rl=True, dtype=jnp.float32,
)


def _sparse_frame_batch(key, b=16, noise=0.1):
    """Joint-RL toy task: of T=6 frames, only 2 (random per video) carry a
    textured blob (the _texture_batch patterns — class visible only to the
    focuser) at a random quadrant; the other frames are noise. The glance
    reveals WHICH frames have a blob and WHERE, never the class, so the
    confidence reward must flow through the temporal selector (pick blob
    frames) AND the spatial policy (pick the blob quadrant). Returns the
    batch plus the (B, T) informative-frame mask."""
    kc, kq, kf, kn = jax.random.split(key, 4)
    cfg = PLUS_CFG
    t, s = cfg.num_frames, cfg.image_size
    labels = jax.random.randint(kc, (b,), 0, 4)
    quad = jax.random.randint(kq, (b,), 0, 4)
    # 2 distinct informative frames per video
    frame_noise = jax.random.uniform(kf, (b, t))
    _, info_idx = jax.lax.top_k(frame_noise, 2)  # (B, 2)
    info_mask = jnp.zeros((b, t)).at[
        jnp.arange(b)[:, None], info_idx].set(1.0)
    frames = noise * jax.random.normal(kn, (b, t, s, s, 3), jnp.float32)
    yy, xx = jnp.mgrid[0:8, 0:8]
    patterns = jnp.stack([
        (yy % 2), (xx % 2), ((yy + xx) % 2), ((yy + xx + 1) % 2)
    ]).astype(jnp.float32) * 2.0
    blobs = patterns[..., None] * jnp.ones((1, 1, 1, 3))  # (4, 8, 8, 3)
    qy = (quad // 2) * 16 + 4
    qx = (quad % 2) * 16 + 4

    def put(frame, m, tex, y, x):
        patch = tex * m + jax.lax.dynamic_slice(
            frame, (y, x, 0), (8, 8, 3)) * (1 - m)
        return jax.lax.dynamic_update_slice(frame, patch, (y, x, 0))

    frames = jax.vmap(
        lambda fr, ms, c, y, x: jax.vmap(
            lambda f, m: put(f, m, blobs[c], y, x))(fr, ms)
    )(frames, info_mask, labels, qy, qx)
    flat = pad_for_extraction(frames.reshape(b * t, s, s, 3))
    small = jax.image.resize(frames, (b, t, 16, 16, 3), "linear")
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": small,
        "labels": labels,
    }, info_mask


@pytest.mark.slow
def test_plus_joint_rl_learns_frame_selection():
    """AdaFocus+ joint temporal+spatial PPO (cfg.plus_rl): on a task where
    only 2 of 6 frames carry class evidence (positions random per video),
    stage-2 joint training must (a) raise the joint reward over the
    random-frame/random-patch lookahead baseline, (b) reduce entropy, and
    (c) teach the greedy selector to pick informative frames at a rate
    clearly above the 1/3 chance level."""
    from adafocus_tpu.models.gfv_plus import SelectorActorCritic
    from adafocus_tpu.train.stages_plus import (
        make_plus_stage2_joint_step,
        make_plus_train_step,
    )

    model = GFV(PLUS_CFG)
    ppo_cfg = PPOConfig(lr=3e-3)
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.02, fc_lr=0.02, epochs=1,
                       steps_per_epoch=80, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=ppo_cfg)
    warm = jax.jit(make_plus_train_step(model, 1, tx))
    for i in range(80):
        batch, _ = _sparse_frame_batch(jax.random.key(2000 + i))
        state, _ = warm(state, batch, jax.random.key(i))

    selector = SelectorActorCritic(
        hidden_dim=PLUS_CFG.selector_hidden, in_dim=PLUS_CFG.glance_dim,
        dtype=PLUS_CFG.dtype)

    def selection_hit_rate(state, n=4):
        """Fraction of greedy-selected frames that are informative."""
        from adafocus_tpu.models.gfv import GFV as _GFV

        hits = []
        for i in range(n):
            batch, info = _sparse_frame_batch(jax.random.key(8000 + i))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            _, pooled = model.apply(
                variables, batch["frames_small"], False, method=_GFV.glance)
            roll = selector.apply(
                {"params": state.params["selector_ac"]}, pooled,
                PLUS_CFG.frame_budget, jax.random.key(i), "top",
                method=SelectorActorCritic.rollout)
            picked = np.asarray(roll["idx"])
            m = np.asarray(info)
            hits.append(np.mean(
                [m[b_, f] for b_ in range(m.shape[0]) for f in picked[b_]]))
        return float(np.mean(hits))

    hit_before = selection_hit_rate(state)

    step = jax.jit(make_plus_stage2_joint_step(model, ppo_cfg))
    rewards, entropies = [], []
    for i in range(60):
        batch, _ = _sparse_frame_batch(jax.random.key(3000 + i))
        state, metrics = step(state, batch, jax.random.key(500 + i))
        rewards.append(float(metrics["reward_mean"]))
        entropies.append(float(metrics["ppo/entropy"]))

    hit_after = selection_hit_rate(state)
    early, late = np.mean(rewards[:10]), np.mean(rewards[-10:])
    assert late > early, f"joint reward flat: {early:.4f} -> {late:.4f}"
    assert late > 0.0, f"joint policy no better than baseline ({late:.4f})"
    assert np.mean(entropies[-10:]) < np.mean(entropies[:10]), (
        "joint entropy did not fall")
    assert hit_after > max(0.45, hit_before), (
        f"selector did not learn informative frames: "
        f"{hit_before:.3f} -> {hit_after:.3f} (chance 0.333)")


@pytest.mark.slow
def test_stage2_ppo_improves_over_random_baseline():
    """Reward = policy-patch confidence - random-patch confidence. After a
    supervised warm-up, PPO training must push mean reward above zero (the
    policy finds more informative patches than random)."""
    model = GFV(CFG)
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.05, fc_lr=0.05, epochs=1,
                       steps_per_epoch=40))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=1e-3))
    warm = jax.jit(make_stage_train_step(model, 0, tx))
    for i in range(40):
        batch = _quadrant_batch(jax.random.key(2000 + i))
        state, _ = warm(state, batch, jax.random.key(i))

    ppo_step = jax.jit(make_stage2_step(model, PPOConfig(lr=1e-3)))
    rewards, entropies = [], []
    for i in range(40):
        batch = _quadrant_batch(jax.random.key(3000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(500 + i))
        rewards.append(float(metrics["reward_mean"]))
        entropies.append(float(metrics["ppo/entropy"]))
    early = np.mean(rewards[:8])
    late = np.mean(rewards[-8:])
    assert late > early, f"PPO did not improve: {early:.4f} -> {late:.4f}"
    assert late > 0.0, f"policy no better than random patches ({late:.4f})"
    # exploration must collapse onto the informative patches
    assert np.mean(entropies[-8:]) < np.mean(entropies[:8]), (
        f"policy entropy did not fall: {np.mean(entropies[:8]):.4f} -> "
        f"{np.mean(entropies[-8:]):.4f}")
