"""Learning dynamics the round-2 verdict flagged as unproven:

  * a stage-2 policy that must READ LOCATION FROM A SPATIALLY-RESOLVED
    feature map (>= 2x2): the round-2 toys used a global color tint
    because a 16^2 glance collapses MobileNetV2's output to a 1x1 map;
    here the glance is 64^2 -> a 2x2 map, the blob position is random per
    video, and there is NO tint — the only path from blob location to the
    policy is the spatial structure of the glance feature map (the real
    configs' 7x7-map regime, reference actnet/models/ppo.py:32-47).
  * the sth-sth family's flagship RL recipe — per-division CONTINUOUS
    Gaussian PPO (reference sthsth/stage2.py:214-286,
    models/ppo_continuous.py:142-196) — must actually learn: reward above
    zero, per-division means converging onto the informative corners, and
    eval accuracy beating the random-patch baseline.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.ppo.core import PPOConfig, ppo_init
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import (
    create_train_state,
    make_stage2_step,
    make_stage_train_step,
)

# ---------------------------------------------------------------------------
# Spatially-resolved policy state: glance 64^2 -> MobileNetV2 2x2 map.
# ---------------------------------------------------------------------------

SPATIAL_CFG = GFVConfig(
    num_classes=4, num_frames=2, image_size=128, glance_size=64,
    patch_size=48, action_dim=4, hidden_dim=32, policy_hidden=32,
    dtype=jnp.float32,
)


def _spatial_batch(key, b=16, noise=0.1):
    """Class = the TEXTURE of a 32^2 blob (period-2 patterns, invisible
    after the 2x glance downsample); the blob sits in a RANDOM corner,
    aligned so the K=4 action grid's matching patch (offsets {0, 80},
    patch 48) covers it fully and every other action misses it entirely.
    No tint: blob location reaches the policy only through the 2x2 glance
    feature map."""
    cfg = SPATIAL_CFG
    kc, kq, kn = jax.random.split(key, 3)
    labels = jax.random.randint(kc, (b,), 0, 4)
    quad = jax.random.randint(kq, (b,), 0, 4)
    t, s = cfg.num_frames, cfg.image_size
    frames = noise * jax.random.normal(kn, (b, t, s, s, 3), jnp.float32)
    yy, xx = jnp.mgrid[0:32, 0:32]
    patterns = jnp.stack([
        (yy % 2), (xx % 2), ((yy + xx) % 2), ((yy + xx + 1) % 2)
    ]).astype(jnp.float32) * 4.0                         # (4, 32, 32)
    blob = patterns[..., None] * jnp.ones((1, 1, 1, 3))  # (4, 32, 32, 3)
    # blob offset 8 inside its half: [8,40) or [88,120); patch offsets are
    # floor(a * (128-48)) in {0, 80} -> [0,48) or [80,128): full cover of
    # the matching corner, zero overlap otherwise
    qy = (quad // 2) * 80 + 8
    qx = (quad % 2) * 80 + 8

    def put(frame_t, tex, y, x):
        return jax.lax.dynamic_update_slice(frame_t, tex, (y, x, 0))

    frames = jax.vmap(
        lambda fr, c, y, x: jax.vmap(lambda f: put(f, blob[c], y, x))(fr)
    )(frames, labels, qy, qx)
    flat = pad_for_extraction(frames.reshape(b * t, s, s, 3))
    small = jax.image.resize(
        frames, (b, t, cfg.glance_size, cfg.glance_size, 3), "linear")
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": small,
        "labels": labels,
    }, quad


@pytest.mark.slow
def test_stage2_policy_reads_spatial_feature_map():
    """PPO must route the blob's location from the 2x2 glance map to the
    matching action — measured directly as the greedy policy's quadrant
    hit rate (chance 0.25), plus rising positive reward and falling
    entropy."""
    model = GFV(SPATIAL_CFG)
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=60, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=3e-3))
    warm = jax.jit(make_stage_train_step(model, 0, tx))
    for i in range(60):
        batch, _ = _spatial_batch(jax.random.key(2000 + i))
        state, _ = warm(state, batch, jax.random.key(i))

    def quadrant_hit_rate(state, n=4):
        """Greedy action == blob quadrant? The K=4 grid indexes (y-major)
        exactly as quad = 2*(y-half) + (x-half)."""
        hits = []
        for i in range(n):
            batch, quad = _spatial_batch(jax.random.key(8000 + i))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            fmap, _ = model.apply(
                variables, batch["frames_small"], False, method=GFV.glance)
            roll = model.apply(
                variables, fmap, jax.random.key(i), "greedy", False,
                method=GFV.policy_rollout)
            idx = np.asarray(roll["action_idx"])         # (B, T)
            hits.append(np.mean(idx == np.asarray(quad)[:, None]))
        return float(np.mean(hits))

    hit_before = quadrant_hit_rate(state)

    ppo_step = jax.jit(make_stage2_step(model, PPOConfig(lr=3e-3)))
    rewards, entropies = [], []
    for i in range(60):
        batch, _ = _spatial_batch(jax.random.key(3000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(500 + i))
        rewards.append(float(metrics["reward_mean"]))
        entropies.append(float(metrics["ppo/entropy"]))
    hit_after = quadrant_hit_rate(state)

    late = np.mean(rewards[-10:])
    assert late > 0.0, f"policy no better than random patches ({late:.4f})"
    assert np.mean(entropies[-10:]) < np.mean(entropies[:10]), (
        "policy entropy did not fall")
    assert hit_after > max(0.5, hit_before + 0.15), (
        f"policy did not learn to read the spatial map: hit rate "
        f"{hit_before:.3f} -> {hit_after:.3f} (chance 0.25)")


# ---------------------------------------------------------------------------
# sth-sth per-division continuous Gaussian PPO.
# ---------------------------------------------------------------------------

STH_CFG = GFVConfig(
    num_classes=4, num_frames=4, num_frames_focuser=4, image_size=32,
    glance_size=16, patch_size=16, action_dim=4, hidden_dim=32,
    policy_hidden=32, classifier="consensus", tsm=True, video_div=2,
    continuous_policy=True, action_std=0.15, dtype=jnp.float32,
)

# informative corner per division: div 0 -> (0, 0), div 1 -> (1, 1)
_DIV_TARGETS = np.array([[0.0, 0.0], [1.0, 1.0]])


def _divisional_batch(key, b=16, noise=0.1):
    """Each division's frames carry the class texture (period-2, blurred
    out of the 2x-downsampled glance) as a 16^2 blob at a division-specific
    corner: div 0 at (0, 0), div 1 at (16, 16). The continuous Gaussian
    policy must move each division's mean onto its corner."""
    cfg = STH_CFG
    kc, kn = jax.random.split(key)
    labels = jax.random.randint(kc, (b,), 0, 4)
    t, s = cfg.num_frames, cfg.image_size
    frames = noise * jax.random.normal(kn, (b, t, s, s, 3), jnp.float32)
    yy, xx = jnp.mgrid[0:16, 0:16]
    patterns = jnp.stack([
        (yy % 2), (xx % 2), ((yy + xx) % 2), ((yy + xx + 1) % 2)
    ]).astype(jnp.float32) * 4.0
    blob = patterns[..., None] * jnp.ones((1, 1, 1, 3))  # (4, 16, 16, 3)

    def put(frame_t, tex, y, x):
        return jax.lax.dynamic_update_slice(frame_t, tex, (y, x, 0))

    half = t // 2
    f0 = jax.vmap(lambda fr, c: jax.vmap(
        lambda f: put(f, blob[c], 0, 0))(fr))(frames[:, :half], labels)
    f1 = jax.vmap(lambda fr, c: jax.vmap(
        lambda f: put(f, blob[c], 16, 16))(fr))(frames[:, half:], labels)
    frames = jnp.concatenate([f0, f1], axis=1)
    flat = pad_for_extraction(frames.reshape(b * t, s, s, 3))
    small = jax.image.resize(frames, (b, t, 16, 16, 3), "linear")
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": small,
        "labels": labels,
    }


def _sthsth_eval_acc(model, state, actions_fn, n=5):
    """Eval accuracy of the sum-consensus forward under a given patch
    policy (actions_fn(batch, rng) -> (B, Tf, 2))."""
    from adafocus_tpu.models.gfv import GFV as _GFV, extract_for_frames
    from adafocus_tpu.models.gfv_sthsth import (
        local_frame_logits, sum_consensus,
    )

    cfg = model.cfg
    accs = []
    for i in range(n):
        batch = _divisional_batch(jax.random.key(9000 + i))
        rng = jax.random.key(100 + i)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        b = batch["frames_small"].shape[0]
        _, global_logits = model.apply(
            variables, batch["frames_small"], False,
            method=_GFV.glance_logits)
        actions = actions_fn(state, batch, rng)
        patches = extract_for_frames(
            batch["frames_flat"], actions, cfg.image_size, cfg.patch_size)
        local_logits = local_frame_logits(model, variables, patches, b)
        logits = sum_consensus(global_logits, local_logits,
                               cfg.with_glancer)
        pred = jnp.argmax(logits, axis=-1)
        accs.append(float(jnp.mean(pred == batch["labels"])))
    return float(np.mean(accs))


@pytest.mark.slow
def test_sthsth_continuous_divisional_ppo_learns():
    """The sth-sth flagship RL recipe (per-division continuous Gaussian
    PPO): reward must rise above zero, the greedy per-division means must
    converge onto the informative corners, and eval accuracy under the
    learned policy must beat the random-patch baseline."""
    from adafocus_tpu.models.gfv import GFV as _GFV
    from adafocus_tpu.models.gfv_sthsth import actions_per_frame
    from adafocus_tpu.ops.patch import random_patch_actions
    from adafocus_tpu.train.stages_sthsth import (
        make_sthsth_stage2_step,
        make_sthsth_train_step,
    )

    model = GFV(STH_CFG)
    cfg = STH_CFG
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=100, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=3e-3))
    warm = jax.jit(make_sthsth_train_step(model, 1, tx))
    for i in range(100):
        batch = _divisional_batch(jax.random.key(2000 + i))
        state, _ = warm(state, batch, jax.random.key(i))

    def greedy_div_actions(state, batch, rng):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        fmap, _ = model.apply(
            variables, batch["frames_small"], False, method=_GFV.glance)
        roll = model.apply(
            variables, fmap, rng, "greedy", False,
            method=_GFV.policy_rollout_div)
        return actions_per_frame(roll["actions"], cfg.t_focuser)

    def greedy_means(state, n=4):
        """Mean greedy action per division over fresh batches: (D, 2)."""
        outs = []
        for i in range(n):
            batch = _divisional_batch(jax.random.key(8000 + i))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            fmap, _ = model.apply(
                variables, batch["frames_small"], False, method=_GFV.glance)
            roll = model.apply(
                variables, fmap, jax.random.key(i), "greedy", False,
                method=_GFV.policy_rollout_div)
            outs.append(np.asarray(roll["actions"]))     # (B, D, 2)
        return np.concatenate(outs).mean(axis=0)         # (D, 2)

    dist_before = np.abs(greedy_means(state) - _DIV_TARGETS).mean()

    ppo_step = jax.jit(make_sthsth_stage2_step(model, PPOConfig(lr=3e-3)))
    rewards = []
    for i in range(80):
        batch = _divisional_batch(jax.random.key(3000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(500 + i))
        rewards.append(float(metrics["reward_mean"]))

    means = greedy_means(state)
    dist_after = np.abs(means - _DIV_TARGETS).mean()
    late = np.mean(rewards[-15:])
    assert late > 0.0, (
        f"continuous policy no better than random patches ({late:.4f})")
    assert dist_after < min(0.25, dist_before), (
        f"per-division means did not converge onto the informative "
        f"corners: mean|a - target| {dist_before:.3f} -> {dist_after:.3f} "
        f"(means {means.tolist()})")

    acc_learned = _sthsth_eval_acc(model, state, greedy_div_actions)
    acc_random = _sthsth_eval_acc(
        model, state,
        lambda st, batch, rng: actions_per_frame(
            random_patch_actions(rng, (batch["frames_small"].shape[0],
                                       cfg.video_div)), cfg.t_focuser))
    assert acc_learned > acc_random + 0.05, (
        f"learned policy does not beat random patches: "
        f"{acc_learned:.3f} vs {acc_random:.3f}")
