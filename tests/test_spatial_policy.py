"""Spatially-resolved policy learning — the two learning-dynamics gaps the
round-2 verdict called out:

  * the actnet discrete policy must learn to READ LOCATION from a glance
    feature map with real spatial extent (>= 2x2), with no global-tint
    side channel (the reference's real configs glance at 224^2 -> 7x7
    maps; /root/reference actnet/models/ppo.py:32-47 is a spatial conv
    encoder). The earlier toys glance at 16^2, which MobileNetV2's 32x
    downsampling collapses to a 1x1 map.
  * the sth-sth flagship RL recipe — per-division CONTINUOUS Gaussian PPO
    (reference sthsth/stage2.py:214-286, models/ppo_continuous.py:142-196)
    — must LEARN, not merely run: reward above zero, the per-division
    Gaussian means converging onto the informative corners, and greedy
    eval beating the random-patch baseline.

Task design shared by both: 128^2 frames, glance at 64^2 (a 2x2 MobileNet
map), one 32^2 period-2 texture blob per frame (texture = class,
brightness-matched across classes) at one of the four patch-grid corners.
The 2x downsample into the glance antialiases period-2 textures to a flat
gray, so the glance reveals only WHERE the blob is — class evidence reaches
the classifier exclusively through a well-placed 32^2 crop, and location
reaches the policy exclusively through the spatial layout of the glance
map (no tint, no channel side channel).
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

S, G, P = 128, 64, 32           # image, glance, patch
CORNER = S - P                  # blob/patch corner offset (96)

# period-2, brightness-matched textures: class is invisible after the 2x
# glance downsample; location (mean brightness) survives it.
_yy, _xx = np.mgrid[0:P, 0:P]
_PATTERNS = jnp.asarray(
    np.stack([(_yy % 2), (_xx % 2), ((_yy + _xx) % 2), ((_yy + _xx + 1) % 2)]),
    jnp.float32) * 4.0          # (4, P, P)


def _corner_blob_frames(key, b, t, labels, quad):
    """Noise frames + a class-texture blob at quadrant ``quad``.

    labels: (B,) int texture class. quad: (B, T) int in {0..3} — the blob
    corner per frame (tests choose whether it varies per video or per
    division)."""
    frames = 0.1 * jax.random.normal(key, (b, t, S, S, 3), jnp.float32)
    blob = _PATTERNS[..., None] * jnp.ones((1, 1, 1, 3))  # (4, P, P, 3)
    qy = (quad // 2) * CORNER
    qx = (quad % 2) * CORNER

    def put(frame, c, y, x):
        return jax.lax.dynamic_update_slice(frame, blob[c], (y, x, 0))

    frames = jax.vmap(
        jax.vmap(put, in_axes=(0, None, 0, 0))
    )(frames, labels, qy, qx)
    flat = pad_for_extraction(frames.reshape(b * t, S, S, 3))
    small = jax.image.resize(frames, (b, t, G, G, 3), "linear")
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": small,
    }


# ---------------------------------------------------------------------------
# actnet: discrete policy over a 2x2 grid, spatial glance map
# ---------------------------------------------------------------------------

ACT_CFG = GFVConfig(
    num_classes=4, num_frames=2, image_size=S, glance_size=G,
    patch_size=P, action_dim=4, hidden_dim=32, policy_hidden=32,
    dtype=jnp.float32,
)


def _actnet_batch(key, b=16):
    kc, kq, kn = jax.random.split(key, 3)
    labels = jax.random.randint(kc, (b,), 0, 4)
    quad = jnp.broadcast_to(
        jax.random.randint(kq, (b, 1), 0, 4), (b, ACT_CFG.num_frames))
    batch = _corner_blob_frames(kn, b, ACT_CFG.num_frames, labels, quad)
    batch["labels"] = labels
    return batch, quad


def _greedy_hit_rate(model, state, batches):
    """Fraction of greedy actions landing on the blob's corner. The 2x2
    action grid's coords are exactly {0,1}^2, so hit = exact match."""
    hits = []
    for batch, quad in batches:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fmap, _ = model.apply(
            variables, batch["frames_small"], False, method=GFV.glance)
        roll = model.apply(
            variables, fmap, jax.random.key(0), "greedy", False,
            method=GFV.policy_rollout)
        a = np.asarray(roll["actions"])          # (B, T, 2) in {0,1}
        picked = np.rint(a[..., 0]) * 2 + np.rint(a[..., 1])
        hits.append(np.mean(picked == np.asarray(quad)))
    return float(np.mean(hits))


@pytest.mark.slow
def test_stage2_policy_reads_spatial_glance_map():
    """No tint, no channel side channel: after stage-2 PPO the greedy
    policy must aim at the blob corner far above the 25% chance level —
    location can only have come through the 2x2 glance feature map."""
    model = GFV(ACT_CFG)
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=150, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=3e-3))
    warm = jax.jit(make_stage_train_step(model, 0, tx))
    for i in range(150):
        batch, _ = _actnet_batch(jax.random.key(4000 + i))
        state, _ = warm(state, batch, jax.random.key(i))

    probe = [_actnet_batch(jax.random.key(8000 + i)) for i in range(4)]
    hit_before = _greedy_hit_rate(model, state, probe)

    ppo_step = jax.jit(make_stage2_step(model, PPOConfig(lr=3e-3)))
    rewards, entropies = [], []
    for i in range(120):
        batch, _ = _actnet_batch(jax.random.key(5000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(700 + i))
        rewards.append(float(metrics["reward_mean"]))
        entropies.append(float(metrics["ppo/entropy"]))

    hit_after = _greedy_hit_rate(model, state, probe)
    assert hit_after > max(0.7, hit_before), (
        f"policy did not learn to read the spatial glance map: corner "
        f"hit rate {hit_before:.3f} -> {hit_after:.3f} (chance 0.25)")
    assert np.mean(rewards[-20:]) > 0.0, (
        f"policy no better than the random baseline "
        f"({np.mean(rewards[-20:]):.4f})")
    assert np.mean(entropies[-10:]) < np.mean(entropies[:10]), (
        "policy entropy did not fall")


# ---------------------------------------------------------------------------
# sth-sth: per-division continuous Gaussian PPO
# ---------------------------------------------------------------------------

STH_CFG = GFVConfig(
    num_classes=4, num_frames=4, num_frames_focuser=4, image_size=S,
    glance_size=G, patch_size=P, action_dim=4, hidden_dim=32,
    policy_hidden=32, classifier="consensus", tsm=True, video_div=2,
    continuous_policy=True, action_std=0.15, with_glancer=False,
    dropout=0.0, dtype=jnp.float32,
)


def _sthsth_batch(key, b=8):
    """Blob corner fixed per (video, division): the per-division Gaussian
    means must converge onto different corners within one video."""
    cfg = STH_CFG
    kc, kq, kn = jax.random.split(key, 3)
    labels = jax.random.randint(kc, (b,), 0, 4)
    quad_div = jax.random.randint(kq, (b, cfg.video_div), 0, 4)  # (B, D)
    f = cfg.t_focuser // cfg.video_div
    quad = jnp.repeat(quad_div, f, axis=1)                       # (B, Tf)
    batch = _corner_blob_frames(kn, b, cfg.t_focuser, labels, quad)
    # glancer frames: same rate here (Tg == Tf) — the divisional stacking
    # in policy_rollout_div is what's under test, not dual-rate sampling
    batch["labels"] = labels
    return batch, quad_div


def _continuous_hit_rate(model, state, batches):
    """Greedy (mean) action per division; hit = patch window covering at
    least half the blob on both axes (|offset - blob_offset| <= P/2)."""
    cfg = model.cfg
    hits = []
    for batch, quad_div in batches:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fmap, _ = model.apply(
            variables, batch["frames_small"], False, method=GFV.glance)
        roll = model.apply(
            variables, fmap, jax.random.key(0), "greedy", False,
            method=GFV.policy_rollout_div)
        off = np.floor(np.asarray(roll["actions"]) * (S - P))    # (B, D, 2)
        q = np.asarray(quad_div)
        want = np.stack([(q // 2) * CORNER, (q % 2) * CORNER], -1)
        hits.append(np.mean(np.all(np.abs(off - want) <= P / 2, axis=-1)))
    return float(np.mean(hits))


@pytest.mark.slow
def test_sthsth_continuous_divisional_ppo_learns():
    """The sth-sth flagship recipe's learning dynamics: per-division
    continuous Gaussian PPO must (a) push reward (policy-patch confidence
    over the random-patch baseline) above zero, (b) land its greedy means
    on the per-division informative corners far above chance, and (c)
    beat random patches on greedy eval accuracy."""
    from adafocus_tpu.models.gfv_sthsth import (
        forward_random_sthsth,
        inference_sthsth,
    )
    from adafocus_tpu.train.stages_sthsth import (
        make_sthsth_stage2_step,
        make_sthsth_train_step,
    )

    model = GFV(STH_CFG)
    tx = make_stage_optimizer(
        1, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=200, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=3e-3))
    warm = jax.jit(make_sthsth_train_step(model, 1, tx))
    for i in range(200):
        batch, _ = _sthsth_batch(jax.random.key(4000 + i))
        state, _ = warm(state, batch, jax.random.key(i))

    probe = [_sthsth_batch(jax.random.key(8000 + i)) for i in range(4)]
    hit_before = _continuous_hit_rate(model, state, probe)

    ppo_step = jax.jit(make_sthsth_stage2_step(model, PPOConfig(lr=3e-3)))
    rewards = []
    for i in range(150):
        batch, _ = _sthsth_batch(jax.random.key(5000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(700 + i))
        rewards.append(float(metrics["reward_mean"]))

    hit_after = _continuous_hit_rate(model, state, probe)
    assert hit_after > max(0.5, hit_before), (
        f"Gaussian means did not converge onto the informative corners: "
        f"hit rate {hit_before:.3f} -> {hit_after:.3f}")
    assert np.mean(rewards[-25:]) > 0.0, (
        f"divisional policy no better than random patches "
        f"({np.mean(rewards[-25:]):.4f})")

    # greedy eval must beat the random-patch forward on the same batches
    def acc(greedy: bool) -> float:
        accs = []
        for i, (batch, _) in enumerate(probe):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            if greedy:
                total = inference_sthsth(
                    model, variables, batch["frames_flat"],
                    batch["frames_small"], jax.random.key(i))
            else:
                total = forward_random_sthsth(
                    model, variables, batch["frames_flat"],
                    batch["frames_small"], jax.random.key(100 + i),
                    train=False)
            pred = jnp.argmax(total, axis=-1)
            accs.append(float(jnp.mean(pred == batch["labels"])))
        return float(np.mean(accs))

    acc_learned, acc_random = acc(True), acc(False)
    assert acc_learned > acc_random, (
        f"greedy policy eval did not beat random patches: "
        f"{acc_learned:.3f} vs {acc_random:.3f}")
