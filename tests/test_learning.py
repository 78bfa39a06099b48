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
    rewards = []
    for i in range(40):
        batch = _quadrant_batch(jax.random.key(3000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(500 + i))
        rewards.append(float(metrics["reward_mean"]))
    early = np.mean(rewards[:8])
    late = np.mean(rewards[-8:])
    assert late > early - 0.02, f"PPO degraded: {early:.4f} -> {late:.4f}"
    assert late > 0.0, f"policy no better than random patches ({late:.4f})"
