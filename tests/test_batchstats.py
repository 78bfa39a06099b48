"""BN running statistics must actually UPDATE for trainable components.

Regression tests for the stale-full-tree clobbering bug: a flax mutable
apply returns the FULL batch_stats collection (untouched components
included), so merging the returned trees of independent applies lets a
later apply's stale copy silently revert an earlier component's update.
Stage-0 previously lost every glancer stat update; sth-sth stage 1 and
AdaFocus+ stages lost the focuser's. Caught by the real-JPEG CLI learning
test (eval ran with init-valued running stats and collapsed to constant
predictions).
"""

import jax
import jax.numpy as jnp
import pytest

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import create_train_state, make_stage_train_step

BASE = dict(num_classes=3, num_frames=2, image_size=24, glance_size=16,
            patch_size=16, action_dim=4, hidden_dim=8, policy_hidden=8,
            dtype=jnp.float32)


def _batch(cfg, b=2):
    t = cfg.t_focuser
    frames = jax.random.normal(
        jax.random.key(1), (b * t, cfg.image_size, cfg.image_size, 3)) + 1.0
    flat = pad_for_extraction(frames).reshape(b, t, cfg.image_size, -1)
    return {
        "frames_flat": flat,
        "frames_small": jax.random.normal(
            jax.random.key(2),
            (b, cfg.num_frames, cfg.glance_size, cfg.glance_size, 3)) + 1.0,
        "labels": jnp.zeros((b,), jnp.int32),
    }


def _delta(a, b):
    return max(float(jnp.abs(x - y).max())
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_stage0_updates_both_backbones_stats():
    cfg = GFVConfig(**BASE)
    model = GFV(cfg)
    tx = make_stage_optimizer(0, OptimConfig(epochs=1, steps_per_epoch=4))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    new, _ = jax.jit(make_stage_train_step(model, 0, tx))(
        state, _batch(cfg), jax.random.key(3))
    assert _delta(state.batch_stats["glancer"],
                  new.batch_stats["glancer"]) > 0
    assert _delta(state.batch_stats["focuser"],
                  new.batch_stats["focuser"]) > 0


def test_stage1_updates_focuser_stats_only():
    cfg = GFVConfig(**BASE)
    model = GFV(cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=4))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    new, _ = jax.jit(make_stage_train_step(model, 1, tx))(
        state, _batch(cfg), jax.random.key(3))
    assert _delta(state.batch_stats["glancer"],
                  new.batch_stats["glancer"]) == 0  # frozen
    assert _delta(state.batch_stats["focuser"],
                  new.batch_stats["focuser"]) > 0


def test_sthsth_stage1_updates_focuser_stats():
    from adafocus_tpu.train.stages_sthsth import make_sthsth_train_step

    cfg = GFVConfig(**{**BASE, "classifier": "consensus", "tsm": True,
                       "video_div": 2, "num_frames_focuser": 4})
    model = GFV(cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=4))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    new, _ = jax.jit(make_sthsth_train_step(model, 1, tx))(
        state, _batch(cfg), jax.random.key(3))
    assert _delta(state.batch_stats["focuser"],
                  new.batch_stats["focuser"]) > 0
    # and no stray collection key leaked into the stats tree
    assert set(new.batch_stats.keys()) == set(state.batch_stats.keys())


def test_plus_stage1_updates_focuser_stats():
    from adafocus_tpu.train.stages_plus import make_plus_train_step

    cfg = GFVConfig(**{**BASE, "num_frames": 4, "frame_budget": 2,
                       "selector_hidden": 8})
    model = GFV(cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=4))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    new, _ = jax.jit(make_plus_train_step(model, 1, tx))(
        state, _batch(cfg), jax.random.key(3))
    assert _delta(state.batch_stats["focuser"],
                  new.batch_stats["focuser"]) > 0
    assert _delta(state.batch_stats["glancer"],
                  new.batch_stats["glancer"]) == 0  # frozen in stage 1
