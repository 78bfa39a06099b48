"""Trajectory diagnostics for the learning-dynamics miniatures
(tests/test_learning_spatial.py): run the same tasks with periodic greedy
probes printed every N steps, and expose the recipe knobs (action_std,
policy_bn, lr, batch, warm steps) so threshold choices in the tests are
grounded in observed trajectories instead of endpoint luck.

Usage:
  python benchmarks/diag_learning_tests.py discrete [--steps 200] [--lr 3e-3]
  python benchmarks/diag_learning_tests.py continuous [--std 0.25] [--bn]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def cache_on():
    import jax

    # sitecustomize pins jax_platforms at interpreter start (see
    # tests/conftest.py) — an env var alone cannot force CPU here
    jax.config.update("jax_platforms", "cpu")
    from adafocus_tpu.utils.hostcache import cpu_test_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_test_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def run_discrete(args):
    import jax

    from adafocus_tpu.models.gfv import GFV
    from adafocus_tpu.ppo.core import PPOConfig
    from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
    from adafocus_tpu.train.stages import (
        create_train_state, make_stage2_step, make_stage_train_step,
    )
    import test_learning_spatial as tls

    cfg = dataclasses.replace(tls.SPATIAL_CFG, policy_bn=args.bn)
    model = GFV(cfg)
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=args.warm, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=args.lr))
    warm = jax.jit(make_stage_train_step(model, 0, tx))
    for i in range(args.warm):
        batch, _ = tls._spatial_batch(jax.random.key(2000 + i), b=args.b)
        state, m = warm(state, batch, jax.random.key(i))
    print(f"warm done ({args.warm} steps) top1={float(m['top1']):.3f}",
          flush=True)

    def hit_rate(state, n=4):
        hits = []
        for i in range(n):
            batch, quad = tls._spatial_batch(jax.random.key(8000 + i))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            fmap, _ = model.apply(
                variables, batch["frames_small"], False, method=GFV.glance)
            roll = model.apply(
                variables, fmap, jax.random.key(i), "greedy", False,
                method=GFV.policy_rollout)
            idx = np.asarray(roll["action_idx"])
            hits.append(np.mean(idx == np.asarray(quad)[:, None]))
        return float(np.mean(hits))

    print(f"hit@0 {hit_rate(state):.3f}", flush=True)
    ppo_step = jax.jit(make_stage2_step(model, PPOConfig(lr=args.lr)))
    rewards, entropies = [], []
    for i in range(args.steps):
        batch, _ = tls._spatial_batch(jax.random.key(3000 + i), b=args.b)
        state, metrics = ppo_step(state, batch, jax.random.key(500 + i))
        rewards.append(float(metrics["reward_mean"]))
        entropies.append(float(metrics["ppo/entropy"]))
        if (i + 1) % args.every == 0:
            print(f"step {i+1:4d} hit {hit_rate(state):.3f} "
                  f"reward {np.mean(rewards[-args.every:]):+.4f} "
                  f"entropy {np.mean(entropies[-args.every:]):.3f}",
                  flush=True)


def run_continuous(args):
    import jax

    from adafocus_tpu.models.gfv import GFV
    from adafocus_tpu.ppo.core import PPOConfig
    from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
    from adafocus_tpu.train.stages import create_train_state
    from adafocus_tpu.train.stages_sthsth import (
        make_sthsth_stage2_step, make_sthsth_train_step,
    )
    import test_learning_spatial as tls

    cfg = dataclasses.replace(tls.STH_CFG, action_std=args.std,
                              policy_bn=args.bn,
                              policy_channels=args.channels)
    model = GFV(cfg)
    tx = make_stage_optimizer(
        1, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=args.warm, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=args.lr))
    warm = jax.jit(make_sthsth_train_step(model, 1, tx))
    for i in range(args.warm):
        batch = tls._divisional_batch(jax.random.key(2000 + i), b=args.b, noise=args.noise)
        state, m = warm(state, batch, jax.random.key(i))
    print(f"warm done ({args.warm} steps) top1={float(m['top1']):.3f}",
          flush=True)

    def means(state, n=4):
        outs = []
        for i in range(n):
            batch = tls._divisional_batch(jax.random.key(8000 + i), noise=args.noise)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            fmap, _ = model.apply(
                variables, batch["frames_small"], False, method=GFV.glance)
            roll = model.apply(
                variables, fmap, jax.random.key(i), "greedy", False,
                method=GFV.policy_rollout_div)
            outs.append(np.asarray(roll["actions"]))
        return np.concatenate(outs).mean(axis=0)

    m0 = means(state)
    print(f"dist@0 {np.abs(m0 - tls._DIV_TARGETS).mean():.3f} "
          f"means {np.round(m0, 2).tolist()}", flush=True)
    ppo_step = jax.jit(make_sthsth_stage2_step(model, PPOConfig(lr=args.lr)))
    rewards = []
    for i in range(args.steps):
        batch = tls._divisional_batch(jax.random.key(3000 + i), b=args.b, noise=args.noise)
        state, metrics = ppo_step(state, batch, jax.random.key(500 + i))
        rewards.append(float(metrics["reward_mean"]))
        if (i + 1) % args.every == 0:
            mm = means(state)
            print(f"step {i+1:4d} dist "
                  f"{np.abs(mm - tls._DIV_TARGETS).mean():.3f} "
                  f"reward {np.mean(rewards[-args.every:]):+.4f} "
                  f"means {np.round(mm, 2).tolist()}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["discrete", "continuous"])
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--warm", type=int, default=None)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--std", type=float, default=0.15)
    ap.add_argument("--bn", action="store_true")
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--noise", type=float, default=0.1)
    args = ap.parse_args()
    if args.warm is None:
        args.warm = 60 if args.which == "discrete" else 100
    cache_on()
    (run_discrete if args.which == "discrete" else run_continuous)(args)


if __name__ == "__main__":
    main()
