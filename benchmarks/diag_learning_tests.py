"""Diagnose the 4 red learning-dynamics miniatures (round-5): run the
test_spatial_policy tasks with periodic greedy probes so we can see the
whole trajectory (the tests only measured the endpoint), and sweep the
knobs the round-5 PPO fixes touched (action_std, policy_bn, lr).

Usage:
  python benchmarks/diag_learning_tests.py discrete [--steps 200] [--lr 3e-3]
  python benchmarks/diag_learning_tests.py continuous [--std 0.25] [--bn]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

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
    import jax.numpy as jnp

    from adafocus_tpu.models.gfv import GFV
    from adafocus_tpu.ppo.core import PPOConfig
    from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
    from adafocus_tpu.train.stages import (
        create_train_state, make_stage2_step, make_stage_train_step,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import test_spatial_policy as tsp

    import dataclasses
    cfg = dataclasses.replace(tsp.ACT_CFG, policy_bn=args.bn)
    model = GFV(cfg)
    tx = make_stage_optimizer(
        0, OptimConfig(backbone_lr=0.01, fc_lr=0.01, epochs=1,
                       steps_per_epoch=args.warm, lr_type="cos"))
    state = create_train_state(model, jax.random.key(0), tx=tx,
                               ppo_cfg=PPOConfig(lr=args.lr))
    warm = jax.jit(make_stage_train_step(model, 0, tx))
    for i in range(args.warm):
        batch, _ = tsp._actnet_batch(jax.random.key(4000 + i))
        state, m = warm(state, batch, jax.random.key(i))
    print(f"warm done ({args.warm} steps) acc={float(m['accuracy']):.3f}",
          flush=True)

    probe = [tsp._actnet_batch(jax.random.key(8000 + i)) for i in range(4)]
    print(f"hit@0 {tsp._greedy_hit_rate(model, state, probe):.3f}", flush=True)

    ppo_step = jax.jit(make_stage2_step(model, PPOConfig(lr=args.lr)))
    rewards, entropies = [], []
    for i in range(args.steps):
        batch, _ = tsp._actnet_batch(jax.random.key(5000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(700 + i))
        rewards.append(float(metrics["reward_mean"]))
        entropies.append(float(metrics["ppo/entropy"]))
        if (i + 1) % args.every == 0:
            hit = tsp._greedy_hit_rate(model, state, probe)
            print(f"step {i+1:4d} hit {hit:.3f} "
                  f"reward {np.mean(rewards[-args.every:]):+.4f} "
                  f"entropy {np.mean(entropies[-args.every:]):.3f}",
                  flush=True)


def run_continuous(args):
    import jax
    import jax.numpy as jnp

    from adafocus_tpu.models.gfv import GFV
    from adafocus_tpu.ppo.core import PPOConfig
    from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
    from adafocus_tpu.train.stages import create_train_state
    from adafocus_tpu.train.stages_sthsth import (
        make_sthsth_stage2_step, make_sthsth_train_step,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import test_spatial_policy as tsp

    import dataclasses
    cfg = dataclasses.replace(tsp.STH_CFG, action_std=args.std,
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
        batch, _ = tsp._sthsth_batch(jax.random.key(4000 + i))
        state, m = warm(state, batch, jax.random.key(i))
    print(f"warm done ({args.warm} steps) acc={float(m['accuracy']):.3f}",
          flush=True)

    probe = [tsp._sthsth_batch(jax.random.key(8000 + i)) for i in range(4)]
    print(f"hit@0 {tsp._continuous_hit_rate(model, state, probe):.3f}",
          flush=True)

    ppo_step = jax.jit(make_sthsth_stage2_step(model, PPOConfig(lr=args.lr)))
    rewards = []
    for i in range(args.steps):
        batch, _ = tsp._sthsth_batch(jax.random.key(5000 + i))
        state, metrics = ppo_step(state, batch, jax.random.key(700 + i))
        rewards.append(float(metrics["reward_mean"]))
        if (i + 1) % args.every == 0:
            hit = tsp._continuous_hit_rate(model, state, probe)
            print(f"step {i+1:4d} hit {hit:.3f} "
                  f"reward {np.mean(rewards[-args.every:]):+.4f}",
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["discrete", "continuous"])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--warm", type=int, default=None)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--std", type=float, default=0.15)
    ap.add_argument("--bn", action="store_true")
    ap.add_argument("--channels", type=int, default=32)
    args = ap.parse_args()
    if args.warm is None:
        args.warm = 150 if args.which == "discrete" else 200
    cache_on()
    (run_discrete if args.which == "discrete" else run_continuous)(args)


if __name__ == "__main__":
    main()
