"""Sth-Sth per-stage train/eval steps — each stage ONE jitted program.

Stage semantics mirror the reference trainers (/root/reference
sthsth/stage1.py, stage2.py, stage3.py, evaluate.py):

  stage 1  joint training, random patches: glancer frozen, focuser + local
           head train on the summed consensus CE (stage1.py:318-354).
  stage 2  PPO per-division policy training, everything else frozen;
           reward = confidence - random-baseline confidence per division
           (stage2.py:214-286). The reference runs this single-process
           (conf/stage2.yaml multiprocessing_distributed:false); here it
           data-parallelizes like every other stage.
  stage 3  classifier + focuser finetune under the frozen greedy policy
           (stage3.py; the reference asserts video_div==1 at :347-349 —
           this implementation supports any division count).

Batches: frames_flat (B, Tf, S, L) lane-padded focuser frames,
frames_small (B, Tg, g, g, 3) glancer frames, labels (B,).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from adafocus_tpu.models.gfv import GFV, extract_for_frames
from adafocus_tpu.models.gfv_sthsth import (
    actions_per_frame,
    divisional_confidences,
    forward_random_sthsth,
    inference_sthsth,
    local_frame_logits,
    sum_consensus,
)
from adafocus_tpu.ops.metrics import topk_accuracy
from adafocus_tpu.ops.patch import random_patch_actions
from adafocus_tpu.ppo.core import (
    PPOConfig,
    compute_rewards,
    discounted_returns,
    make_policy,
    ppo_update,
)
from adafocus_tpu.train.stages import TrainState, _rollout_time_major


def _ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(
        jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)
    )


def make_sthsth_train_step(
    model: GFV,
    stage: int,
    tx: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Callable:
    """Supervised sth-sth stages 1 and 3 (stage 3 differs only in where
    patch actions come from: frozen greedy policy instead of random)."""
    cfg = model.cfg
    if stage not in (1, 3):
        raise ValueError("use make_sthsth_stage2_step for PPO training")

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params, "batch_stats": state.batch_stats}
        b, tf = batch["frames_flat"].shape[:2]
        a_key, d_key = jax.random.split(rng)
        rngs = {"dropout": d_key}

        if stage == 1:
            total, upd = forward_random_sthsth(
                model, variables, batch["frames_flat"], batch["frames_small"],
                a_key, train=True, impl=impl, mutable=["batch_stats"],
                rngs=rngs,
            )
        else:
            # frozen glancer + greedy frozen policy choose the crops
            _, global_logits = model.apply(
                variables, batch["frames_small"], False,
                method=GFV.glance_logits,
            )
            global_logits = jax.lax.stop_gradient(global_logits)
            fmap, _ = model.apply(
                variables, batch["frames_small"], False, method=GFV.glance
            )
            roll = model.apply(
                variables, jax.lax.stop_gradient(fmap), a_key, "greedy", False,
                method=GFV.policy_rollout_div,
            )
            actions = jax.lax.stop_gradient(
                actions_per_frame(roll["actions"], tf)
            )
            patches = extract_for_frames(
                batch["frames_flat"], actions, cfg.image_size, cfg.patch_size,
                impl=impl,
            )
            feats, upd = model.apply(
                variables, patches, True, method=GFV.focus,
                mutable=["batch_stats"], rngs=rngs,
            )
            upd = dict(upd.get("batch_stats", {}))
            feats = feats.reshape(b, tf, -1)
            local_logits = model.apply(
                variables, feats, True, method=GFV.classify_frame_logits,
                rngs=rngs,
            )
            total = sum_consensus(global_logits, local_logits, cfg.with_glancer)

        loss = _ce(total, batch["labels"])
        if stage == 1:  # forward_random_sthsth returns {collection: tree}
            upd = dict(upd).get("batch_stats", {})
        new_stats = dict(state.batch_stats)
        new_stats.update(dict(upd))
        return loss, (new_stats, total)

    def step(state: TrainState, batch, rng):
        (loss, (new_stats, total)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        top1, top5 = topk_accuracy(total.astype(jnp.float32), batch["labels"])
        metrics = {"loss": loss, "top1": top1, "top5": top5}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


def make_sthsth_stage2_step(
    model: GFV,
    ppo_cfg: PPOConfig,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Callable:
    """Per-division PPO training (reference stage2.py:214-286). One jit
    program: glance -> behavior rollout over D divisions -> ONE batched
    focuser call each for policy and baseline patches -> incremental
    divisional confidences -> PPO update."""
    cfg = model.cfg
    policy = make_policy(cfg)
    d = cfg.video_div

    def step(state: TrainState, batch, rng):
        b, tf = batch["frames_flat"].shape[:2]
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        roll_key, base_key = jax.random.split(rng)

        # phase 1: frozen TSM glance (maps + logits)
        fmap, global_logits = model.apply(
            variables, batch["frames_small"], False, method=GFV.glance_logits
        )
        # division-stacked policy inputs, time-major (D, B, gh, gw, C')
        tg = fmap.shape[1]
        gh, gw, c = fmap.shape[2:]
        stacked = jnp.moveaxis(
            fmap.reshape(b, d, tg // d, gh, gw, c), 2, 4
        ).reshape(b, d, gh, gw, (tg // d) * c)
        fmaps_tb = jnp.swapaxes(stacked, 0, 1)

        # phase 2: behavior rollout (old params)
        old_vars = {"params": state.ppo.params_old}
        if "policy" in (state.batch_stats or {}):
            old_vars["batch_stats"] = state.batch_stats["policy"]
        roll = _rollout_time_major(policy, old_vars, fmaps_tb, roll_key, cfg)

        # phase 3: one batched focus for policy patches + one for baseline
        actions = actions_per_frame(jnp.swapaxes(roll["coords"], 0, 1), tf)
        patches = extract_for_frames(
            batch["frames_flat"], actions, cfg.image_size, cfg.patch_size,
            impl=impl,
        )
        local_logits = local_frame_logits(model, variables, patches, b)

        if ppo_cfg.reward_mode == "random":
            base_actions = actions_per_frame(
                random_patch_actions(base_key, (b, d)), tf
            )
            base_patches = extract_for_frames(
                batch["frames_flat"], base_actions, cfg.image_size,
                cfg.patch_size, impl=impl,
            )
            random_logits = local_frame_logits(model, variables, base_patches, b)
        else:
            # 'conf' / 'prev' need no random baseline (actnet get_reward
            # modes, main_dist.py:574-581, extended to the divisional PPO)
            random_logits = local_logits

        conf, base_conf = divisional_confidences(
            local_logits, random_logits, global_logits, batch["labels"], d,
            cfg.with_glancer,
        )
        if ppo_cfg.reward_mode == "random":
            rewards = conf - base_conf                   # (B, D)
        else:
            rewards = compute_rewards(conf, None, ppo_cfg.reward_mode)
        returns = discounted_returns(jnp.swapaxes(rewards, 0, 1),
                                     ppo_cfg.gamma, axis_name=axis_name)

        memory = {
            "fmaps": fmaps_tb,
            "actions": roll["store"],
            "old_logprob": roll["logprob"],
            "returns": returns,
        }
        policy_stats = (state.batch_stats or {}).get("policy")
        new_ppo, ppo_metrics, new_policy_stats = ppo_update(
            policy, state.ppo, policy_stats, memory, ppo_cfg,
            axis_name=axis_name,
        )
        params = dict(state.params)
        params["policy"] = new_ppo.params
        new_stats = state.batch_stats
        if new_policy_stats is not None:
            # the sth-sth encoder's BN running stats (the published recipe
            # trains with actorcritic_with_bn=True, train_stage2.sh) advance
            # with each PPO evaluate — greedy eval (train=False) then
            # normalizes with converged statistics, not init zeros/ones
            if axis_name is not None:
                new_policy_stats = jax.lax.pmean(new_policy_stats, axis_name)
            new_stats = dict(state.batch_stats)
            new_stats["policy"] = new_policy_stats
        metrics = dict(ppo_metrics)
        metrics["reward_mean"] = jnp.mean(rewards)
        metrics["confidence"] = jnp.mean(conf)
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          step=state.step + 1, ppo=new_ppo),
            metrics,
        )

    return step


def make_sthsth_eval_step(model: GFV, impl: str = "auto") -> Callable:
    """Deployment eval (reference evaluate.py:165-226): greedy policy,
    batched focus, summed consensus, top-1/5."""

    def step(state: TrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        total = inference_sthsth(
            model, variables, batch["frames_flat"], batch["frames_small"],
            rng, impl=impl,
        )
        top1, top5 = topk_accuracy(total.astype(jnp.float32), batch["labels"])
        return total, {"top1": top1, "top5": top5}

    return step
