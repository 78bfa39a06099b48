"""Per-stage train/eval steps — each stage is ONE jitted XLA program.

Stage semantics mirror the reference driver (actnet/main_dist.py:424-571 in
/root/reference):

  stage 0  backbone pretrain: glancer CE on downsampled frames + focuser CE
           on random patches ('backbone_pred' mode, gfv_net.py:85-94).
  stage 1  joint training with random patches: glancer frozen (no_grad +
           eval BN), focuser+classifier train (gfv_net.py:134-150).
  stage 2  PPO policy training: everything frozen except the policy;
           rewards from classifier confidence vs a random-patch baseline
           (main_dist.py:494-518, 573-581). Unlike the reference — which
           must run this stage single-GPU because PPO memory is Python
           lists (main_dist.py:112-114) — this step is a pure function of
           (state, batch, rng) and data-parallelizes via shard_map/psum.
  stage 3  classifier finetune with the frozen greedy policy
           (one_step path, gfv_net.py:95-133).

Freezing is explicit: stop_gradient on frozen phase outputs (so backward
FLOPs are actually skipped, unlike optimizer-side zeroing alone) plus
optax.multi_transform set_to_zero labels; frozen BatchNorms run in eval
mode (the reference achieves this implicitly with .eval(), gfv_net.py:64-82).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from adafocus_tpu.models.gfv import GFV, GFVConfig, extract_for_frames
from adafocus_tpu.ops.metrics import topk_accuracy
from adafocus_tpu.ops.patch import random_patch_actions
from adafocus_tpu.ppo.core import (
    PPOConfig,
    PPOState,
    compute_rewards,
    discounted_returns,
    evaluate_episode,
    make_policy,
    ppo_update,
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    ppo: Optional[PPOState] = None


def create_train_state(model: GFV, rng: jax.Array, tx=None,
                       ppo_cfg: Optional[PPOConfig] = None,
                       batch_size: int = 2) -> TrainState:
    cfg = model.cfg
    b, t = batch_size, cfg.num_frames
    frames_small = jnp.zeros((b, t, cfg.glance_size, cfg.glance_size, 3), cfg.dtype)
    patches = jnp.zeros(
        (b * cfg.t_focuser, cfg.patch_size, cfg.patch_size, 3), cfg.dtype
    )
    # jit the init: one compiled program instead of hundreds of eager
    # dispatches (a large win on remote/tunneled backends), and it lands in
    # the persistent compilation cache.
    variables = jax.jit(model.init)({"params": rng}, frames_small, patches, rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params) if tx is not None else None
    ppo = None
    if ppo_cfg is not None:
        from adafocus_tpu.ppo.core import ppo_init

        ppo_params = params["policy"]
        if cfg.frame_budget > 0 and cfg.plus_rl:
            # joint temporal+spatial PPO (stages_plus): one learner over
            # both policies' params
            ppo_params = {"policy": params["policy"],
                          "selector_ac": params["selector_ac"]}
        ppo = ppo_init(ppo_params, ppo_cfg)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32), ppo=ppo)


def _ce_per_step(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE with the label broadcast over time steps
    (reference main_dist.py:479: per-step targets)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logp, labels[:, None, None].astype(jnp.int32), axis=-1
    )
    return -jnp.mean(picked)


def _apply_mut(model, variables, method, *args, train: bool, rngs=None):
    """Apply a method; collect batch_stats updates only when training."""
    if train:
        out, upd = model.apply(variables, *args, method=method,
                               mutable=["batch_stats"], rngs=rngs)
        return out, upd.get("batch_stats", {})
    return model.apply(variables, *args, method=method, rngs=rngs), {}


def _merge_stats(base: dict, *updates: dict) -> dict:
    out = dict(base)
    for upd in updates:
        for k, v in dict(upd).items():
            out[k] = v
    return out


def make_stage_train_step(
    model: GFV,
    stage: int,
    tx: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Callable:
    """Supervised stages 0/1/3. Returns step(state, batch, rng) ->
    (state, metrics). batch: frames_flat (B,T,S,L), frames_small
    (B,T,g,g,3), labels (B,)."""
    cfg = model.cfg
    if stage not in (0, 1, 3):
        raise ValueError("use make_stage2_step for PPO training")
    train_glancer = stage == 0
    train_focuser = stage in (0, 1)

    def loss_fn(params, state: TrainState, batch, rng):
        # batch_stats are THREADED through the sequential applies: a flax
        # mutable apply returns the FULL collection (untouched components
        # included), so merging independent full trees would let a later
        # apply's stale copy silently revert an earlier component's update
        # (stage 0 previously lost every glancer running-stat update this
        # way).
        stats = state.batch_stats
        b, t = batch["frames_small"].shape[:2]
        a_key, d_key = jax.random.split(rng)
        rngs = {"dropout": d_key}

        def cur():
            return {"params": params, "batch_stats": stats}

        # --- glance ---
        (fmap, pooled), g_upd = _apply_mut(
            model, cur(), GFV.glance, batch["frames_small"], train_glancer,
            train=train_glancer, rngs=rngs,
        )
        stats = _merge_stats(stats, g_upd)
        if not train_glancer:
            fmap = jax.lax.stop_gradient(fmap)
            pooled = jax.lax.stop_gradient(pooled)

        # --- actions ---
        if stage == 3:
            roll = model.apply(cur(), fmap, a_key, "greedy", False,
                               method=GFV.policy_rollout)
            actions = jax.lax.stop_gradient(roll["actions"])
        else:
            actions = random_patch_actions(a_key, (b, t))

        # --- focus ---
        patches = extract_for_frames(
            batch["frames_flat"], actions, cfg.image_size, cfg.patch_size,
            impl=impl,
        )
        local, f_upd = _apply_mut(
            model, cur(), GFV.focus, patches, train_focuser,
            train=train_focuser, rngs=rngs,
        )
        stats = _merge_stats(stats, f_upd)
        if not train_focuser:
            local = jax.lax.stop_gradient(local)
        local = local.reshape(b, t, -1)

        # --- classify ---
        fused = jnp.concatenate([pooled, local], axis=-1).astype(cfg.dtype)
        if cfg.classifier == "gru":
            logits = model.apply(cur(), fused, method=GFV.classify_seq)
            loss = _ce_per_step(logits, batch["labels"])
            final_logits = logits[:, -1]
        else:
            logp = model.apply(cur(), fused, True,
                               method=GFV.classify_linear, rngs=rngs)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, batch["labels"][:, None], axis=-1)
            )
            final_logits = logp

        # --- stage-0 extra heads ---
        if stage == 0:
            gl, gl_upd = _apply_mut(
                model, cur(), GFV.glance_logits, batch["frames_small"], True,
                train=True, rngs=rngs,
            )
            stats = _merge_stats(stats, gl_upd)
            loss_g = _ce_per_step(gl[1], batch["labels"])
            fl, fl_upd = _apply_mut(
                model, cur(), GFV.focus_logits, patches, True,
                train=True, rngs=rngs,
            )
            stats = _merge_stats(stats, fl_upd)
            fl = fl.reshape(b, t, -1)
            loss_f = _ce_per_step(fl, batch["labels"])
            loss = loss + loss_g + loss_f

        return loss, (stats, final_logits)

    def step(state: TrainState, batch, rng):
        (loss, (new_stats, final_logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        top1, top5 = topk_accuracy(final_logits, batch["labels"])
        metrics = {"loss": loss, "top1": top1, "top5": top5}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


def _target_confidence(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """(B, T, C) logits -> (B, T) softmax probability of the target class
    (reward signal, reference main_dist.py:505-515)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(
        probs, labels[:, None, None].astype(jnp.int32), axis=-1
    )[..., 0]


def make_stage2_step(
    model: GFV,
    ppo_cfg: PPOConfig,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Callable:
    """PPO policy training step (reference main_dist.py:494-518 + ppo.py
    update; fully batched and data-parallel here)."""
    cfg = model.cfg
    policy = make_policy(cfg)

    def step(state: TrainState, batch, rng):
        b, t = batch["frames_small"].shape[:2]
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        roll_key, base_key = jax.random.split(rng)

        # phase 1: glance (frozen)
        fmap, pooled = model.apply(
            variables, batch["frames_small"], False, method=GFV.glance
        )

        # phase 2: rollout with the BEHAVIOR (old) policy
        old_vars = {"params": state.ppo.params_old}
        if "policy" in (state.batch_stats or {}):
            old_vars["batch_stats"] = state.batch_stats["policy"]
        fmaps_tb = jnp.swapaxes(fmap, 0, 1)
        roll = _rollout_time_major(policy, old_vars, fmaps_tb, roll_key, cfg)

        # phase 3: batched focus + classify -> rewards
        actions_bt = jnp.swapaxes(roll["coords"], 0, 1)  # (B, T, 2)
        patches = extract_for_frames(
            batch["frames_flat"], actions_bt, cfg.image_size, cfg.patch_size,
            impl=impl,
        )
        local = model.apply(variables, patches, False, method=GFV.focus)
        local = local.reshape(b, t, -1)
        fused = jnp.concatenate([pooled, local], axis=-1).astype(cfg.dtype)
        logits, hiddens = model.apply(
            variables, fused, method=GFV.classify_seq_with_hiddens
        )
        conf = _target_confidence(logits, batch["labels"])

        baseline = None
        if ppo_cfg.reward_mode == "random":
            # faithful reference baseline (gfv_net.py:174-206 + :449-457):
            # baseline_t is a ONE-STEP lookahead from the POLICY trajectory's
            # GRU hidden h_{t-1} with random-patch features — not a separate
            # all-random trajectory. Batched: the policy GRU scan above
            # already produced every h_{t-1}; one vectorized cell step over
            # (B*T) covers all lookaheads at once.
            base_actions = random_patch_actions(base_key, (b, t))
            base_patches = extract_for_frames(
                batch["frames_flat"], base_actions, cfg.image_size,
                cfg.patch_size, impl=impl,
            )
            base_local = model.apply(
                variables, base_patches, False, method=GFV.focus
            ).reshape(b, t, -1)
            fused_rand = jnp.concatenate(
                [pooled, base_local], axis=-1
            ).astype(cfg.dtype)
            h_prefix = jnp.concatenate(
                [jnp.zeros_like(hiddens[:, :1]), hiddens[:, :-1]], axis=1
            )
            base_logits = model.apply(
                variables,
                h_prefix.reshape(b * t, -1),
                fused_rand.reshape(b * t, -1),
                method=GFV.classifier_lookahead,
            ).reshape(b, t, -1)
            baseline = _target_confidence(base_logits, batch["labels"])

        rewards = compute_rewards(conf, baseline, ppo_cfg.reward_mode)  # (B, T)
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
            policy, state.ppo, policy_stats, memory, ppo_cfg, axis_name=axis_name
        )
        params = dict(state.params)
        params["policy"] = new_ppo.params
        new_stats = state.batch_stats
        if new_policy_stats is not None:
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


def _rollout_time_major(policy, variables, fmaps_tb, rng, cfg: GFVConfig):
    """Sample-mode behavior rollout, time-major (the reference's Memory —
    ppo.py:9-24 — as scan-stacked arrays). Uses the batched fast path:
    encoder/actor/critic run once over (T*B); only the GRU recurrence
    scans.

    When the policy encoder has BatchNorm (the sth-sth encoders,
    sthsth/models/ppo.py:33-44 / ppo_continuous.py with_bn), the rollout
    runs train-mode BN, matching the reference's ``act`` under
    ``model.train()`` — the same batch statistics the PPO evaluate pass will
    normalize with, so behavior/evaluate logprobs agree and ratios start at
    exactly 1. The running-average update is DISCARDED here: in the
    reference it lands on ``policy_old`` and is overwritten by the next
    old<-new sync (ppo.py:178); the persistent stats advance in
    ``ppo_update``."""
    from adafocus_tpu.models.policy import ActorCritic, sample_rollout

    if policy.encoder_bn and "batch_stats" in variables:
        (_, actor_out, value), _ = policy.apply(
            variables, fmaps_tb, True, method=ActorCritic.rollout_states,
            mutable=["batch_stats"],
        )
    else:
        _, actor_out, value = policy.apply(
            variables, fmaps_tb, False, method=ActorCritic.rollout_states
        )
    coords, idx, logp = sample_rollout(
        actor_out, rng, "sample", cfg.continuous_policy, cfg.action_dim,
        cfg.action_std,
    )
    return {
        "coords": coords.astype(jnp.float32),
        "store": coords if cfg.continuous_policy else idx,
        "logprob": logp.astype(jnp.float32),
        "value": value.astype(jnp.float32),
    }


def make_eval_step(model: GFV, impl: str = "auto") -> Callable:
    """Deployment eval: two-phase inference, returns per-step logits and
    final top-1/top-5 (host code aggregates mAP over the epoch as the
    reference does, main_dist.py:392-397)."""
    cfg = model.cfg

    def step(state: TrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        from adafocus_tpu.models.gfv import inference

        logits = inference(
            model, variables, batch["frames_flat"], batch["frames_small"], rng,
            impl=impl,
        )
        top1, top5 = topk_accuracy(logits[:, -1].astype(jnp.float32),
                                   batch["labels"])
        return logits, {"top1": top1, "top5": top5}

    return step
