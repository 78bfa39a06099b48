"""AdaFocus+ train/eval steps — temporal frame selection on top of the
actnet family (see models/gfv_plus.py for the redesign rationale vs the
reference's vestigial AR-Net loop, sthsth/ops/models_ada.py).

Stage semantics follow the base recipe: stage 1 trains focuser +
classifier + selector on random patches (glancer and spatial policy
frozen); stage 3 finetunes classifier + selector under the frozen greedy
spatial policy. Spatial PPO (stage 2) reuses make_stage2_step unchanged —
the selector only changes which frames the focuser sees, and stage 2
freezes it like every non-policy component.

With ``cfg.plus_rl`` the selector itself becomes a PPO agent
(gfv_plus.SelectorActorCritic) and stage 2 trains the temporal and
spatial policies JOINTLY (``make_plus_stage2_joint_step``): one
factored-action PPO whose per-slot action is (which frame, where to
look), with summed logprobs/critics and per-slot rewards from the
classifier's marginal confidence gain. Stage 1 then selects frames
uniformly at random (the temporal analog of random patches) and stage
3/eval replays the greedy sequential selection.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from adafocus_tpu.models.gfv import GFV, extract_for_frames
from adafocus_tpu.models.gfv_plus import (
    SelectorActorCritic,
    forward_plus,
    gather_frames,
    inference_plus,
)
from adafocus_tpu.ops.metrics import topk_accuracy
from adafocus_tpu.ops.patch import random_patch_actions
from adafocus_tpu.ppo.core import (
    PPOConfig,
    PPOState,
    compute_rewards,
    discounted_returns,
    evaluate_episode,
    make_optimizer,
    make_policy,
)
from adafocus_tpu.train.stages import (
    TrainState,
    _ce_per_step,
    _rollout_time_major,
    _target_confidence,
)


def make_plus_train_step(
    model: GFV,
    stage: int,
    tx: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Callable:
    """Supervised AdaFocus+ stages 1 and 3."""
    if stage not in (1, 3):
        raise ValueError("AdaFocus+ supervised stages are 1 and 3")
    patch_mode = "random" if stage == 1 else "policy"

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params, "batch_stats": state.batch_stats}
        a_key, d_key = jax.random.split(rng)
        logits, _aux, upd = forward_plus(
            model, variables, batch["frames_flat"], batch["frames_small"],
            a_key, train=True, patch_mode=patch_mode, impl=impl,
            mutable=["batch_stats"], rngs={"dropout": d_key},
            freeze_glance=True,
        )
        loss = _ce_per_step(logits, batch["labels"])
        new_stats = dict(state.batch_stats)
        new_stats.update(dict(upd.get("batch_stats", upd)))
        return loss, (new_stats, logits[:, -1])

    def step(state: TrainState, batch, rng):
        (loss, (new_stats, final_logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        top1, top5 = topk_accuracy(
            final_logits.astype(jnp.float32), batch["labels"])
        metrics = {"loss": loss, "top1": top1, "top5": top5}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return (
            state.replace(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


def make_plus_stage2_joint_step(
    model: GFV,
    ppo_cfg: PPOConfig,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Callable:
    """Joint temporal+spatial PPO (cfg.plus_rl) — the ROADMAP-6 design:
    frame selection as part of the RL action space instead of ST-gumbel
    through the task loss.

    Episode = K focus slots. Behavior policies (old params) roll out the
    sequential frame selector and the spatial policy on the selected
    frames; ONE batched focuser call computes all K local features; a
    K-step scan over the GRU classifier yields the confidence after each
    slot. Rewards per slot: 'prev' = marginal confidence gain, 'conf' =
    raw confidence, 'random' = confidence minus a one-step lookahead with
    a random frame + random patch swapped into the same prefix (the
    joint-action analog of the actnet stage-2 baseline,
    gfv_net.py:174-206). The clipped-PPO update is factored-action: ratio
    uses logp_select + logp_spatial, the value estimate is the SUM of the
    two critics (a value decomposition trained jointly), entropies add.
    Everything is one jit program and data-parallelizes like base stage 2
    (returns normalized with cross-replica moments)."""
    cfg = model.cfg
    if not (cfg.frame_budget > 0 and cfg.plus_rl):
        raise ValueError("joint stage 2 needs frame_budget > 0 and plus_rl")
    policy = make_policy(cfg)
    selector = SelectorActorCritic(
        hidden_dim=cfg.selector_hidden, in_dim=cfg.glance_dim, dtype=cfg.dtype
    )
    k = cfg.frame_budget
    tx = make_optimizer(ppo_cfg)

    def conf_final(variables, pooled, local_full, labels):
        """Final-prediction target confidence given scattered local
        features (B, T, D)."""
        fused = jnp.concatenate([pooled, local_full], -1).astype(cfg.dtype)
        logits = model.apply(variables, fused, method=GFV.classify_seq)
        return _target_confidence(logits, labels)[:, -1]

    def step(state: TrainState, batch, rng):
        b, t = batch["frames_small"].shape[:2]
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        sel_key, spat_key, base_f_key, base_a_key = jax.random.split(rng, 4)

        # phase 1: glance (frozen)
        fmap, pooled = model.apply(
            variables, batch["frames_small"], False, method=GFV.glance
        )

        # phase 2a: temporal behavior rollout (old selector params)
        old = state.ppo.params_old
        sel_roll = selector.apply(
            {"params": old["selector_ac"]}, pooled, k, sel_key, "sample",
            method=SelectorActorCritic.rollout,
        )
        idx = sel_roll["idx"]  # (B, K), pick order

        # phase 2b: spatial behavior rollout over the picked frames
        fmap_sel = gather_frames(fmap, idx)
        fmaps_tb = jnp.swapaxes(fmap_sel, 0, 1)  # (K, B, gh, gw, C)
        old_vars = {"params": old["policy"]}
        if "policy" in (state.batch_stats or {}):
            old_vars["batch_stats"] = state.batch_stats["policy"]
        sroll = _rollout_time_major(policy, old_vars, fmaps_tb, spat_key, cfg)

        # phase 3: ONE batched focus on the K selected patches (frozen)
        actions_bk = jnp.swapaxes(sroll["coords"], 0, 1)  # (B, K, 2)
        flat_sel = gather_frames(batch["frames_flat"], idx)
        patches = extract_for_frames(
            flat_sel, actions_bk, cfg.image_size, cfg.patch_size, impl=impl
        )
        local_sel = model.apply(
            variables, patches, False, method=GFV.focus
        ).reshape(b, k, -1)

        use_baseline = ppo_cfg.reward_mode == "random"
        if use_baseline:
            rand_idx = jax.random.randint(base_f_key, (b, k), 0, t)
            rand_actions = random_patch_actions(base_a_key, (b, k))
            rand_patches = extract_for_frames(
                gather_frames(batch["frames_flat"], rand_idx), rand_actions,
                cfg.image_size, cfg.patch_size, impl=impl,
            )
            rand_local = model.apply(
                variables, rand_patches, False, method=GFV.focus
            ).reshape(b, k, -1)

        # per-slot confidences: scan the accumulating local-feature scatter
        ar = jnp.arange(b)

        def body(carry, j):
            new = carry.at[ar, idx[:, j]].set(local_sel[:, j])
            c = conf_final(variables, pooled, new, batch["labels"])
            if use_baseline:
                base = carry.at[ar, rand_idx[:, j]].set(rand_local[:, j])
                cb = conf_final(variables, pooled, base, batch["labels"])
            else:
                cb = jnp.zeros_like(c)
            return new, (c, cb)

        zeros = jnp.zeros((b, t, local_sel.shape[-1]), local_sel.dtype)
        _, (conf_kb, base_kb) = jax.lax.scan(body, zeros, jnp.arange(k))
        conf = jnp.swapaxes(conf_kb, 0, 1)  # (B, K)
        baseline = jnp.swapaxes(base_kb, 0, 1) if use_baseline else None
        rewards = compute_rewards(conf, baseline, ppo_cfg.reward_mode)
        returns = discounted_returns(
            jnp.swapaxes(rewards, 0, 1), ppo_cfg.gamma, axis_name=axis_name
        )  # (K, B)

        old_logp = jnp.swapaxes(sel_roll["logprob"], 0, 1) + sroll["logprob"]
        policy_stats = (state.batch_stats or {}).get("policy")

        def joint_loss(params):
            sel_out = selector.apply(
                {"params": params["selector_ac"]}, pooled, k, sel_key,
                "sample", idx, method=SelectorActorCritic.rollout,
            )
            sp_vars = {"params": params["policy"]}
            if policy_stats is not None:
                sp_vars["batch_stats"] = policy_stats
            if policy_stats is not None and policy.encoder_bn:
                # BN-encoder policies need a mutable pass (train-mode BN
                # writes running stats); joint-RL discards the update — the
                # plus family uses the BN-free actnet encoder by default
                sp_logp, sp_v, sp_ent, _ = evaluate_episode(
                    policy, sp_vars, fmaps_tb, sroll["store"],
                    mutable=["batch_stats"],
                )
            else:
                sp_logp, sp_v, sp_ent = evaluate_episode(
                    policy, sp_vars, fmaps_tb, sroll["store"]
                )
            logp = jnp.swapaxes(sel_out["logprob"], 0, 1) + sp_logp
            values = jnp.swapaxes(sel_out["value"], 0, 1) + sp_v
            entropy = jnp.swapaxes(sel_out["entropy"], 0, 1) + sp_ent
            adv = returns - jax.lax.stop_gradient(values)
            ratios = jnp.exp(logp - old_logp)
            surr1 = ratios * adv
            surr2 = jnp.clip(
                ratios, 1.0 - ppo_cfg.eps_clip, 1.0 + ppo_cfg.eps_clip) * adv
            value_loss = jnp.mean((values - returns) ** 2)
            policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
            ent = jnp.mean(entropy)
            loss = (policy_loss + ppo_cfg.value_coef * value_loss
                    - ppo_cfg.entropy_coef * ent)
            return loss, {
                "ppo/loss": loss,
                "ppo/policy_loss": policy_loss,
                "ppo/value_loss": value_loss,
                "ppo/entropy": ent,
                "ppo/ratio_mean": jnp.mean(ratios),
            }

        def one_epoch(carry, _):
            params, opt_state = carry
            (_, metrics), grads = jax.value_and_grad(
                joint_loss, has_aux=True)(params)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        (new_params, new_opt), metrics = jax.lax.scan(
            one_epoch, (state.ppo.params, state.ppo.opt_state), None,
            length=ppo_cfg.k_epochs,
        )
        metrics = jax.tree.map(lambda m: m[-1], metrics)
        new_ppo = PPOState(
            params=new_params,
            params_old=jax.tree.map(jnp.copy, new_params),
            opt_state=new_opt,
            step=state.ppo.step + 1,
        )
        params = dict(state.params)
        params["policy"] = new_ppo.params["policy"]
        params["selector_ac"] = new_ppo.params["selector_ac"]
        metrics = dict(metrics)
        metrics["reward_mean"] = jnp.mean(rewards)
        metrics["confidence"] = jnp.mean(conf)
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return (
            state.replace(params=params, step=state.step + 1, ppo=new_ppo),
            metrics,
        )

    return step


def make_plus_eval_step(model: GFV, impl: str = "auto") -> Callable:
    """Deployment eval: top-K frames + greedy spatial policy."""

    def step(state: TrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = inference_plus(
            model, variables, batch["frames_flat"], batch["frames_small"],
            rng, impl=impl,
        )
        top1, top5 = topk_accuracy(
            logits[:, -1].astype(jnp.float32), batch["labels"])
        return logits, {"top1": top1, "top5": top5}

    return step
