"""Pure-functional PPO for the patch policy.

Behavior parity with the reference PPO (actnet/models/ppo.py:125-178 and
sthsth/models/ppo_continuous.py:142-196 in /root/reference):

  * no-bootstrap discounted returns over the T-step episode (gamma=0.7),
    normalized over the flattened (T*B) batch;
  * clipped surrogate (eps=0.2) + 0.5 * value MSE - 0.01 * entropy;
  * ``policy_old`` provides the behavior logprobs; after each update the old
    params are synced to the new ones (reference ppo.py:178);
  * K_epochs re-evaluations per update (reference default 1).

Where the reference keeps an episode ``Memory`` of Python tensor lists
(ppo.py:9-24) — which is why its stage 2 must run single-GPU
(actnet/main_dist.py:112-114) — the memory here is a pytree of (T, B, ...)
arrays produced by the rollout scan, so PPO training data-parallelizes like
any supervised step: gradients are psum-reduced across the mesh by the same
jit program.

Reward modes match get_reward (actnet/main_dist.py:573-581): 'conf' |
'prev' (confidence delta vs previous step) | 'random' (confidence minus the
random-patch baseline confidence).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from adafocus_tpu.models.policy import ActorCritic, gaussian_logprob


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    gamma: float = 0.7
    eps_clip: float = 0.2
    k_epochs: int = 1
    lr: float = 3e-4
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    reward_mode: str = "random"  # 'conf' | 'prev' | 'random'
    betas: Tuple[float, float] = (0.9, 0.999)


class PPOState(struct.PyTreeNode):
    """Policy learner state: current params, behavior (old) params, opt state."""

    params: Any
    params_old: Any
    opt_state: Any
    step: jax.Array


def make_policy(gfv_cfg) -> ActorCritic:
    """The same ActorCritic module definition GFV builds in setup, for
    standalone application to variables['params']['policy']."""
    return ActorCritic(
        action_dim=gfv_cfg.action_dim,
        hidden_dim=gfv_cfg.policy_hidden,
        continuous=gfv_cfg.continuous_policy,
        action_std=gfv_cfg.action_std,
        encoder_conv=gfv_cfg.policy_conv,
        encoder_channels=gfv_cfg.policy_channels,
        encoder_bn=gfv_cfg.policy_bn,
        dtype=gfv_cfg.dtype,
    )


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])


def ppo_init(policy_params, cfg: PPOConfig) -> PPOState:
    tx = make_optimizer(cfg)
    return PPOState(
        params=policy_params,
        params_old=jax.tree.map(jnp.copy, policy_params),
        opt_state=tx.init(policy_params),
        step=jnp.zeros((), jnp.int32),
    )


def compute_rewards(
    confidence: jax.Array,
    baseline: Optional[jax.Array],
    mode: str,
) -> jax.Array:
    """Per-step rewards from target-class confidences.

    confidence: (B, T) softmax probability of the target class after step t.
    baseline:   (B, T) same, from random patches (mode='random').
    """
    if mode == "conf":
        return confidence
    if mode == "prev":
        prev = jnp.concatenate(
            [jnp.zeros_like(confidence[:, :1]), confidence[:, :-1]], axis=1
        )
        return confidence - prev
    if mode == "random":
        if baseline is None:
            raise ValueError("reward mode 'random' needs a baseline")
        return confidence - baseline
    raise ValueError(f"unknown reward mode {mode}")


def discounted_returns(
    rewards_tb: jax.Array, gamma: float, axis_name: Optional[str] = None
) -> jax.Array:
    """No-bootstrap discounted returns over the episode, normalized over the
    flattened (T*B) values (reference ppo.py:149-157).

    rewards_tb: (T, B) time-major rewards.

    Under data parallelism pass ``axis_name``: the mean/std moments are then
    pmean'd so every replica normalizes over the GLOBAL batch — the update is
    invariant to device count, exactly matching the reference's full-batch
    normalization (its stage 2 is single-GPU so its batch is never sharded).
    """

    def body(carry, r):
        carry = r + gamma * carry
        return carry, carry

    _, returns = jax.lax.scan(body, jnp.zeros_like(rewards_tb[0]), rewards_tb,
                              reverse=True)
    mean = returns.mean()
    if axis_name is not None:
        # equal shard sizes -> pmean of per-shard moments is exact
        mean = jax.lax.pmean(mean, axis_name)
        std = jnp.sqrt(jax.lax.pmean(jnp.mean((returns - mean) ** 2),
                                     axis_name))
    else:
        std = returns.std()
    return (returns - mean) / (std + 1e-5)


def evaluate_episode(
    policy: ActorCritic,
    variables,
    fmaps_tb: jax.Array,
    actions_tb: jax.Array,
    train: bool = True,
    mutable=False,
):
    """Re-run the recurrent policy over the episode under the *current*
    params (reference ActorCritic.evaluate, ppo.py:98-122).

    fmaps_tb: (T, B, gh, gw, C) stored policy inputs.
    actions_tb: (T, B) int32 grid indices (discrete) or (T, B, 2) actions
      in [0,1]^2 (continuous).
    Returns (logprobs (T,B), values (T,B), entropy (T,B)); with ``mutable``
    a 4th element carries the updated variable collections — the sth-sth
    encoder has BatchNorm (sthsth/models/ppo.py:33-44, ppo_continuous.py
    with_bn; the published recipe trains with actorcritic_with_bn=True,
    train_stage2.sh), and in the reference it is exactly this ``evaluate``
    call, running under ``model.train()``, that advances the persistent
    running statistics (``act`` updates land on policy_old and are
    overwritten by the old<-new sync, ppo.py:178).
    """
    out = policy.apply(
        variables, fmaps_tb, train, method=ActorCritic.rollout_states,
        mutable=mutable,
    )
    if mutable:
        (_, actor_out, value), upd = out
    else:
        _, actor_out, value = out
    if policy.continuous:
        logp = gaussian_logprob(actions_tb, actor_out, policy.action_std)
        var = policy.action_std**2
        ent = jnp.full(logp.shape, 0.5 * 2 * (1.0 + jnp.log(2 * jnp.pi * var)))
    else:
        logprobs = jax.nn.log_softmax(actor_out, axis=-1)
        logp = jnp.take_along_axis(logprobs, actions_tb[..., None], axis=-1)[..., 0]
        probs = jax.nn.softmax(actor_out, axis=-1)
        ent = -jnp.sum(probs * logprobs, axis=-1)
    res = (logp.astype(jnp.float32), value.astype(jnp.float32),
           ent.astype(jnp.float32))
    return res + (upd,) if mutable else res


def ppo_loss(
    policy: ActorCritic,
    params,
    batch_stats,
    memory: Dict[str, jax.Array],
    cfg: PPOConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Clipped-surrogate PPO loss (reference ppo.py:159-176).

    memory (all time-major): fmaps (T,B,...), actions ((T,B) idx or (T,B,2)),
    old_logprob (T,B), returns (T,B) already discounted+normalized.
    """
    variables = {"params": params}
    new_stats = None
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
        logp, values, entropy, upd = evaluate_episode(
            policy, variables, memory["fmaps"], memory["actions"],
            mutable=["batch_stats"],
        )
        new_stats = dict(upd.get("batch_stats", batch_stats))
    else:
        logp, values, entropy = evaluate_episode(
            policy, variables, memory["fmaps"], memory["actions"]
        )
    advantages = memory["returns"] - jax.lax.stop_gradient(values)
    ratios = jnp.exp(logp - memory["old_logprob"])
    surr1 = ratios * advantages
    surr2 = jnp.clip(ratios, 1.0 - cfg.eps_clip, 1.0 + cfg.eps_clip) * advantages
    value_loss = jnp.mean((values - memory["returns"]) ** 2)
    policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
    ent = jnp.mean(entropy)
    loss = policy_loss + cfg.value_coef * value_loss - cfg.entropy_coef * ent
    metrics = {
        "ppo/loss": loss,
        "ppo/policy_loss": policy_loss,
        "ppo/value_loss": value_loss,
        "ppo/entropy": ent,
        "ppo/ratio_mean": jnp.mean(ratios),
    }
    return loss, (metrics, new_stats)


def ppo_update(
    policy: ActorCritic,
    state: PPOState,
    batch_stats,
    memory: Dict[str, jax.Array],
    cfg: PPOConfig,
    axis_name: Optional[str] = None,
) -> Tuple[PPOState, Dict[str, jax.Array]]:
    """K_epochs of clipped-PPO on one episode batch; then old <- new
    (reference ppo.py:147-178). Pure: jit/shard_map-safe; pass ``axis_name``
    to psum gradients under data parallelism (capability the reference
    explicitly lacks, actnet/main_dist.py:112-114).

    Returns (new_state, metrics, new_batch_stats): the third element carries
    the policy encoder's advanced BatchNorm running statistics (None when the
    policy has no BN) — each K epoch's evaluate feeds the next, as the
    reference's sequential evaluate calls do.
    """
    tx = make_optimizer(cfg)

    def one_epoch(carry, _):
        params, opt_state, stats = carry
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            lambda p: ppo_loss(policy, p, stats, memory, cfg), has_aux=True
        )(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, new_stats), metrics

    (params, opt_state, new_stats), metrics = jax.lax.scan(
        one_epoch, (state.params, state.opt_state, batch_stats), None,
        length=cfg.k_epochs,
    )
    metrics = jax.tree.map(lambda m: m[-1], metrics)
    new_state = PPOState(
        params=params,
        params_old=jax.tree.map(jnp.copy, params),
        opt_state=opt_state,
        step=state.step + 1,
    )
    return new_state, metrics, new_stats
