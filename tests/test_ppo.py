"""PPO numerics: discounted returns vs a hand loop, reward modes, rollout vs
evaluate logprob consistency (ratio==1 when params==params_old), and a full
update step (params move, old params sync — reference ppo.py:147-178)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.models.policy import ActorCritic
from adafocus_tpu.ppo.core import (
    PPOConfig,
    compute_rewards,
    discounted_returns,
    evaluate_episode,
    make_policy,
    ppo_init,
    ppo_update,
)

pytestmark = pytest.mark.smoke  # fast CPU tier: `pytest -m smoke`


def test_discounted_returns_matches_loop():
    rng = np.random.RandomState(0)
    T, B = 5, 3
    rewards = rng.randn(T, B).astype(np.float32)
    gamma = 0.7
    # hand loop (reference ppo.py:149-157)
    disc = np.zeros(B, np.float32)
    rets = []
    for r in rewards[::-1]:
        disc = r + gamma * disc
        rets.insert(0, disc.copy())
    rets = np.stack(rets)
    rets = (rets - rets.mean()) / (rets.std() + 1e-5)
    ours = np.asarray(discounted_returns(jnp.asarray(rewards), gamma))
    np.testing.assert_allclose(ours, rets, atol=1e-5)


def test_reward_modes():
    conf = jnp.asarray([[0.2, 0.5, 0.9]])
    base = jnp.asarray([[0.1, 0.6, 0.7]])
    np.testing.assert_allclose(
        np.asarray(compute_rewards(conf, None, "conf")), [[0.2, 0.5, 0.9]]
    )
    np.testing.assert_allclose(
        np.asarray(compute_rewards(conf, None, "prev")),
        [[0.2, 0.3, 0.4]], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(compute_rewards(conf, base, "random")),
        [[0.1, -0.1, 0.2]], atol=1e-6,
    )


@pytest.fixture(scope="module")
def tiny_policy_setup():
    cfg = GFVConfig(
        num_classes=5, num_frames=4, image_size=32, glance_size=16,
        patch_size=16, action_dim=4, hidden_dim=16, policy_hidden=16,
        dtype=jnp.float32,
    )
    policy = make_policy(cfg)
    T, B, gh, gw, c = cfg.num_frames, 3, 2, 2, 8
    fmaps = jax.random.normal(jax.random.key(0), (T, B, gh, gw, c))
    params = policy.init(
        jax.random.key(1), policy.initial_hidden(B), fmaps[0]
    )["params"]
    return cfg, policy, params, fmaps


def _rollout(policy, params, fmaps_tb, key):
    """sample-mode rollout mirroring GFV.policy_rollout, time-major."""
    from adafocus_tpu.models.policy import sample_discrete
    from flax import linen as nn

    T, B = fmaps_tb.shape[:2]
    keys = jax.random.split(key, T)

    def body(mod, h, x):
        fm, k = x
        h, logits, value = mod.step(h, fm)
        idx, logp = sample_discrete(k, logits)
        return h, (idx, logp, value)

    def run(mod):
        scan = nn.scan(body, variable_broadcast=["params"],
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        return scan(mod, mod.initial_hidden(B), (fmaps_tb, keys))

    _, (idx, logp, value) = nn.apply(run, policy)({"params": params})
    return idx, logp, value


def test_rollout_evaluate_consistency(tiny_policy_setup):
    cfg, policy, params, fmaps = tiny_policy_setup
    idx, logp_roll, value_roll = _rollout(policy, params, fmaps, jax.random.key(2))
    logp_eval, value_eval, ent = evaluate_episode(
        policy, {"params": params}, fmaps, idx, train=False
    )
    np.testing.assert_allclose(np.asarray(logp_roll), np.asarray(logp_eval), atol=1e-5)
    np.testing.assert_allclose(np.asarray(value_roll), np.asarray(value_eval), atol=1e-5)
    assert (np.asarray(ent) > 0).all()


def test_ppo_update_moves_params_and_syncs_old(tiny_policy_setup):
    cfg, policy, params, fmaps = tiny_policy_setup
    ppo_cfg = PPOConfig()
    state = ppo_init(params, ppo_cfg)

    idx, logp, _ = _rollout(policy, state.params_old, fmaps, jax.random.key(3))
    rewards = jax.random.uniform(jax.random.key(4), logp.shape)
    memory = {
        "fmaps": fmaps,
        "actions": idx,
        "old_logprob": logp,
        "returns": discounted_returns(rewards, ppo_cfg.gamma),
    }
    new_state, metrics, new_stats = ppo_update(policy, state, None, memory, ppo_cfg)
    assert new_stats is None  # BN-free policy carries no batch stats

    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree.leaves(moved)) > 0
    synced = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        new_state.params, new_state.params_old,
    )
    assert max(jax.tree.leaves(synced)) == 0
    assert np.isfinite(float(metrics["ppo/loss"]))
    # behavior logprobs came from params_old == params, so ratios start at 1
    assert abs(float(metrics["ppo/ratio_mean"]) - 1.0) < 1e-4


def test_continuous_clamped_sample_logprob_consistency():
    """The continuous behavior logprob must score the CLAMPED action — the
    reference clamps before log_prob (ppo_continuous.py:99-105) and its
    evaluate scores the same stored clamped action (:133), so when
    params_old == params every PPO ratio is exactly 1 even for samples that
    hit the [0,1] boundary."""
    from adafocus_tpu.models.policy import sample_rollout

    cfg = GFVConfig(
        num_classes=5, num_frames=4, image_size=32, glance_size=16,
        patch_size=16, action_dim=4, hidden_dim=16, policy_hidden=16,
        continuous_policy=True, action_std=0.5, dtype=jnp.float32,
    )
    policy = make_policy(cfg)
    T, B, gh, gw, c = cfg.num_frames, 8, 2, 2, 8
    fmaps = jax.random.normal(jax.random.key(0), (T, B, gh, gw, c)) * 3.0
    params = policy.init(
        jax.random.key(1), policy.initial_hidden(B), fmaps[0])["params"]
    _, actor_out, _ = policy.apply(
        {"params": params}, fmaps, False, method=ActorCritic.rollout_states)
    actions, _, logp_roll = sample_rollout(
        actor_out, jax.random.key(2), "sample", True, cfg.action_dim,
        cfg.action_std)
    # std=0.5 guarantees a healthy share of samples clamp to the boundary
    a = np.asarray(actions)
    assert ((a == 0.0) | (a == 1.0)).mean() > 0.1
    logp_eval, _, ent = evaluate_episode(
        policy, {"params": params}, fmaps, actions, train=False)
    np.testing.assert_allclose(
        np.asarray(logp_roll), np.asarray(logp_eval), atol=1e-5)
    # fixed-std Gaussian: entropy is a positive constant (reference :134)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(ent)[0, 0])


def test_policy_channels_config_reaches_encoder():
    """model.policy_channels drives the state-encoder conv width — the
    reference's sth-sth 64-ch+BN encoder (sthsth/models/ppo.py:33-44) must
    be reproducible from config, and make_policy must agree with GFV.setup
    so standalone PPO application shares GFV's parameter shapes."""
    cfg = GFVConfig(
        num_classes=5, num_frames=4, image_size=32, glance_size=16,
        patch_size=16, action_dim=4, hidden_dim=16, policy_hidden=16,
        policy_channels=64, policy_bn=True, dtype=jnp.float32,
    )
    policy = make_policy(cfg)
    B, gh, gw, c = 2, 2, 2, 8
    fmap = jax.random.normal(jax.random.key(0), (B, gh, gw, c))
    variables = policy.init(
        jax.random.key(1), policy.initial_hidden(B), fmap)
    enc = variables["params"]["encoder"]
    assert enc["proj"]["kernel"].shape == (1, 1, c, 64)
    assert "bn" in enc and "bias" not in enc["proj"]

    model = GFV(cfg)
    fmaps = jnp.zeros((B, cfg.num_frames, gh, gw, c))
    gfv_policy_vars = model.init(
        jax.random.key(2), fmaps, jax.random.key(3), "sample", False,
        method=GFV.policy_rollout)
    gp = gfv_policy_vars["params"]["policy"]["encoder"]
    assert gp["proj"]["kernel"].shape[-1] == 64
