"""AdaFocus+ tests: top-K selection semantics, straight-through gradients,
gather/scatter exactness, full forward + train step, and the FLOP saving
the budget buys."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from adafocus_tpu.models.gfv import GFV, GFVConfig
from adafocus_tpu.models.gfv_plus import (
    forward_plus,
    gather_frames,
    inference_plus,
    scatter_frames,
    select_topk,
)
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
from adafocus_tpu.train.stages import create_train_state
from adafocus_tpu.train.stages_plus import (
    make_plus_eval_step,
    make_plus_train_step,
)


def tiny_cfg(**kw):
    base = dict(
        num_classes=5, num_frames=6, image_size=24, glance_size=16,
        patch_size=16, action_dim=4, hidden_dim=16, policy_hidden=16,
        frame_budget=3, selector_hidden=8, dtype=jnp.float32,
    )
    base.update(kw)
    return GFVConfig(**base)


def make_batch(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    t = cfg.num_frames
    frames = jnp.asarray(
        rng.normal(size=(b * t, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    flat = pad_for_extraction(frames)
    return {
        "frames_flat": flat.reshape(b, t, *flat.shape[1:]),
        "frames_small": jnp.asarray(rng.normal(
            size=(b, t, cfg.glance_size, cfg.glance_size, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, cfg.num_classes, b), jnp.int32),
    }


def test_select_topk_deterministic():
    scores = jnp.asarray([[0.1, 5.0, -2.0, 3.0], [4.0, 0.0, 1.0, -1.0]])
    idx, mask = select_topk(scores, 2, jax.random.key(0), mode="top")
    assert idx.tolist() == [[1, 3], [0, 2]]  # time-sorted top-2
    np.testing.assert_array_equal(
        np.asarray(mask), [[0, 1, 0, 1], [1, 0, 1, 0]])


def test_select_topk_straight_through_grad():
    scores = jnp.asarray([[2.0, -1.0, 0.5]])

    def f(s):
        _, mask = select_topk(s, 2, jax.random.key(0), mode="top")
        return jnp.sum(mask * jnp.asarray([1.0, 2.0, 3.0]))

    g = jax.grad(f)(scores)
    # ST gradient = sigmoid'(s) * weight, nonzero everywhere
    expect = jax.nn.sigmoid(scores) * (1 - jax.nn.sigmoid(scores)) * \
        jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-5)


def test_select_topk_sampling_explores():
    scores = jnp.zeros((1, 8))  # uniform scores -> selection driven by noise
    picks = set()
    for i in range(20):
        idx, _ = select_topk(scores, 3, jax.random.key(i), mode="sample")
        picks.add(tuple(np.asarray(idx[0])))
    assert len(picks) > 5  # gumbel noise actually varies the selection


def test_gather_scatter_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 3)), jnp.float32)
    idx = jnp.asarray([[0, 2, 4], [1, 2, 3]])
    sel = gather_frames(x, idx)
    assert sel.shape == (2, 3, 3)
    np.testing.assert_allclose(np.asarray(sel[0, 1]), np.asarray(x[0, 2]))
    back = scatter_frames(sel, idx, 5)
    np.testing.assert_allclose(np.asarray(back[0, 2]), np.asarray(x[0, 2]))
    np.testing.assert_allclose(np.asarray(back[0, 1]), 0.0)  # unselected = 0


@pytest.fixture(scope="module")
def model_state():
    cfg = tiny_cfg()
    model = GFV(cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=2))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    return model, tx, state


def test_forward_and_inference_shapes(model_state):
    model, _, state = model_state
    batch = make_batch(model.cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits, aux = forward_plus(
        model, variables, batch["frames_flat"], batch["frames_small"],
        jax.random.key(1), train=False,
    )
    assert logits.shape == (2, 6, 5)
    assert aux["frame_idx"].shape == (2, 3)
    out = inference_plus(model, variables, batch["frames_flat"],
                         batch["frames_small"], jax.random.key(2))
    assert out.shape == (2, 6, 5)
    # eval selection is deterministic
    out2 = inference_plus(model, variables, batch["frames_flat"],
                          batch["frames_small"], jax.random.key(99))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_plus_train_step_trains_selector(model_state):
    model, tx, state = model_state
    batch = make_batch(model.cfg)
    step = jax.jit(make_plus_train_step(model, 1, tx))
    new_state, metrics = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))

    def delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )
    assert delta(new_state.params["selector"], state.params["selector"]) > 0
    assert delta(new_state.params["focuser"], state.params["focuser"]) > 0
    assert delta(new_state.params["glancer"], state.params["glancer"]) == 0
    assert delta(new_state.params["policy"], state.params["policy"]) == 0


def test_plus_stage3_and_eval(model_state):
    model, tx, state = model_state
    batch = make_batch(model.cfg)
    step3 = jax.jit(make_plus_train_step(model, 3, tx))
    _, metrics = step3(state, batch, jax.random.key(4))
    assert np.isfinite(float(metrics["loss"]))
    ev = jax.jit(make_plus_eval_step(model))
    logits, m = ev(state, batch, jax.random.key(5))
    assert logits.shape == (2, 6, 5)
    assert 0.0 <= float(m["top1"]) <= 1.0


# ---------------------------------------------------------------------------
# Joint temporal+spatial RL (cfg.plus_rl)
# ---------------------------------------------------------------------------


def test_selector_ac_rollout_semantics():
    """Sequential selector: no repeated frames, replay-consistency, greedy
    determinism, masked-categorical logprobs."""
    from adafocus_tpu.models.gfv_plus import SelectorActorCritic

    b, t, d, k = 3, 6, 8, 4
    sel = SelectorActorCritic(hidden_dim=8, attn_dim=8, in_dim=d,
                              dtype=jnp.float32)
    pooled = jax.random.normal(jax.random.key(0), (b, t, d), jnp.float32)
    vs = sel.init(jax.random.key(1), pooled, k, jax.random.key(2),
                  method=SelectorActorCritic.rollout)
    roll = sel.apply(vs, pooled, k, jax.random.key(3), "sample",
                     method=SelectorActorCritic.rollout)
    idx = np.asarray(roll["idx"])
    assert idx.shape == (b, k)
    for row in idx:  # without replacement
        assert len(set(row.tolist())) == k
    assert np.all(np.isfinite(np.asarray(roll["logprob"])))
    assert np.all(np.asarray(roll["entropy"]) >= 0)

    # replay under the same params reproduces the behavior logprobs
    replay = sel.apply(vs, pooled, k, jax.random.key(99), "sample",
                       roll["idx"], method=SelectorActorCritic.rollout)
    np.testing.assert_allclose(np.asarray(replay["logprob"]),
                               np.asarray(roll["logprob"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(replay["idx"]), idx)

    # greedy mode is rng-independent
    g1 = sel.apply(vs, pooled, k, jax.random.key(4), "top",
                   method=SelectorActorCritic.rollout)
    g2 = sel.apply(vs, pooled, k, jax.random.key(5), "top",
                   method=SelectorActorCritic.rollout)
    np.testing.assert_array_equal(np.asarray(g1["idx"]), np.asarray(g2["idx"]))


def test_plus_rl_forward_and_eval():
    """plus_rl forward: stage-1 random frame selection (unique frames),
    eval greedy sequential selection (deterministic)."""
    cfg = tiny_cfg(plus_rl=True)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    assert "selector_ac" in state.params and "selector" not in state.params
    batch = make_batch(cfg)

    logits, aux = forward_plus(
        model, variables, batch["frames_flat"], batch["frames_small"],
        jax.random.key(1), train=False, patch_mode="random",
    )
    assert logits.shape == (2, 6, 5)
    for row in np.asarray(aux["frame_idx"]):
        assert len(set(row.tolist())) == cfg.frame_budget

    out1 = inference_plus(model, variables, batch["frames_flat"],
                          batch["frames_small"], jax.random.key(2))
    out2 = inference_plus(model, variables, batch["frames_flat"],
                          batch["frames_small"], jax.random.key(77))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("reward_mode", ["random", "prev"])
def test_plus_joint_stage2_step(reward_mode):
    """Joint temporal+spatial PPO: one jitted step updates BOTH policies
    (and nothing else), with finite metrics."""
    from adafocus_tpu.ppo.core import PPOConfig
    from adafocus_tpu.train.stages_plus import make_plus_stage2_joint_step

    cfg = tiny_cfg(plus_rl=True)
    model = GFV(cfg)
    ppo_cfg = PPOConfig(lr=1e-3, reward_mode=reward_mode)
    state = create_train_state(model, jax.random.key(0), ppo_cfg=ppo_cfg)
    batch = make_batch(cfg)
    step = jax.jit(make_plus_stage2_joint_step(model, ppo_cfg))
    new_state, metrics = step(state, batch, jax.random.key(1))

    def delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert delta(new_state.params["policy"], state.params["policy"]) > 0
    assert delta(new_state.params["selector_ac"],
                 state.params["selector_ac"]) > 0
    assert delta(new_state.params["focuser"], state.params["focuser"]) == 0
    assert delta(new_state.params["classifier"],
                 state.params["classifier"]) == 0
    for v in metrics.values():
        assert np.isfinite(float(v)), metrics
    # behavior sync: old params track the update
    np.testing.assert_allclose(
        jax.tree.leaves(new_state.ppo.params_old)[0],
        jax.tree.leaves(new_state.ppo.params)[0])


def test_budget_reduces_flops():
    """frame_budget=K must cut focuser work to ~K/T of the full model."""
    from adafocus_tpu.ops.flops import xla_flops

    def flops_for(budget):
        cfg = tiny_cfg(num_frames=8, frame_budget=budget)
        model = GFV(cfg)
        state = create_train_state(model, jax.random.key(0))
        batch = make_batch(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return xla_flops(
            lambda v, ff, fs: inference_plus(model, v, ff, fs, jax.random.key(1)),
            variables, batch["frames_flat"], batch["frames_small"],
        )

    full = flops_for(8)
    quarter = flops_for(2)
    assert quarter < 0.65 * full  # focuser dominates; 2/8 budget cuts deep
