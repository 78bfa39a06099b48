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
