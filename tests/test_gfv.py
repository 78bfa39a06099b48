"""End-to-end GFV model tests on tiny synthetic shapes (CPU, f32).

Covers the multi-mode forward surface the reference exposes via
GFV.forward/one_step_act (actnet/models/gfv_net.py:85-210): stage-1 random
patches, two-phase deployment inference, policy rollout, and gradient flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adafocus_tpu.models.gfv import (
    GFV,
    GFVConfig,
    forward_random,
    glance_policy_actions,
    inference,
)
from adafocus_tpu.ops.patch import pad_for_extraction


@pytest.fixture(scope="module")
def tiny_model():
    cfg = GFVConfig(
        num_classes=7,
        num_frames=3,
        image_size=32,
        glance_size=16,
        patch_size=16,
        action_dim=4,
        hidden_dim=32,
        policy_hidden=16,
        dtype=jnp.float32,
    )
    model = GFV(cfg)
    b, t = 2, cfg.num_frames
    rng = jax.random.key(0)
    frames_small = jnp.zeros((b, t, cfg.glance_size, cfg.glance_size, 3))
    patches = jnp.zeros((b * t, cfg.patch_size, cfg.patch_size, 3))
    variables = model.init(
        {"params": rng}, frames_small, patches, jax.random.key(1)
    )
    return cfg, model, variables


def make_batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    t = cfg.num_frames
    frames = rng.randn(b * t, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    flat = pad_for_extraction(jnp.asarray(frames))
    frames_flat = flat.reshape(b, t, *flat.shape[1:])
    small = rng.randn(b, t, cfg.glance_size, cfg.glance_size, 3).astype(np.float32)
    return frames_flat, jnp.asarray(small)


def test_init_param_tree(tiny_model):
    cfg, model, variables = tiny_model
    top = set(variables["params"].keys())
    assert top == {"glancer", "focuser", "policy", "classifier"}
    assert "batch_stats" in variables


def test_forward_random_shapes(tiny_model):
    cfg, model, variables = tiny_model
    frames_flat, small = make_batch(cfg)
    logits = forward_random(
        model, variables, frames_flat, small, jax.random.key(2), train=False
    )
    assert logits.shape == (2, cfg.num_frames, cfg.num_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_inference_two_phase(tiny_model):
    cfg, model, variables = tiny_model
    frames_flat, small = make_batch(cfg)
    logits = inference(model, variables, frames_flat, small, jax.random.key(3))
    assert logits.shape == (2, cfg.num_frames, cfg.num_classes)
    # greedy policy => deterministic under different rngs
    logits2 = inference(model, variables, frames_flat, small, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-6)


def test_policy_rollout_outputs(tiny_model):
    cfg, model, variables = tiny_model
    _, small = make_batch(cfg)
    fmap, pooled, roll = glance_policy_actions(
        model, variables, small, jax.random.key(4), mode="sample"
    )
    b, t = 2, cfg.num_frames
    assert roll["actions"].shape == (b, t, 2)
    assert roll["action_idx"].shape == (b, t)
    assert roll["logprob"].shape == (b, t)
    assert roll["value"].shape == (b, t)
    a = np.asarray(roll["actions"])
    assert (a >= 0).all() and (a <= 1).all()
    # sampled actions must hit grid anchors for discrete policy
    anchors = {0.0, 1.0}
    assert set(np.unique(a)).issubset(anchors)


def test_gradients_flow(tiny_model):
    cfg, model, variables = tiny_model
    frames_flat, small = make_batch(cfg)
    labels = jnp.array([1, 3])

    def loss_fn(params):
        vs = {"params": params, "batch_stats": variables["batch_stats"]}
        logits, updates = forward_random(
            model, vs, frames_flat, small, jax.random.key(5),
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(6)},
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(logp[jnp.arange(2), :, labels])

    grads = jax.grad(loss_fn)(variables["params"])
    gnorms = {
        k: float(
            jnp.sqrt(
                sum(jnp.sum(x**2) for x in jax.tree.leaves(v))
            )
        )
        for k, v in grads.items()
    }
    assert gnorms["focuser"] > 0
    assert gnorms["classifier"] > 0
    assert gnorms["glancer"] > 0
    # policy gets no gradient from the CE loss (random patches path)
    assert gnorms["policy"] == 0
