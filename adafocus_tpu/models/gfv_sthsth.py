"""Sth-Sth (TSM) model family — sum-consensus forwards over dual-rate frames.

Capability parity with the reference's second GFV variant
(sthsth/models/gfv_net.py:16-225 in /root/reference): a TSM MobileNetV2
glancer producing per-frame *logits*, a TSM ResNet-50 focuser on patch
pixels, a dropout+FC local head, average consensus over each stream summed
(:75-99), and one policy action per **video division** applied to every
focuser frame in that division (:136-225).

TPU-first redesign notes:
  * The reference re-runs the focuser on ALL accumulated patches at every
    division (O(div^2) work, gfv_net.py:162-169). Here the focuser runs
    ONCE over all Tf patches and the per-division "logits so far" are a
    running mean over per-frame logits — the same average-consensus math,
    computed incrementally (SURVEY.md section 7 'hard parts').
  * TSM temporal grouping is consistent: the focuser always shifts over the
    full Tf-frame clip, where the reference's partial-clip re-runs shift
    over whatever prefix it has accumulated.
  * Everything composes into the same three-phase jit program as the actnet
    family (adafocus_tpu/models/gfv.py): glance -> division policy scan ->
    one batched extract+focus.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from adafocus_tpu.models.classifiers import avg_consensus
from adafocus_tpu.models.gfv import GFV, extract_for_frames
from adafocus_tpu.ops.patch import random_patch_actions


def actions_per_frame(actions_div: jax.Array, t_focuser: int) -> jax.Array:
    """(B, D, 2) division actions -> (B, Tf, 2): every focuser frame in a
    division gets its division's crop (reference gfv_net.py:158-161, the
    channel-stacked crop)."""
    d = actions_div.shape[1]
    return jnp.repeat(actions_div, t_focuser // d, axis=1)


def sum_consensus(
    global_logits: Optional[jax.Array],
    local_logits: jax.Array,
    with_glancer: bool = True,
) -> jax.Array:
    """consensus(local) [+ consensus(global)] (reference gfv_net.py:95-99,
    170-175). local_logits (B, Tf, C); global_logits (B, Tg, C)."""
    total = avg_consensus(local_logits)
    if with_glancer and global_logits is not None:
        total = total + avg_consensus(global_logits)
    return total


def local_frame_logits(
    model: GFV, variables, patches: jax.Array, b: int, train: bool = False,
    mutable=False, rngs=None,
):
    """patches (B*Tf, P, P, 3) -> per-frame local logits (B, Tf, classes):
    focuser features -> dropout+FC (reference gfv_net.py:88-93)."""
    if mutable:
        feats, upd = model.apply(
            variables, patches, train, method=GFV.focus, mutable=mutable,
            rngs=rngs,
        )
    else:
        feats = model.apply(variables, patches, train, method=GFV.focus,
                            rngs=rngs)
        upd = {}
    feats = feats.reshape(b, -1, feats.shape[-1])
    logits = model.apply(
        variables, feats, train, method=GFV.classify_frame_logits, rngs=rngs
    )
    return (logits, upd) if mutable else logits


def glance_division_rollout(
    model: GFV, variables, frames_small: jax.Array, rng: jax.Array,
    mode: str = "greedy", train: bool = False,
):
    """Phases 1+2 for the sth-sth family: TSM glance (maps + logits) and the
    per-division policy rollout."""
    fmap, global_logits = model.apply(
        variables, frames_small, train, method=GFV.glance_logits
    )
    roll = model.apply(
        variables, fmap, rng, mode, train, method=GFV.policy_rollout_div
    )
    return fmap, global_logits, roll


def forward_random_sthsth(
    model: GFV, variables, frames_flat: jax.Array, frames_small: jax.Array,
    rng: jax.Array, train: bool = True, impl: str = "auto", mutable=False,
    rngs=None,
):
    """Stage-1 forward: per-frame random patches, sum of consensus logits
    (reference gfv_net.py:75-99 with random_patch=True).

    frames_flat: (B, Tf, S, L) lane-padded focuser frames.
    frames_small: (B, Tg, g, g, 3) glancer frames.
    Returns total logits (B, classes) (+ batch_stats updates if mutable).
    """
    cfg = model.cfg
    b, tf = frames_flat.shape[:2]
    a_key, _ = jax.random.split(rng)

    updates = {}
    cur = dict(variables)

    def apply(method, *args):
        # thread collections between applies: a flax mutable apply returns
        # the FULL collection, so a later apply's stale copy would clobber
        # an earlier update (see gfv.forward_random)
        nonlocal updates, cur
        if mutable:
            out, upd = model.apply(cur, *args, method=method,
                                   mutable=mutable, rngs=rngs)
            for k, v in dict(upd).items():
                updates[k] = dict(v)
                cur = {**cur, k: dict(v)}
            return out
        return model.apply(cur, *args, method=method, rngs=rngs)

    # glancer frozen in stage 1 (reference gfv_net.py:82-84 no_grad)
    _, global_logits = model.apply(
        variables, frames_small, False, method=GFV.glance_logits
    )
    global_logits = jax.lax.stop_gradient(global_logits)

    actions = random_patch_actions(a_key, (b, tf))
    patches = extract_for_frames(
        frames_flat, actions, cfg.image_size, cfg.patch_size, impl=impl
    )
    feats = apply(GFV.focus, patches, train)
    feats = feats.reshape(b, tf, -1)
    local_logits = apply(GFV.classify_frame_logits, feats, train)
    total = sum_consensus(global_logits, local_logits, cfg.with_glancer)
    return (total, updates) if mutable else total


def inference_sthsth(
    model: GFV, variables, frames_flat: jax.Array, frames_small: jax.Array,
    rng: jax.Array, impl: str = "auto", fused: str = "auto",
) -> jax.Array:
    """Deployment forward: greedy per-division policy, ONE batched focuser
    call, sum consensus (replaces the reference's per-division accumulate-
    and-rerun loop, sthsth/evaluate.py:165-226 + gfv_net.py:190-225).
    ``fused='on'`` routes both TSM backbones through the fused Pallas
    block kernels (models/fused_inference.py; 'auto' stays on the faster
    XLA path — see ops/fused_blocks.py)."""
    from adafocus_tpu.models.fused_inference import (
        fused_enabled, fused_focus, fused_glance_logits,
    )

    cfg = model.cfg
    b, tf = frames_flat.shape[:2]
    use_fused = fused_enabled(fused)
    if use_fused:
        fmap, global_logits = fused_glance_logits(
            model, variables, frames_small)
        roll = model.apply(
            variables, fmap, rng, "greedy", False,
            method=GFV.policy_rollout_div,
        )
    else:
        _, global_logits, roll = glance_division_rollout(
            model, variables, frames_small, rng, mode="greedy"
        )
    actions = actions_per_frame(roll["actions"], tf)
    patches = extract_for_frames(
        frames_flat, actions, cfg.image_size, cfg.patch_size, impl=impl
    )
    if use_fused:
        feats = fused_focus(model, variables, patches).reshape(b, tf, -1)
        local_logits = model.apply(
            variables, feats, False, method=GFV.classify_frame_logits)
    else:
        local_logits = local_frame_logits(model, variables, patches, b)
    return sum_consensus(global_logits, local_logits, cfg.with_glancer)


def inference_sthsth_with_actions(
    model: GFV, variables, frames_flat: jax.Array, frames_small: jax.Array,
    actions_div: jax.Array, impl: str = "auto",
) -> jax.Array:
    """Deployment forward with EXTERNALLY SUPPLIED per-division actions
    (B, D, 2) — bypasses the policy. Powers the random/center/oracle
    policy-quality baselines (the reference has random only:
    sthsth/models/gfv_net.py:415-419)."""
    cfg = model.cfg
    b, tf = frames_flat.shape[:2]
    _, global_logits = model.apply(
        variables, frames_small, False, method=GFV.glance_logits
    )
    actions = actions_per_frame(actions_div, tf)
    patches = extract_for_frames(
        frames_flat, actions, cfg.image_size, cfg.patch_size, impl=impl
    )
    local_logits = local_frame_logits(model, variables, patches, b)
    return sum_consensus(global_logits, local_logits, cfg.with_glancer)


def divisional_confidences(
    local_logits: jax.Array,
    random_logits: jax.Array,
    global_logits: Optional[jax.Array],
    labels: jax.Array,
    video_div: int,
    with_glancer: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Per-division target-class confidences for PPO rewards.

    Incremental equivalent of action_stage2's accumulate-and-rerun
    (gfv_net.py:162-188): after division d the policy logit is the mean of
    per-frame local logits over divisions <= d (+ global consensus), and the
    baseline swaps division d's frames for random-patch frames.

    local_logits / random_logits: (B, Tf, C) per-frame logits from policy
    patches / random patches. Returns (conf_policy, conf_baseline), (B, D).
    """
    b, tf, c = local_logits.shape
    f = tf // video_div
    blocks_pol = local_logits.reshape(b, video_div, f, c).sum(axis=2)
    blocks_rnd = random_logits.reshape(b, video_div, f, c).sum(axis=2)
    cum_pol = jnp.cumsum(blocks_pol, axis=1)            # (B, D, C)
    denom = (jnp.arange(1, video_div + 1) * f).reshape(1, -1, 1)
    total_pol = cum_pol / denom
    total_base = (cum_pol - blocks_pol + blocks_rnd) / denom
    if with_glancer and global_logits is not None:
        g = avg_consensus(global_logits)[:, None, :]    # (B, 1, C)
        total_pol = total_pol + g
        total_base = total_base + g

    def conf(logits):
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(
            probs, labels[:, None, None].astype(jnp.int32), axis=-1
        )[..., 0]

    return conf(total_pol), conf(total_base)
