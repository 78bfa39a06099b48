"""AdaFocus+ — adaptive temporal frame selection (TPU-native redesign).

The reference's only trace of temporal skipping is the vestigial AR-Net
module (/root/reference sthsth/ops/models_ada.py:19-340: a lite policy
backbone + gumbel-softmax over resolution/skip actions, applied in a
per-timestep Python loop with a host-side ``remain_skip_vector``) — dead
code, but the capability defines the published "AdaFocus+" efficiency
frontier (BASELINE.md: ~73.3->76.9 mAP at ~15->48 GFLOPs).

TPU-first redesign — budgeted top-K selection instead of dynamic skips,
because XLA wants static shapes and the MXU wants one dense batch:

  1. the glancer scans all T frames (cheap, as in base AdaFocus);
  2. a recurrent FrameSelector scores each frame from pooled glance
     features;
  3. Gumbel-perturbed ``top_k`` picks a fixed budget of K frames
     (deterministic top-k at eval) — K/T directly scales focuser FLOPs;
  4. ONE gather -> spatial policy over the K selected frames -> ONE
     batched focuser call on (B*K) patches;
  5. local features scatter back into the T-length sequence via a one-hot
     einsum (MXU-friendly), multiplied by a straight-through mask so the
     selector trains end-to-end with the classification loss — replacing
     AR-Net's gumbel-softmax estimator without its per-step host loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adafocus_tpu.models.gru import GRUCell


class FrameSelector(nn.Module):
    """Pooled glance features -> per-frame relevance logits.

    Recurrent (GRU over time) like AR-Net's policy LSTM
    (models_ada.py:98-126), but scored in one batched pass via the
    hoisted-projection scan.
    """

    hidden_dim: int = 256
    in_dim: int = 1280
    dtype: any = None

    def setup(self):
        self.gru = GRUCell(hidden_size=self.hidden_dim,
                           in_features=self.in_dim, dtype=self.dtype)
        self.score = nn.Dense(1, dtype=self.dtype)

    def __call__(self, pooled: jax.Array) -> jax.Array:
        """(B, T, D) -> frame scores (B, T), f32."""
        b = pooled.shape[0]
        xs = jnp.swapaxes(pooled, 0, 1)
        h0 = jnp.zeros((b, self.hidden_dim), self.dtype or pooled.dtype)
        _, hs = self.gru.scan_time(h0, xs)            # (T, B, H)
        return jnp.swapaxes(self.score(hs)[..., 0], 0, 1).astype(jnp.float32)


class SelectorActorCritic(nn.Module):
    """Joint-RL temporal policy (cfg.plus_rl): a sequential actor-critic
    over K frame-selection slots.

    Each slot scores the not-yet-taken frames with additive attention
    between per-frame glance features and the GRU carry (the selection
    history), samples one frame from the masked categorical, and feeds the
    chosen frame's features back into the GRU — frame selection as an RL
    action space (the AR-Net hint, sthsth/ops/models_ada.py:98-126, made a
    first-class PPO agent instead of a gumbel-softmax estimator). The K-slot
    loop is unrolled: K <= 16 and actions feed the recurrence, so there is
    no hoisted-projection fast path like the spatial policy's.
    """

    hidden_dim: int = 256
    attn_dim: int = 128
    in_dim: int = 1280
    dtype: any = None

    def setup(self):
        self.gru = GRUCell(hidden_size=self.hidden_dim,
                           in_features=self.in_dim, dtype=self.dtype)
        self.key_proj = nn.Dense(self.attn_dim, dtype=self.dtype)
        self.query_proj = nn.Dense(self.attn_dim, dtype=self.dtype)
        self.score = nn.Dense(1, dtype=self.dtype)
        self.critic = nn.Dense(1, dtype=self.dtype)

    def rollout(
        self, pooled: jax.Array, k: int, rng: jax.Array,
        mode: str = "sample", actions: jax.Array = None,
    ) -> dict:
        """K-slot selection rollout / replay.

        pooled: (B, T, D) pooled glance features. mode: 'sample'
        (behavior rollout) | 'top' (greedy eval). actions: (B, K) int32 to
        REPLAY a stored trajectory under current params (PPO evaluate).
        Returns {'idx', 'logprob', 'value', 'entropy'}, each (B, K) in slot
        (pick) order; logprob/value/entropy f32.
        """
        b, t, _ = pooled.shape
        keys = self.key_proj(pooled)  # (B, T, A)
        h = jnp.zeros((b, self.hidden_dim), self.dtype or pooled.dtype)
        taken = jnp.zeros((b, t), bool)
        slot_rngs = jax.random.split(rng, k)
        outs = []
        for j in range(k):
            q = self.query_proj(h)
            e = jnp.tanh(keys + q[:, None, :])
            logits = self.score(e)[..., 0].astype(jnp.float32)  # (B, T)
            logits = jnp.where(taken, -1e9, logits)
            if actions is not None:
                idx_j = actions[:, j]
            elif mode == "sample":
                idx_j = jax.random.categorical(slot_rngs[j], logits, axis=-1)
            else:
                idx_j = jnp.argmax(logits, axis=-1)
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp_j = jnp.take_along_axis(logp_all, idx_j[:, None], axis=1)[:, 0]
            p = jax.nn.softmax(logits, axis=-1)
            ent_j = -jnp.sum(jnp.where(taken, 0.0, p * logp_all), axis=-1)
            v_j = self.critic(h)[..., 0].astype(jnp.float32)
            sel = jnp.take_along_axis(
                pooled, idx_j[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            h = self.gru(h, sel)
            taken = taken | jax.nn.one_hot(idx_j, t, dtype=bool)
            outs.append((idx_j, logp_j, v_j, ent_j))
        idx, logp, value, ent = (jnp.stack(z, axis=1) for z in zip(*outs))
        return {
            "idx": idx.astype(jnp.int32),
            "logprob": logp.astype(jnp.float32),
            "value": value.astype(jnp.float32),
            "entropy": ent.astype(jnp.float32),
        }


def random_frame_selection(rng: jax.Array, b: int, t: int, k: int) -> jax.Array:
    """Uniform K-of-T without replacement (B, K) — the stage-1 temporal
    analog of random patches when cfg.plus_rl (the selector, like the
    spatial policy, only trains in stage 2)."""
    noise = jax.random.uniform(rng, (b, t))
    _, idx = jax.lax.top_k(noise, k)
    return jnp.sort(idx, axis=-1).astype(jnp.int32)


def select_topk(
    scores: jax.Array, k: int, rng: jax.Array, mode: str = "sample"
) -> Tuple[jax.Array, jax.Array]:
    """Budgeted frame selection.

    mode='sample': Gumbel-perturbed top-k (training exploration, the
    batched analog of AR-Net's hard gumbel-softmax draws,
    models_ada.py:316-321); mode='top': deterministic top-k (eval).

    Returns (indices (B, K) sorted by time, st_mask (B, T)): st_mask is
    hard {0,1} in the forward pass with a straight-through sigmoid
    gradient, so selector scores train from the task loss.
    """
    if mode == "sample":
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, scores.shape, minval=1e-20, maxval=1.0)
        ))
        noisy = scores + g
    else:
        noisy = scores
    _, idx = jax.lax.top_k(noisy, k)
    idx = jnp.sort(idx, axis=-1)  # keep temporal order for the recurrences
    hard = jnp.zeros_like(scores).at[
        jnp.arange(scores.shape[0])[:, None], idx
    ].set(1.0)
    soft = jax.nn.sigmoid(scores)
    # parenthesized so the forward value is EXACTLY hard (soft - sg(soft)
    # is a true zero; (hard + soft) - soft would round)
    st_mask = hard + (soft - jax.lax.stop_gradient(soft))
    return idx, st_mask


def gather_frames(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-frame tensors: x (B, T, ...), idx (B, K) -> (B, K, ...)."""
    expand = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(
        x, expand.astype(jnp.int32), axis=1
    )


def scatter_frames(
    local_sel: jax.Array, idx: jax.Array, t_total: int
) -> jax.Array:
    """Scatter (B, K, D) selected-frame features back to (B, T, D) with
    zeros elsewhere — as a one-hot einsum so it lowers to one MXU matmul
    instead of a scatter."""
    onehot = jax.nn.one_hot(idx, t_total, dtype=local_sel.dtype)  # (B, K, T)
    return jnp.einsum("bkt,bkd->btd", onehot, local_sel)


# ---------------------------------------------------------------------------
# Composition (GFV with cfg.frame_budget > 0)
# ---------------------------------------------------------------------------


def forward_plus(
    model, variables, frames_flat: jax.Array, frames_small: jax.Array,
    rng: jax.Array, train: bool = True, patch_mode: str = "random",
    impl: str = "auto", mutable=False, rngs=None, freeze_glance: bool = False,
):
    """AdaFocus+ forward: glance all T -> select K frames -> focus only
    those -> classify the full T-length sequence (unselected steps carry
    glance features only).

    patch_mode: 'random' (stage-1 joint training) or 'policy' (greedy
    spatial policy — stage-3/eval).
    Returns per-step logits (B, T, C) and aux dict (+ batch_stats updates
    when ``mutable``).
    """
    from adafocus_tpu.models.gfv import GFV, extract_for_frames
    from adafocus_tpu.ops.patch import random_patch_actions

    cfg = model.cfg
    b, t = frames_small.shape[:2]
    k = cfg.frame_budget
    sel_key, a_key, rng = jax.random.split(rng, 3)

    updates = {}
    cur = dict(variables)

    def apply(method, *args, train_arg=None):
        # thread collections between applies: a flax mutable apply returns
        # the FULL collection, so a later apply's stale copy would clobber
        # an earlier update (see gfv.forward_random)
        nonlocal updates, cur
        call_args = args if train_arg is None else args + (train_arg,)
        if mutable:
            out, upd = model.apply(cur, *call_args, method=method,
                                   mutable=mutable, rngs=rngs)
            for kk, vv in dict(upd).items():
                updates[kk] = dict(vv)
                cur = {**cur, kk: dict(vv)}
            return out
        return model.apply(cur, *call_args, method=method, rngs=rngs)

    # phase 1: glance everything (frozen in stages 1/3)
    fmap, pooled = apply(
        GFV.glance, frames_small, train_arg=train and not freeze_glance
    )
    if freeze_glance:
        fmap = jax.lax.stop_gradient(fmap)
        pooled = jax.lax.stop_gradient(pooled)

    # phase 1.5: temporal selection
    if cfg.plus_rl:
        # joint-RL mode: the selector is a PPO agent (stage 2); stage 1
        # uses random frames (the temporal analog of random patches) and
        # stage 3/eval replays the greedy sequential rollout in pick order
        # (the order the selector's MDP was trained in).
        if patch_mode == "random":
            idx = random_frame_selection(sel_key, b, t, k)
        else:
            sel_roll = apply(GFV.select_rollout, pooled, sel_key, "top")
            idx = sel_roll["idx"]
        scores = None
        st_mask = jnp.zeros((b, t)).at[
            jnp.arange(b)[:, None], idx
        ].set(1.0)  # hard mask; the selector trains via PPO, not ST grads
    else:
        scores = apply(GFV.frame_scores, pooled)
        idx, st_mask = select_topk(scores, k, sel_key,
                                   "sample" if train else "top")
    fmap_sel = gather_frames(fmap, idx)
    flat_sel = gather_frames(frames_flat, idx)

    # phase 2: spatial actions on the selected frames
    if patch_mode == "random":
        actions = random_patch_actions(a_key, (b, k))
    else:
        roll = apply(GFV.policy_rollout, fmap_sel, a_key, "greedy", False)
        actions = jax.lax.stop_gradient(roll["actions"])

    # phase 3: one batched focus on (B*K) patches
    patches = extract_for_frames(
        flat_sel, actions, cfg.image_size, cfg.patch_size, impl=impl
    )
    local_sel = apply(GFV.focus, patches, train_arg=train).reshape(b, k, -1)

    # scatter back to T steps; straight-through mask trains the selector
    local_full = scatter_frames(local_sel, idx, t) * st_mask[..., None].astype(
        local_sel.dtype)

    fused = jnp.concatenate([pooled, local_full], axis=-1).astype(cfg.dtype)
    logits = apply(GFV.classify_seq, fused)
    aux = {"frame_idx": idx, "scores": scores}
    if mutable:
        return logits, aux, updates
    return logits, aux


def inference_plus(
    model, variables, frames_flat: jax.Array, frames_small: jax.Array,
    rng: jax.Array, impl: str = "auto",
) -> jax.Array:
    """Deployment forward: deterministic top-K frames, greedy spatial
    policy, one batched focuser call. (B, T, classes) per-step logits."""
    logits, _ = forward_plus(
        model, variables, frames_flat, frames_small, rng, train=False,
        patch_mode="policy", impl=impl,
    )
    return logits
