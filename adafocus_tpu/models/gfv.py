"""GFV — the Glance-Focus-Vision top model (TPU-native redesign).

Capability parity with the reference's GFV top module
(actnet/models/gfv_net.py:13-228 and sthsth/models/gfv_net.py:16-225 in
/root/reference): a MobileNetV2 glancer over downsampled frames, a recurrent
actor-critic policy choosing one patch per frame (or per video division), a
ResNet-50 focuser over the selected patches, and a GRU / consensus head.

The composition is *not* the reference's per-timestep module calls. On TPU
everything is one jit program built from three phases (the paper's offline
parallelism trick — /root/reference/README.md:30 — applied to training too):

  phase 1  glance:   (B*T) downsampled frames through MobileNetV2, batched.
  phase 2  policy:   lax.scan of the recurrent actor-critic over T (cheap:
                     1x1 conv + GRU per step) -> all T actions.
  phase 3  focus:    ONE batched (B*T) patch-extraction (Pallas kernel) +
                     ResNet-50 call at full MXU utilization, then the
                     classifier scan / consensus.

This is exact (not an approximation): the policy state depends only on
glance features (reference ppo.py:67-96 — its GRU sees the encoded feature
map, never focuser outputs), so the sequential interleaving of the
reference's ``one_step_act`` loop (actnet/models/gfv_net.py:160-210) carries
no information the two-phase program loses. It also removes the reference's
per-sample host syncs in patch cropping and its single-GPU restriction for
policy training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from adafocus_tpu.models.classifiers import (
    ConsensusHead,
    LinearClassifier,
    RecurrentClassifier,
    avg_consensus,
)
from adafocus_tpu.models.mobilenet import MobileNetV2
from adafocus_tpu.models.policy import ActorCritic, sample_rollout
from adafocus_tpu.models.resnet import resnet50
from adafocus_tpu.ops.patch import (
    extract_patches,
    extract_patches_flat,
    pad_for_extraction,
    patch_offsets,
    random_patch_actions,
)


@dataclasses.dataclass(frozen=True)
class GFVConfig:
    """Static model configuration (the reference's hydra keys that shape the
    program: actnet/conf/default.yaml)."""

    num_classes: int = 200
    num_frames: int = 16          # T (glancer frames; actnet uses one rate)
    num_frames_focuser: int = 0   # sth-sth dual-rate; 0 = same as num_frames
    image_size: int = 224
    glance_size: int = 224  # reference recipes glance at full 224^2
                            # (actnet/conf/default.yaml:46, sthsth
                            # train_stage*.sh); 96 is a cheaper non-default
    patch_size: int = 96
    action_dim: int = 49
    hidden_dim: int = 1024        # classifier GRU hidden
    policy_hidden: int = 1024
    classifier: str = "gru"       # 'gru' | 'linear' | 'consensus'
    continuous_policy: bool = False
    action_std: float = 0.25
    policy_conv: bool = True
    policy_bn: bool = False
    policy_channels: int = 32     # state-encoder 1x1-conv width (reference
                                  # actnet/models/ppo.py:33 uses 32; the
                                  # sth-sth encoder uses 64 + BN,
                                  # sthsth/models/ppo.py:33-44)
    tsm: bool = False             # sth-sth temporal-shift variant
    video_div: int = 1            # sth-sth: one action per division
    with_glancer: bool = True     # sth-sth: add glancer-logit consensus
    dropout: float = 0.5          # sth-sth local-head dropout
    frame_budget: int = 0         # AdaFocus+: focuser sees only K of T
    selector_hidden: int = 256    # AdaFocus+ frame-selector GRU width
    plus_rl: bool = False         # AdaFocus+: joint temporal+spatial PPO
                                  # (sequential selector actor-critic)
                                  # instead of the ST-gumbel selector
    partial_bn: bool = False      # TSM partial-BN freezing on the focuser
    remat: bool = False           # per-block rematerialization: trade ~1/3
                                  # extra backward FLOPs for O(1-block)
                                  # residual memory, so large train batches
                                  # coexist with an HBM-resident dataset
                                  # cache (data/cache.py device mode)
    dtype: Any = jnp.bfloat16     # compute dtype (params stay f32)

    @property
    def t_focuser(self) -> int:
        return self.num_frames_focuser or self.num_frames

    @property
    def glance_dim(self) -> int:
        return 1280

    @property
    def focus_dim(self) -> int:
        return 2048

    @property
    def fused_dim(self) -> int:
        return self.glance_dim + self.focus_dim


class GFV(nn.Module):
    """Parameter container + per-phase methods. Compose phases with the
    pure functions below (``forward_random``, ``inference``, ...)."""

    cfg: GFVConfig

    def setup(self):
        cfg = self.cfg
        self.glancer = MobileNetV2(
            num_classes=cfg.num_classes,
            dtype=cfg.dtype,
            n_frames=cfg.num_frames if cfg.tsm else 0,
            remat=cfg.remat,
        )
        self.focuser = resnet50(
            num_classes=cfg.num_classes,
            dtype=cfg.dtype,
            n_frames=cfg.t_focuser if cfg.tsm else 0,
            partial_bn=cfg.partial_bn,
            remat=cfg.remat,
        )
        self.policy = ActorCritic(
            action_dim=cfg.action_dim,
            hidden_dim=cfg.policy_hidden,
            continuous=cfg.continuous_policy,
            action_std=cfg.action_std,
            encoder_conv=cfg.policy_conv,
            encoder_channels=cfg.policy_channels,
            encoder_bn=cfg.policy_bn,
            dtype=cfg.dtype,
        )
        if cfg.classifier == "gru":
            self.classifier = RecurrentClassifier(
                num_classes=cfg.num_classes, hidden_dim=cfg.hidden_dim,
                in_dim=cfg.fused_dim, dtype=cfg.dtype,
            )
        elif cfg.classifier == "linear":
            self.classifier = LinearClassifier(
                num_classes=cfg.num_classes, dtype=cfg.dtype
            )
        else:  # consensus: focuser features -> dropout+FC (sth-sth head)
            self.classifier = ConsensusHead(
                num_classes=cfg.num_classes, dropout_rate=cfg.dropout,
                dtype=cfg.dtype,
            )
        if cfg.frame_budget > 0:  # AdaFocus+ temporal selection head
            if cfg.plus_rl:
                from adafocus_tpu.models.gfv_plus import SelectorActorCritic

                self.selector_ac = SelectorActorCritic(
                    hidden_dim=cfg.selector_hidden, in_dim=cfg.glance_dim,
                    dtype=cfg.dtype,
                )
            else:
                from adafocus_tpu.models.gfv_plus import FrameSelector

                self.selector = FrameSelector(
                    hidden_dim=cfg.selector_hidden, in_dim=cfg.glance_dim,
                    dtype=cfg.dtype,
                )

    # ---- phase 1: glance -------------------------------------------------

    def glance(self, frames_small: jax.Array, train: bool = False):
        """(B, T, g, g, 3) -> feature map (B, T, gh, gw, 1280), pooled
        (B, T, 1280). get_featmap parity (actnet/models/gfv_net.py:243-247)."""
        b, t = frames_small.shape[:2]
        flat = frames_small.reshape((b * t,) + frames_small.shape[2:])
        fmap, pooled = self.glancer.features(flat.astype(self.cfg.dtype), train)
        fmap = fmap.reshape((b, t) + fmap.shape[1:])
        return fmap, pooled.reshape(b, t, -1)

    def glance_logits(self, frames_small: jax.Array, train: bool = False):
        """Stage-0 glancer pretraining head; also the sth-sth global logits
        (sthsth/models/gfv_net.py:82-84)."""
        b, t = frames_small.shape[:2]
        flat = frames_small.reshape((b * t,) + frames_small.shape[2:])
        fmap, pooled = self.glancer.features(flat.astype(self.cfg.dtype), train)
        logits = self.glancer.classify(pooled, train)
        return (
            fmap.reshape((b, t) + fmap.shape[1:]),
            logits.reshape(b, t, -1),
        )

    # ---- phase 2: policy -------------------------------------------------

    def policy_rollout(
        self, fmap: jax.Array, rng: jax.Array, mode: str = "sample",
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        """Scan the recurrent policy over time.

        fmap: (B, T, gh, gw, C) glance feature maps.
        mode: 'sample' (stage-2 exploration) or 'greedy' (eval; reference
              ppo.py:94 uses argmax when not training).

        Returns dict with actions (B, T, 2) in [0,1]^2, and for discrete
        policies action_idx (B, T); plus logprob/value (B, T) and the
        encoded per-step policy inputs are recoverable from fmap.
        """
        cfg = self.cfg
        t = fmap.shape[1]
        xs = jnp.swapaxes(fmap, 0, 1)  # (T, B, gh, gw, C)
        _, actor_out, value = self.policy.rollout_states(xs, train)
        actions, idx, logprob = sample_rollout(
            actor_out, rng, mode, cfg.continuous_policy, cfg.action_dim,
            cfg.action_std,
        )
        return {
            "actions": jnp.swapaxes(actions, 0, 1).astype(jnp.float32),
            "action_idx": jnp.swapaxes(idx, 0, 1),
            "logprob": jnp.swapaxes(logprob, 0, 1).astype(jnp.float32),
            "value": jnp.swapaxes(value, 0, 1).astype(jnp.float32),
        }

    def policy_rollout_div(
        self, fmap: jax.Array, rng: jax.Array, mode: str = "sample",
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        """sth-sth rollout: ONE action per video division, the policy seeing
        the division's glance feature maps channel-stacked (reference
        action_stage2, sthsth/models/gfv_net.py:136-158: cur_global_feat_map
        viewed as (B, T/D * C, h, w)).

        fmap: (B, Tg, gh, gw, C). Returns the same dict as
        ``policy_rollout`` with the time axis = video_div.
        """
        cfg = self.cfg
        b, tg = fmap.shape[:2]
        d = cfg.video_div
        if tg % d:
            raise ValueError(f"num_frames {tg} not divisible by video_div {d}")
        gh, gw, c = fmap.shape[2:]
        stacked = jnp.moveaxis(
            fmap.reshape(b, d, tg // d, gh, gw, c), 2, 4
        ).reshape(b, d, gh, gw, (tg // d) * c)
        return self.policy_rollout(stacked, rng, mode, train)

    def frame_scores(self, pooled: jax.Array) -> jax.Array:
        """AdaFocus+ selector: pooled glance features (B, T, D) -> per-frame
        relevance scores (B, T)."""
        return self.selector(pooled)

    def select_rollout(
        self, pooled: jax.Array, rng: jax.Array, mode: str = "sample",
        actions=None,
    ):
        """AdaFocus+ joint-RL temporal policy (cfg.plus_rl): K-slot
        sequential frame selection (see gfv_plus.SelectorActorCritic)."""
        return self.selector_ac.rollout(
            pooled, self.cfg.frame_budget, rng, mode=mode, actions=actions
        )

    # ---- phase 3: focus + classify ---------------------------------------

    def focus(self, patches: jax.Array, train: bool = False) -> jax.Array:
        """(N, P, P, 3) -> (N, 2048) pooled focuser features."""
        _, pooled = self.focuser.features(patches.astype(self.cfg.dtype), train)
        return pooled

    def focus_logits(self, patches: jax.Array, train: bool = False) -> jax.Array:
        """Stage-0 focuser pretraining / sth-sth local logits."""
        return self.focuser(patches.astype(self.cfg.dtype), train)

    def classify_seq(self, fused: jax.Array) -> jax.Array:
        """(B, T, D) -> per-step logits (B, T, classes) via the GRU head."""
        return self.classifier(fused)

    def classify_linear(self, fused: jax.Array, train: bool = False) -> jax.Array:
        return self.classifier(fused, train)

    def classify_frame_logits(
        self, features: jax.Array, train: bool = False
    ) -> jax.Array:
        """sth-sth consensus head: per-frame local logits from focuser
        features (B, T, 2048) -> (B, T, classes)."""
        return self.classifier(features, train)

    def classifier_step(self, hidden: jax.Array, feature: jax.Array):
        """Single MDP step of the GRU head (reference single_forward,
        actnet/models/gfv_net.py:437-446)."""
        return self.classifier.step(hidden, feature)

    def classify_seq_with_hiddens(self, fused: jax.Array):
        """(B, T, D) -> (per-step logits, per-step GRU hiddens)."""
        return self.classifier.forward_with_hiddens(fused)

    def classifier_lookahead(self, hidden: jax.Array, feature: jax.Array):
        """One-step lookahead from a policy-trajectory hidden (reference
        test_single_forward, gfv_net.py:449-457): logits of GRU(h, feat)
        without advancing h."""
        return self.classifier.lookahead(hidden, feature)

    # ---- init path --------------------------------------------------------

    def __call__(self, frames_small: jax.Array, patches: jax.Array, rng: jax.Array):
        """Exercises every submodule once so ``init`` creates all params."""
        fmap, pooled = self.glance(frames_small)
        _ = self.glancer.classify(pooled.reshape(-1, pooled.shape[-1]))
        if self.cfg.frame_budget > 0:
            if self.cfg.plus_rl:
                _ = self.select_rollout(pooled, rng)
            else:
                _ = self.frame_scores(pooled)
        if self.cfg.classifier == "consensus":
            # sth-sth: the policy always sees division-stacked maps
            # ((Tg/D)*C channels), a different encoder shape than actnet's
            # per-frame maps — initialize exactly that one.
            roll = self.policy_rollout_div(fmap, rng, mode="sample")
        else:
            roll = self.policy_rollout(fmap, rng, mode="sample")
        local = self.focus(patches)
        _ = self.focuser.fc(local)
        b = fmap.shape[0]
        # patches are (B * t_focuser, ...); t_focuser == num_frames for actnet
        t = local.shape[0] // b
        local_bt = local.reshape(b, t, -1)
        if self.cfg.classifier == "gru":
            fused = jnp.concatenate([pooled, local_bt], axis=-1)
            out = self.classify_seq(fused)
        elif self.cfg.classifier == "linear":
            fused = jnp.concatenate([pooled, local_bt], axis=-1)
            out = self.classify_linear(fused)
        else:
            out = self.classify_frame_logits(local_bt)
        return out, roll


# ---------------------------------------------------------------------------
# Pure composition functions (the model's public forward surfaces).
# ---------------------------------------------------------------------------


def fuse_and_classify(
    model: GFV, variables, pooled: jax.Array, local: jax.Array, train: bool,
    mutable=False, rngs=None,
):
    """concat(global, local) -> classifier (the reference's feature fusion,
    actnet/models/gfv_net.py:148-149)."""
    cfg = model.cfg
    fused = jnp.concatenate([pooled, local], axis=-1).astype(cfg.dtype)
    if cfg.classifier == "gru":
        return model.apply(
            variables, fused, method=GFV.classify_seq, mutable=mutable, rngs=rngs
        )
    return model.apply(
        variables, fused, train, method=GFV.classify_linear, mutable=mutable, rngs=rngs
    )


def glance_policy_actions(
    model: GFV, variables, frames_small: jax.Array, rng: jax.Array,
    mode: str = "greedy", train: bool = False,
):
    """Phases 1+2: glance features + policy actions."""
    fmap, pooled = model.apply(
        variables, frames_small, train, method=GFV.glance,
    )
    roll = model.apply(
        variables, fmap, rng, mode, train, method=GFV.policy_rollout,
    )
    return fmap, pooled, roll


def extract_for_frames(
    frames_flat: jax.Array, actions: jax.Array, image_size: int, patch_size: int,
    channels: int = 3, impl: str = "auto",
) -> jax.Array:
    """(B, T, S, L) lane-padded frames + (B, T, 2) actions -> (B*T, P, P, C)."""
    b, t = frames_flat.shape[:2]
    offs = patch_offsets(actions.reshape(b * t, 2), image_size, patch_size)
    flat = frames_flat.reshape((b * t,) + frames_flat.shape[2:])
    if impl == "slice" or (impl == "auto" and jax.devices()[0].platform != "tpu"):
        # unpadded portable fallback expects (N, H, W, C)
        imgs = flat[..., : image_size * channels].reshape(
            b * t, frames_flat.shape[2], image_size, channels
        )
        return extract_patches(imgs, offs, patch_size, "slice")
    return extract_patches_flat(flat, offs, patch_size, channels)


def inference(
    model: GFV, variables, frames_flat: jax.Array, frames_small: jax.Array,
    rng: jax.Array, impl: str = "auto", fused: str = "auto",
) -> jax.Array:
    """Deployment forward (two-phase batched; replaces the reference's
    sequential eval loop, actnet/models/gfv_net.py:95-133).

    frames_flat: (B, T, S, L) lane-padded full-res frames.
    frames_small: (B, T, g, g, 3) downsampled frames.
    fused: backbone execution path — 'on' routes through the fused Pallas
    block kernels (models/fused_inference.py; same math, exactness-tested);
    'auto' currently resolves to the XLA/flax path, which measures faster
    (see ops/fused_blocks.py).
    Returns per-step logits (B, T, classes); the final prediction is the
    last step (GRU) — callers may also use every step for anytime eval.
    """
    from adafocus_tpu.models.fused_inference import (
        fused_enabled, fused_focus, fused_glance,
    )

    cfg = model.cfg
    b, t = frames_small.shape[:2]
    use_fused = fused_enabled(fused)
    if use_fused:
        fmap, pooled = fused_glance(model, variables, frames_small)
        roll = model.apply(
            variables, fmap, rng, "greedy", False, method=GFV.policy_rollout
        )
    else:
        fmap, pooled, roll = glance_policy_actions(
            model, variables, frames_small, rng, mode="greedy"
        )
    patches = extract_for_frames(
        frames_flat, roll["actions"], cfg.image_size, cfg.patch_size, impl=impl
    )
    if use_fused:
        local = fused_focus(model, variables, patches)
    else:
        local = model.apply(variables, patches, method=GFV.focus)
    local = local.reshape(b, t, -1)
    return fuse_and_classify(model, variables, pooled, local, train=False)


def inference_with_actions(
    model: GFV, variables, frames_flat: jax.Array, frames_small: jax.Array,
    actions: jax.Array, impl: str = "auto",
) -> jax.Array:
    """Deployment forward with EXTERNALLY SUPPLIED patch actions — the
    policy is bypassed. Powers the policy-quality baselines (random /
    center / ground-truth-oracle patches) that bracket the learned policy
    in accuracy evaluations; the reference has the random variant only
    (random_patching, actnet/models/gfv_net.py:334-336).

    actions: (B, T, 2) in [0, 1]^2. Returns per-step logits like
    ``inference``.
    """
    cfg = model.cfg
    b, t = frames_small.shape[:2]
    _, pooled = model.apply(variables, frames_small, False, method=GFV.glance)
    patches = extract_for_frames(
        frames_flat, actions, cfg.image_size, cfg.patch_size, impl=impl
    )
    local = model.apply(variables, patches, method=GFV.focus)
    local = local.reshape(b, t, -1)
    return fuse_and_classify(model, variables, pooled, local, train=False)


def forward_random(
    model: GFV, variables, frames_flat: jax.Array, frames_small: jax.Array,
    rng: jax.Array, train: bool = True, impl: str = "auto", mutable=False,
    rngs=None,
):
    """Stage-1 forward: random patches (reference random_patching,
    actnet/models/gfv_net.py:134-150 with random_patch=True)."""
    cfg = model.cfg
    b, t = frames_small.shape[:2]
    a_key, rng = jax.random.split(rng)
    actions = random_patch_actions(a_key, (b, t))

    updates = {}
    cur = dict(variables)

    def apply(fn_method, *args):
        # THREADING INVARIANT: a flax mutable apply returns the FULL
        # collection (untouched entries included), so each apply must see
        # the previous apply's result — merging stale full trees would
        # silently revert earlier updates (the stage-0 glancer-stats bug).
        nonlocal updates, cur
        if mutable:
            out, upd = model.apply(
                cur, *args, method=fn_method, mutable=mutable, rngs=rngs
            )
            for k, v in dict(upd).items():
                updates[k] = dict(v)
                cur = {**cur, k: dict(v)}
            return out
        return model.apply(cur, *args, method=fn_method, rngs=rngs)

    _, pooled = apply(GFV.glance, frames_small, train)
    patches = extract_for_frames(
        frames_flat, actions, cfg.image_size, cfg.patch_size, impl=impl
    )
    local = apply(GFV.focus, patches, train).reshape(b, t, -1)
    fused = jnp.concatenate([pooled, local], axis=-1).astype(cfg.dtype)
    if cfg.classifier == "gru":
        logits = apply(GFV.classify_seq, fused)
    else:
        logits = apply(GFV.classify_linear, fused, train)
    if mutable:
        return logits, updates
    return logits


