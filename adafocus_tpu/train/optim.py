"""Per-stage optimizers: SGD momentum, split backbone/fc learning rates,
cosine or step schedules, stage-wise component freezing.

Parity with the reference recipe:
  * SGD(momentum, weight_decay), two LR groups — backbone_lr for CNN
    backbones, fc_lr for the classifier head
    (actnet/main_dist.py:163-188 in /root/reference);
  * cos: 0.5*lr*(1+cos(pi*epoch/epochs)); step: 0.1^(#milestones passed)
    (actnet/basic_tools/utils.py:130-161);
  * stage freeze matrix (actnet/main_dist.py:163-188 + gfv_net.py:64-82):
      stage 0: glancer+focuser @ backbone_lr, classifier @ fc_lr
      stage 1: focuser @ backbone_lr, classifier @ fc_lr (glancer frozen)
      stage 2: policy only (PPO's own Adam — see adafocus_tpu.ppo)
      stage 3: classifier only @ fc_lr

The reference freezes modules by .eval()/requires_grad side effects; here
freezing is an explicit optax.multi_transform label map with set_to_zero,
so the freeze matrix is data, not mutable module state.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    backbone_lr: float = 0.01
    fc_lr: float = 0.005
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_type: str = "cos"        # 'cos' | 'step'
    lr_steps: tuple = (30, 60)  # epoch milestones for 'step'
    epochs: int = 50
    steps_per_epoch: int = 1000
    tsn_policies: bool = False  # per-param-type focuser LR groups (TSM)


# component-label matrix per stage: param top-level key -> group.
# 'selector' is the AdaFocus+ frame-selection head (present only when
# frame_budget > 0); unknown components default to frozen.
_STAGE_LABELS: Dict[int, Dict[str, str]] = {
    0: {"glancer": "backbone", "focuser": "backbone", "classifier": "fc",
        "policy": "frozen", "selector": "fc"},
    1: {"glancer": "frozen", "focuser": "backbone", "classifier": "fc",
        "policy": "frozen", "selector": "fc"},
    3: {"glancer": "frozen", "focuser": "frozen", "classifier": "fc",
        "policy": "frozen", "selector": "fc"},
}


def stage_trainable(stage: int) -> Dict[str, str]:
    if stage not in _STAGE_LABELS:
        raise ValueError(f"stage {stage} has no supervised optimizer "
                         "(stage 2 trains via PPO)")
    return _STAGE_LABELS[stage]


def lr_schedule(base_lr: float, cfg: OptimConfig) -> optax.Schedule:
    """Step-granular schedule matching the reference's epoch-granular math."""
    spe = max(cfg.steps_per_epoch, 1)
    if cfg.lr_type == "cos":
        def sched(step):
            epoch = step / spe
            return 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * epoch / cfg.epochs))
        return sched
    if cfg.lr_type == "step":
        milestones = jnp.asarray(cfg.lr_steps)

        def sched(step):
            epoch = step / spe
            decay = 0.1 ** jnp.sum(epoch >= milestones)
            return base_lr * decay
        return sched
    raise ValueError(f"unknown lr_type {cfg.lr_type}")


def _sgd(base_lr: float, cfg: OptimConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(lr_schedule(base_lr, cfg), momentum=cfg.momentum),
    )


def _label_partial_bn(tree, base: str, in_stem: bool = False):
    """Label every non-stem BatchNorm's scale/bias 'frozen' (TSM partialBN:
    reference sthsth/models/tsn.py:146-162 freezes BN affine params beyond
    the first BN via requires_grad=False)."""
    if not isinstance(tree, dict):
        return base
    out = {}
    for k, v in tree.items():
        if k == "bn" and not in_stem:
            out[k] = jax.tree.map(lambda _: "frozen", v)
        else:
            out[k] = _label_partial_bn(v, base, in_stem or k == "stem")
    return out


# TSN per-param-type groups (reference sthsth/models/tsn.py:197-213), as
# (lr_mult_rgb, lr_mult_flow, decay_mult) over backbone_lr / weight_decay.
# Every sth-sth stage builds its focuser optimizer from get_optim_policies
# (e.g. stage1.py:192-196); modality here is always RGB (Flow multipliers
# kept as data for completeness).
_TSN_GROUPS = {
    "first_conv_weight": (1.0, 5.0, 1.0),
    "first_conv_bias": (2.0, 10.0, 0.0),
    "normal_weight": (1.0, 1.0, 1.0),
    "normal_bias": (2.0, 2.0, 0.0),
    "bn": (1.0, 1.0, 0.0),
}


def tsn_param_labels(tree, partial_bn: bool = False):
    """Reference ``get_optim_policies`` (sthsth/models/tsn.py:167-213) as a
    label tree over a flax (TSM-)ResNet: the stem conv is the 'first conv';
    BN affine params form their own no-decay group; biases get the 2x-lr
    no-decay group. With ``partial_bn`` every non-stem BN is excluded from
    the bn group (requires_grad=False in the reference's train(),
    tsn.py:146-162) -> 'frozen'. The focuser's vestigial fc head (the
    reference strips it via children()[:-1], stage1.py:144) labels as a
    normal weight/bias."""

    def walk(sub, key, in_stem, in_bn):
        in_stem = in_stem or key == "stem"
        in_bn = in_bn or key == "bn"
        if isinstance(sub, dict):
            return {k: walk(v, k, in_stem, in_bn) for k, v in sub.items()}
        if in_bn:
            if partial_bn and not in_stem:
                return "frozen"
            return "tsn_bn"
        if key == "kernel":
            return "tsn_first_conv_weight" if in_stem else "tsn_normal_weight"
        return "tsn_first_conv_bias" if in_stem else "tsn_normal_bias"

    return {k: walk(v, k, False, False) for k, v in tree.items()}


def make_stage_optimizer(
    stage: int, cfg: OptimConfig, partial_bn: bool = False,
    flow: bool = False,
) -> optax.GradientTransformation:
    """``partial_bn`` applies TSM partial-BN freezing to the focuser's
    trainable stages (statistics freezing is the model-side
    ``ResNet.partial_bn`` flag; this handles the affine params).
    ``cfg.tsn_policies`` switches the focuser from the flat backbone group
    to the reference's per-param-type LR/decay groups (tsn.py:167-213)."""
    labels = stage_trainable(stage)
    transforms = {
        "backbone": _sgd(cfg.backbone_lr, cfg),
        "fc": _sgd(cfg.fc_lr, cfg),
        "frozen": optax.set_to_zero(),
    }
    if cfg.tsn_policies:
        for name, (mult_rgb, mult_flow, decay_mult) in _TSN_GROUPS.items():
            lr_mult = mult_flow if flow else mult_rgb
            transforms["tsn_" + name] = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay * decay_mult),
                optax.sgd(lr_schedule(cfg.backbone_lr * lr_mult, cfg),
                          momentum=cfg.momentum),
            )

    def label_fn(params):
        out = {}
        for k, v in params.items():
            base = labels.get(k, "frozen")
            if k == "focuser" and base != "frozen":
                if cfg.tsn_policies:
                    out[k] = tsn_param_labels(v, partial_bn=partial_bn)
                    continue
                if partial_bn:
                    out[k] = _label_partial_bn(v, base)
                    continue
            out[k] = jax.tree.map(lambda _: base, v)
        return out

    return optax.multi_transform(transforms, label_fn)
