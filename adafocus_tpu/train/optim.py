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


def make_stage_optimizer(
    stage: int, cfg: OptimConfig, partial_bn: bool = False
) -> optax.GradientTransformation:
    """``partial_bn`` applies TSM partial-BN freezing to the focuser's
    trainable stages (statistics freezing is the model-side
    ``ResNet.partial_bn`` flag; this handles the affine params)."""
    labels = stage_trainable(stage)
    transforms = {
        "backbone": _sgd(cfg.backbone_lr, cfg),
        "fc": _sgd(cfg.fc_lr, cfg),
        "frozen": optax.set_to_zero(),
    }

    def label_fn(params):
        out = {}
        for k, v in params.items():
            base = labels.get(k, "frozen")
            if partial_bn and k == "focuser" and base != "frozen":
                out[k] = _label_partial_bn(v, base)
            else:
                out[k] = jax.tree.map(lambda _: base, v)
        return out

    return optax.multi_transform(transforms, label_fn)
