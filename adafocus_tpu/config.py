"""Experiment configuration: nested dataclasses + YAML + CLI overrides.

Replaces the reference's hydra/OmegaConf flat namespaces
(/root/reference actnet/conf/default.yaml, sthsth/conf/stage*.yaml,
actnet/main_dist.py:34-35): a typed ``ExperimentConfig`` tree, loadable
from YAML, overridable with ``section.key=value`` CLI args, echoed at
startup like the reference's ``basic_tools.start()``
(actnet/basic_tools/__init__.py:9-20).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp

from adafocus_tpu.data.pipeline import LoaderConfig
from adafocus_tpu.data.transforms import AugmentConfig
from adafocus_tpu.models.gfv import GFVConfig
from adafocus_tpu.ppo.core import PPOConfig
from adafocus_tpu.train.optim import OptimConfig

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Driver-level knobs (the reference's trainer flags)."""

    family: str = "actnet"        # 'actnet' | 'sthsth'
    stage: int = 1                # 0..3; eval uses the eval entry
    dataset: str = "actnet"
    data_root: str = ""
    synthetic_data: bool = False  # procedural frames (no dataset on disk)
    synthetic_videos: int = 64
    epochs: int = 50
    eval_freq: int = 1
    ckpt_dir: str = "checkpoints"
    resume: str = ""              # ckpt dir to fully resume from
    warm_start: str = ""          # previous stage's ckpt dir
    seed: int = 1007
    log_file: str = "training.log"
    print_freq: int = 20
    platform: str = ""            # '' = default backend; 'cpu'/'tpu' forces
    host_devices: int = 0         # >0: virtual CPU device count (debugging)
    anytime_eval: bool = False    # report per-timestep mAP (GRU head only)
    multihost: bool = False       # jax.distributed.initialize() (TPU pods)
    coordinator: str = ""         # 'host:port' explicit rendezvous; '' =
                                  # autodetect (TPU pod metadata / SLURM)
    num_processes: int = 0        # with coordinator: total process count
    process_id: int = -1          # with coordinator: this process's rank
    visualize_patches: int = 0    # >0: save a patch grid of N videos at eval
    eval_policy: str = "learned"  # evaluate CLI patch-policy override:
                                  # 'learned' | 'random' | 'center' |
                                  # 'oracle' (needs oracle_gt)
    oracle_gt: str = ""           # gt.npz with per-video target tracks
                                  # (data/miniact.py layout)
    quantize: str = ""            # 'int8': PTQ serving eval (evaluate CLI;
                                  # calibrates on quantize_batches val
                                  # batches, then runs the int8 forward)
    quantize_batches: int = 4     # calibration batches for run.quantize
    quantize_heads: bool = False  # also quantize policy/classifier heads:
                                  # measured throughput-neutral but
                                  # −4.5 top-1 (PERF.md round 4) — the
                                  # serving default keeps heads bf16


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    run: RunConfig = RunConfig()
    model: GFVConfig = GFVConfig()
    optim: OptimConfig = OptimConfig()
    ppo: PPOConfig = PPOConfig()
    loader: LoaderConfig = LoaderConfig()
    augment: AugmentConfig = AugmentConfig()


def _coerce(value: str, target: Any) -> Any:
    """Parse a CLI string against the current field value's type."""
    if isinstance(target, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(target, int):
        return int(value)
    if isinstance(target, float):
        return float(value)
    if isinstance(target, tuple):
        parts = [p for p in value.strip("()[]").split(",") if p]
        elem = target[0] if target else 0
        return tuple(_coerce(p.strip(), elem) for p in parts)
    if target is jnp.bfloat16 or target is jnp.float32:
        return _DTYPES[value]
    return value


def _replace_path(cfg: ExperimentConfig, dotted: str, value: str) -> ExperimentConfig:
    section, _, field = dotted.partition(".")
    if not field:
        raise ValueError(f"override '{dotted}' must be section.key=value")
    sub = getattr(cfg, section)
    current = getattr(sub, field)
    new_sub = dataclasses.replace(sub, **{field: _coerce(value, current)})
    return dataclasses.replace(cfg, **{section: new_sub})


def apply_overrides(cfg: ExperimentConfig, overrides: Sequence[str]) -> ExperimentConfig:
    for ov in overrides:
        key, _, value = ov.partition("=")
        cfg = _replace_path(cfg, key.strip(), value.strip())
    return cfg


def _from_dict(cfg: ExperimentConfig, tree: Dict[str, Any]) -> ExperimentConfig:
    for section, fields in tree.items():
        sub = getattr(cfg, section)
        kwargs = {}
        for k, v in fields.items():
            current = getattr(sub, k)
            if isinstance(v, str) and not isinstance(current, str):
                v = _coerce(v, current)
            elif isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
        cfg = dataclasses.replace(cfg, **{section: dataclasses.replace(sub, **kwargs)})
    return cfg


def load_config(
    yaml_path: Optional[str] = None, overrides: Sequence[str] = ()
) -> ExperimentConfig:
    cfg = ExperimentConfig()
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            tree = yaml.safe_load(f) or {}
        cfg = _from_dict(cfg, tree)
    cfg = apply_overrides(cfg, overrides)
    return sync_derived(cfg)


def sync_derived(cfg: ExperimentConfig) -> ExperimentConfig:
    """Keep cross-section invariants: loader segment counts and augment
    input size follow the model config; sth-sth disables flip (label
    semantics: 'pushing left to right' flips meaning — reference
    gfv_net.py get_augmentation flip=False for sth-sth)."""
    loader = dataclasses.replace(
        cfg.loader,
        num_segments=cfg.model.num_frames,
        num_segments_focuser=(cfg.model.num_frames_focuser
                              if cfg.model.num_frames_focuser else 0),
        seed=cfg.run.seed,
    )
    augment = dataclasses.replace(
        cfg.augment,
        input_size=cfg.model.image_size,
        flip=cfg.augment.flip and cfg.run.family != "sthsth",
    )
    return dataclasses.replace(cfg, loader=loader, augment=augment)


def echo(cfg: ExperimentConfig) -> str:
    """Resolved-config dump (the reference's start() banner)."""

    def enc(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        return str(o)

    lines = ["=" * 12 + " experiment config " + "=" * 12]
    for f in dataclasses.fields(cfg):
        sub = getattr(cfg, f.name)
        d = {k: (str(v) if not isinstance(
            v, (int, float, bool, str, tuple, list)) else v)
            for k, v in dataclasses.asdict(sub).items()}
        lines.append(f"[{f.name}] " + json.dumps(d, default=enc))
    lines.append("=" * 43)
    return "\n".join(lines)
