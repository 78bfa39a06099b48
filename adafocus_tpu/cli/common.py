"""Shared CLI plumbing: seeding, logging, model/loader construction, and
the jitted raw-uint8 -> model-batch preparation program.

The batch-prep fn is the on-device half of the input pipeline: one jit
program fusing augmentation, normalization, glance downsample, and the
lane-padding the patch kernel wants — the work the reference spreads over
PIL worker processes + an in-loop F.interpolate (/root/reference
actnet/main_dist.py:194-239,469).
"""

from __future__ import annotations

import os
import random
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adafocus_tpu.config import ExperimentConfig
from adafocus_tpu.data.pipeline import (
    FrameFolderSource,
    LoaderConfig,
    SyntheticVideoSource,
    VideoLoader,
)
from adafocus_tpu.data.records import VideoRecord, parse_list_file, return_dataset
from adafocus_tpu.data.transforms import (
    AugmentConfig,
    augment_eval,
    augment_eval_views,
    augment_train,
    glance_downsample,
    num_eval_views,
)
from adafocus_tpu.models.gfv import GFV
from adafocus_tpu.ops.patch import pad_for_extraction


def apply_platform(run_cfg) -> None:
    """Re-point JAX before backend init (must run before any device op).
    ``run.platform=cpu run.host_devices=8`` gives the virtual multi-chip
    CPU mesh for debugging distributed logic without hardware. Also turns
    on the persistent compilation cache (restarts skip recompiles)."""
    import adafocus_tpu

    if run_cfg.host_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{run_cfg.host_devices}"
        ).strip()
    if run_cfg.platform:
        jax.config.update("jax_platforms", run_cfg.platform)
    # after the platform override: the cache-enable decision is keyed on
    # the primary platform (CPU-primary runs stay uncached — their AOT
    # artifacts are machine-specific; see enable_compilation_cache)
    adafocus_tpu.enable_compilation_cache()
    if getattr(run_cfg, "multihost", False):
        # multi-host slice: one process per host (replaces the reference's
        # TCP rendezvous, main_dist.py:47-48,73-80). Coordinator is
        # auto-detected on TPU pods/SLURM; run.coordinator='host:port' (+
        # num_processes/process_id) gives the explicit rendezvous for
        # CPU/GPU clusters — exercised by tests/test_multihost.py.
        if getattr(run_cfg, "coordinator", ""):
            jax.distributed.initialize(
                coordinator_address=run_cfg.coordinator,
                num_processes=run_cfg.num_processes,
                process_id=run_cfg.process_id,
            )
        else:
            jax.distributed.initialize()


def set_all_seeds(seed: int) -> jax.Array:
    """Python/numpy seeding + the root jax key (reference
    basic_tools/utils.py:10-14; jax needs explicit keys, so return one)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class Logger:
    """stdout + append-to-file logging (the reference's rank-0 ``logs``
    list flushed to training.log, main_dist.py:301-304)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def __call__(self, msg: str) -> None:
        print(msg, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(msg + "\n")


def build_model(cfg: ExperimentConfig) -> GFV:
    return GFV(cfg.model)


def synthetic_records(n: int, num_classes: int, frames: int = 64):
    return [
        VideoRecord(f"synthetic{i}", frames, (i % num_classes, -1, -1))
        for i in range(n)
    ]


def build_loader(cfg: ExperimentConfig, train: bool) -> VideoLoader:
    run = cfg.run
    loader_cfg = cfg.loader
    if train:
        mode = "train"
    elif loader_cfg.dense_sample or loader_cfg.twice_sample:
        mode = "test"  # dense/twice multi-clip sampling (test-time)
    else:
        mode = "val"
    # per-host dataset sharding on multi-host slices (the reference's
    # DistributedSampler, main_dist.py:234): each host reads a disjoint
    # record subset; defaults follow the JAX process topology unless the
    # config pins them explicitly.
    host_id = loader_cfg.host_id or jax.process_index()
    num_hosts = (loader_cfg.num_hosts if loader_cfg.num_hosts > 1
                 else jax.process_count())
    loader_cfg = LoaderConfig(
        **{**loader_cfg.__dict__, "mode": mode,
           "multi_label": run.dataset in ("actnet", "fcvid"),
           "drop_last": train,
           "host_id": host_id, "num_hosts": num_hosts}
    )
    if run.synthetic_data:
        # synthetic labels must live in the model's class space
        records = synthetic_records(run.synthetic_videos, cfg.model.num_classes)
        source = SyntheticVideoSource()
    else:
        spec, frames_root, list_file = return_dataset(
            run.dataset, run.data_root, train=train
        )
        records = parse_list_file(list_file, dataset=run.dataset)
        source = FrameFolderSource(frames_root, spec.image_tmpl)
    loader = VideoLoader(records, source, loader_cfg)
    if loader_cfg.cache:
        from adafocus_tpu.data.cache import maybe_cache

        loader = maybe_cache(loader, loader_cfg.cache)
    return loader


def make_batch_prep(cfg: ExperimentConfig, train: bool) -> Callable:
    """jit program: raw uint8 batch -> {frames_flat, frames_small, labels}.

    actnet: one frame stream feeds both glancer (downsampled) and focuser
    (full-res, lane-padded). sthsth: dual-rate streams.
    """
    model_cfg = cfg.model
    aug = cfg.augment
    family = cfg.run.family

    n_views = 1 if train else num_eval_views(aug)

    def expand_views(frames):
        """(B,T,H,W,C) -> (B*V, T, S, S, C): test-time multi-crop views
        (GroupOverSample/GroupFullResSample), view-minor so validate()'s
        per-video softmax consensus groups them with the clips."""
        out = augment_eval_views(frames, aug)
        return out.reshape((-1,) + out.shape[2:])

    def prep(raw_frames, raw_focuser, labels, rng):
        k1, k2 = jax.random.split(rng)
        if train:
            big = augment_train(raw_frames, k1, aug)
        elif n_views > 1:
            big = expand_views(raw_frames)
        else:
            big = augment_eval(raw_frames, aug)
        small = glance_downsample(big, model_cfg.glance_size)
        if family == "sthsth":
            if train:
                focus = augment_train(raw_focuser, k2, aug)
            elif n_views > 1:
                focus = expand_views(raw_focuser)
            else:
                focus = augment_eval(raw_focuser, aug)
        else:
            focus = big
        b, t = focus.shape[:2]
        flat = pad_for_extraction(
            focus.reshape((b * t,) + focus.shape[2:]).astype(model_cfg.dtype)
        )
        return {
            "frames_flat": flat.reshape((b, t) + flat.shape[1:]),
            "frames_small": small.astype(model_cfg.dtype),
            "labels": labels,
        }

    prep = jax.jit(prep)

    def split_clips(frames: "jnp.ndarray", t_model: int):
        """(B, k*T, ...) test-time multi-clip sampling (dense/twice,
        reference dataset.py:154-173) -> (B*k, T, ...) clips."""
        b, t_total = frames.shape[:2]
        k = t_total // t_model
        if k <= 1:
            return frames, 1
        return frames.reshape((b * k, t_model) + frames.shape[2:]), k

    def run(raw: dict, rng: jax.Array):
        labels = jnp.asarray(raw["labels"])
        labels_train = labels[:, 0] if labels.ndim == 2 else labels
        g_frames = jnp.asarray(raw["frames"])
        f_frames = jnp.asarray(raw.get("frames_focuser", raw["frames"]))
        k = 1
        if not train:
            g_frames, k = split_clips(g_frames, model_cfg.num_frames)
            f_frames, kf = split_clips(f_frames, model_cfg.t_focuser)
            if kf != k:
                raise ValueError(
                    f"clip counts differ between streams: {k} vs {kf}")
            k *= n_views  # crop views consensus-average like clips
            if k > 1:
                labels_train = jnp.repeat(labels_train, k)
        batch = prep(g_frames, f_frames, labels_train.astype(jnp.int32), rng)
        return batch, np.asarray(labels), k

    return run


class ProgressMeter:
    """Per-epoch progress lines (reference ops/utils.py ProgressMeter)."""

    def __init__(self, num_batches: int, prefix: str = ""):
        self.num_batches = num_batches
        self.prefix = prefix
        self.t0 = time.time()

    def line(self, batch_idx: int, metrics: dict) -> str:
        elapsed = time.time() - self.t0
        body = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
        return (f"{self.prefix}[{batch_idx + 1}/{self.num_batches}] "
                f"t={elapsed:.1f}s {body}")
