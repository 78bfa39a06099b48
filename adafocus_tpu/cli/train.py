"""Training entry point — all four stages, both families, one driver.

Replaces the reference entry scripts (/root/reference actnet/main_dist.py
and sthsth/stage{1,2,3}.py): ``python -m adafocus_tpu.cli.train
[--config conf.yaml] [section.key=value ...]``. Stage selection is
``run.stage`` (0..3); family is ``run.family`` ('actnet' | 'sthsth').

Where the reference forks one process per GPU (mp.spawn + DDP,
main_dist.py:53-80), this driver runs ONE process per host: with multiple
local devices the step is lifted onto a 1-D data mesh via shard_map
(gradient pmean over ICI inside the jit program); with one device it jits
plain. Stage 2 (PPO) data-parallelizes the same way — the capability the
reference explicitly lacks (main_dist.py:112-114).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adafocus_tpu.cli.common import (
    Logger,
    ProgressMeter,
    build_loader,
    build_model,
    make_batch_prep,
    set_all_seeds,
)
from adafocus_tpu.config import ExperimentConfig, echo, load_config
from adafocus_tpu.ops.metrics import (
    AverageMeter,
    mean_average_precision,
    multi_hot,
)
from adafocus_tpu.parallel.mesh import (
    make_mesh, replicate, replicate_key, shard_batch, shard_train_step,
)
from adafocus_tpu.train import checkpoint as ckpt
from adafocus_tpu.train.optim import make_stage_optimizer
from adafocus_tpu.train.stages import (
    create_train_state,
    make_eval_step,
    make_stage2_step,
    make_stage_train_step,
)
from adafocus_tpu.train.stages_sthsth import (
    make_sthsth_eval_step,
    make_sthsth_stage2_step,
    make_sthsth_train_step,
)


def build_steps(cfg: ExperimentConfig, model, tx, axis_name=None):
    """(train_step, eval_step) for the configured family/stage."""
    family, stage = cfg.run.family, cfg.run.stage
    if family == "sthsth":
        if stage == 2:
            train = make_sthsth_stage2_step(model, cfg.ppo, axis_name=axis_name)
        else:
            train = make_sthsth_train_step(model, stage, tx, axis_name=axis_name)
        return train, make_sthsth_eval_step(model)
    if cfg.model.frame_budget > 0 and stage in (1, 3):
        from adafocus_tpu.train.stages_plus import (
            make_plus_eval_step,
            make_plus_train_step,
        )

        train = make_plus_train_step(model, stage, tx, axis_name=axis_name)
        return train, make_plus_eval_step(model)
    if cfg.model.frame_budget > 0 and stage == 2 and cfg.model.plus_rl:
        from adafocus_tpu.train.stages_plus import (
            make_plus_eval_step,
            make_plus_stage2_joint_step,
        )

        train = make_plus_stage2_joint_step(model, cfg.ppo,
                                            axis_name=axis_name)
        return train, make_plus_eval_step(model)
    if stage == 2:
        train = make_stage2_step(model, cfg.ppo, axis_name=axis_name)
    else:
        train = make_stage_train_step(model, stage, tx, axis_name=axis_name)
    eval_step = make_eval_step(model)
    if cfg.model.frame_budget > 0:
        from adafocus_tpu.train.stages_plus import make_plus_eval_step

        eval_step = make_plus_eval_step(model)
    return train, eval_step


def make_tx(cfg: ExperimentConfig, steps_per_epoch: int):
    """Per-stage optimizer. sth-sth stage 3 finetunes focuser+classifier
    (reference stage3.py), i.e. the stage-1 freeze matrix; actnet stage 3
    trains the classifier only (main_dist.py:163-188)."""
    stage = cfg.run.stage
    if stage == 2:
        return None
    optim = dataclasses.replace(
        cfg.optim, epochs=cfg.run.epochs,
        steps_per_epoch=max(steps_per_epoch, 1),
    )
    label_stage = stage
    if cfg.run.family == "sthsth" and stage == 3:
        label_stage = 1
    return make_stage_optimizer(label_stage, optim,
                                partial_bn=cfg.model.partial_bn)


def validate(state, eval_step, loader, prep, log, multi_label: bool,
             rng, anytime: bool = False) -> dict:
    """Eval epoch: device top-1/5 averaging + host mAP over the gathered
    set (reference main_dist.py:307-421). With ``anytime`` and a GRU head
    (per-step logits), also reports mAP after every timestep — the
    reference's per-timestep mAP table (main_dist.py:401-417)."""
    top1, top5 = AverageMeter("top1"), AverageMeter("top5")
    all_scores, all_labels, all_steps = [], [], []
    for i, raw in enumerate(loader):
        batch, full_labels, k = prep(raw, jax.random.fold_in(rng, i))
        logits, metrics = eval_step(state, batch, jax.random.fold_in(rng, i))
        b = batch["labels"].shape[0]
        probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))
        if k > 1:  # multi-clip (dense/twice) eval: average softmax over clips
            probs = probs.reshape((b // k, k) + probs.shape[1:]).mean(axis=1)
        if probs.ndim == 3:
            scores = probs[:, -1]
            if anytime:
                all_steps.append(probs)
        else:
            scores = probs
        if k > 1:  # clip-averaged accuracy recomputed on host
            labels1 = full_labels.reshape(len(full_labels), -1)[:, 0]
            order = np.argsort(-scores, axis=1)
            top1.update(float((order[:, 0] == labels1).mean()), len(labels1))
            top5.update(
                float((order[:, :5] == labels1[:, None]).any(1).mean()),
                len(labels1))
        else:
            top1.update(float(metrics["top1"]), b)
            top5.update(float(metrics["top5"]), b)
        all_scores.append(scores)
        all_labels.append(full_labels)
    out = {"top1": top1.avg, "top5": top5.avg}
    if all_scores:
        scores = np.concatenate(all_scores)
        labels = np.concatenate(all_labels)
        if jax.process_count() > 1:
            # mAP needs the FULL validation set: gather the per-host shards
            # (the reference computes it on rank 0 over everything,
            # main_dist.py:392-397)
            from jax.experimental import multihost_utils

            scores = np.concatenate(multihost_utils.process_allgather(scores))
            labels = np.concatenate(multihost_utils.process_allgather(labels))
        hot = multi_hot(labels, scores.shape[1]) if multi_label else \
            multi_hot(labels.reshape(len(labels), -1)[:, :1], scores.shape[1])
        out["mAP"] = mean_average_precision(scores, hot)
        if all_steps:
            steps = np.concatenate(all_steps)  # (N, T, C)
            per_t = [mean_average_precision(steps[:, t], hot)
                     for t in range(steps.shape[1])]
            log("  * anytime mAP per timestep: "
                + " ".join(f"{m:.4f}" for m in per_t))
    log(f"  * val: " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
    return out


def main(argv: Optional[Sequence[str]] = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("overrides", nargs="*", help="section.key=value")
    args = ap.parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    from adafocus_tpu.cli.common import apply_platform

    apply_platform(cfg.run)
    log = Logger(os.path.join(cfg.run.ckpt_dir, cfg.run.log_file))
    log(echo(cfg))
    root_key = set_all_seeds(cfg.run.seed)

    train_loader = build_loader(cfg, train=True)
    val_loader = build_loader(cfg, train=False)
    steps_per_epoch = len(train_loader)
    log(f"train batches/epoch: {steps_per_epoch}, "
        f"val batches: {len(val_loader)}, devices: {jax.device_count()}")

    model = build_model(cfg)
    tx = make_tx(cfg, steps_per_epoch)
    stage = cfg.run.stage
    state = create_train_state(
        model, root_key, tx=tx,
        ppo_cfg=cfg.ppo if stage == 2 else None,
    )

    start_epoch = 0
    best_acc = 0.0
    if cfg.run.resume:
        tree = ckpt.load_checkpoint(cfg.run.resume)
        if tree is None:
            raise SystemExit(f"no checkpoint under {cfg.run.resume}")
        state = ckpt.restore_train_state(state, tree)
        start_epoch = int(tree.get("meta", {}).get("epoch", -1)) + 1
        best_acc = ckpt.best_acc_of(tree)
        log(f"resumed from {cfg.run.resume} at epoch {start_epoch}")
    elif cfg.run.warm_start:
        tree = ckpt.load_checkpoint(cfg.run.warm_start, best=True) \
            or ckpt.load_checkpoint(cfg.run.warm_start)
        if tree is None:
            raise SystemExit(f"no checkpoint under {cfg.run.warm_start}")
        state = ckpt.load_stage_components(state, tree, stage)
        log(f"stage-{stage} warm start from {cfg.run.warm_start} "
            f"(components: {ckpt.STAGE_LOADS[stage]})")

    n_dev = jax.device_count()
    if n_dev > 1:
        mesh = make_mesh()
        train_step, eval_step = build_steps(cfg, model, tx, axis_name="data")
        train_step = shard_train_step(train_step, mesh)  # donates old state
        state = replicate(state, mesh)
        put = lambda b: shard_batch(b, mesh)
        # multi-host: per-batch rng must be a global (replicated) array
        # before it enters the mesh-spanning jit program
        put_key = (
            (lambda k: replicate_key(k, mesh))
            if jax.process_count() > 1 else (lambda k: k)
        )
        log(f"data-parallel over {n_dev} devices (mesh axis 'data')")
    else:
        train_step, eval_step = build_steps(cfg, model, tx)
        train_step = jax.jit(train_step)
        put = lambda b: b
        put_key = lambda k: k
    eval_step = jax.jit(eval_step)

    prep_train = make_batch_prep(cfg, train=True)
    prep_eval = make_batch_prep(cfg, train=False)
    multi_label = cfg.run.dataset in ("actnet", "fcvid")

    from adafocus_tpu.train.preemption import PreemptionGuard

    guard = PreemptionGuard.install()
    epoch = start_epoch
    from adafocus_tpu.data.prefetch import prefetch_to_device

    for epoch in range(start_epoch, cfg.run.epochs):
        train_loader.set_epoch(epoch)
        meter = ProgressMeter(steps_per_epoch, prefix=f"epoch {epoch} ")
        epoch_key = jax.random.fold_in(root_key, epoch)

        def prep_one(raw, i, _ek=epoch_key):
            bkey = jax.random.fold_in(_ek, i)
            batch, _, _ = prep_train(raw, bkey)
            return put(batch), put_key(bkey)

        for i, (batch, bkey) in enumerate(
            prefetch_to_device(train_loader, prep_one)
        ):
            if guard.should_stop:
                break
            state, metrics = train_step(state, batch, bkey)
            if (i + 1) % cfg.run.print_freq == 0 or i + 1 == steps_per_epoch:
                metrics = {k: float(v) for k, v in metrics.items()}
                log(meter.line(i, metrics))
        if guard.should_stop:
            log("preemption signal received — checkpointing and stopping")
            break

        if (epoch + 1) % cfg.run.eval_freq == 0 or epoch + 1 == cfg.run.epochs:
            results = validate(state, eval_step, val_loader, prep_eval, log,
                               multi_label,
                               jax.random.fold_in(root_key, 0x7FFFFFFF),
                               anytime=cfg.run.anytime_eval)
            acc = results.get("mAP", results["top1"]) if multi_label \
                else results["top1"]
            is_best = acc > best_acc
            best_acc = max(best_acc, acc)
            ckpt.save_checkpoint(
                cfg.run.ckpt_dir, jax.device_get(state), epoch, acc, best_acc,
                is_best,
            )
            log(f"  * checkpoint saved (acc={acc:.4f}, best={best_acc:.4f})")

    guard.finalize(lambda: ckpt.save_checkpoint(
        cfg.run.ckpt_dir, jax.device_get(state), epoch, best_acc, best_acc))
    log(f"done. best acc {best_acc:.4f}")
    return {"best_acc": best_acc}


if __name__ == "__main__":
    main()
