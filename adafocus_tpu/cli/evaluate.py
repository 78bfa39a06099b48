"""Evaluation entry point (reference sthsth/evaluate.py and
actnet/main_dist.py evaluate=True path): load a checkpoint, run the
deployment (greedy-policy, batched-focus) forward over the validation set,
report top-1/5 (+ mAP for multi-label datasets).

Usage: ``python -m adafocus_tpu.cli.evaluate --config conf.yaml
run.resume=<ckpt_dir> [section.key=value ...]``
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import jax

from adafocus_tpu.cli.common import (
    Logger,
    build_loader,
    build_model,
    make_batch_prep,
    set_all_seeds,
)
from adafocus_tpu.cli.train import validate
from adafocus_tpu.config import echo, load_config
from adafocus_tpu.train import checkpoint as ckpt
from adafocus_tpu.train.stages import create_train_state, make_eval_step
from adafocus_tpu.train.stages_sthsth import make_sthsth_eval_step


def visualize_policy_patches(model, state, loader, prep, cfg, path, rng):
    """Render where the greedy policy looks on the first eval batch
    (reference sthsth/ops/utils.py:12-110 visualize/save_images)."""
    import numpy as np

    from adafocus_tpu.models.gfv import GFV, glance_policy_actions
    from adafocus_tpu.models.gfv_sthsth import (
        actions_per_frame,
        glance_division_rollout,
    )
    from adafocus_tpu.ops.patch import patch_offsets
    from adafocus_tpu.utils.visualize import save_patch_grid

    raw = next(iter(loader))
    batch, _, _ = prep(raw, rng)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mc = cfg.model
    if cfg.run.family == "sthsth":
        _, _, roll = glance_division_rollout(
            model, variables, batch["frames_small"], rng, mode="greedy")
        actions = actions_per_frame(
            roll["actions"], batch["frames_flat"].shape[1])
    else:
        _, _, roll = glance_policy_actions(
            model, variables, batch["frames_small"], rng, mode="greedy")
        actions = roll["actions"]
    n = min(cfg.run.visualize_patches, actions.shape[0])
    offs = np.asarray(patch_offsets(actions[:n], mc.image_size, mc.patch_size))
    flat = np.asarray(batch["frames_flat"][:n], np.float32)
    t = flat.shape[1]
    frames = flat[..., : mc.image_size * 3].reshape(
        n, t, flat.shape[2], mc.image_size, 3)
    save_patch_grid(path, frames, offs, mc.patch_size)


def calibrate_from_loader(model, state, loader, prep, cfg, rng, n_batches):
    """Run n validation batches through the bf16 deployment phases to
    collect calibration data (glance frames + the patches the greedy
    policy actually selects), then compute per-unit int8 activation
    scales (models/quant_inference.calibrate_gfv)."""
    import numpy as np

    from adafocus_tpu.models.gfv import (
        GFV, extract_for_frames, glance_policy_actions,
    )
    from adafocus_tpu.models.quant_inference import calibrate_gfv

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mc = model.cfg
    batches = []
    it = iter(loader)
    for i in range(n_batches):
        try:
            raw = next(it)
        except StopIteration:
            break
        batch, _, _ = prep(raw, jax.random.fold_in(rng, i))
        flat = batch["frames_flat"]
        if mc.classifier == "consensus":
            from adafocus_tpu.models.gfv_sthsth import (
                actions_per_frame, glance_division_rollout,
            )

            _, _, roll = glance_division_rollout(
                model, variables, batch["frames_small"], rng, mode="greedy")
            actions = actions_per_frame(roll["actions"], flat.shape[1])
        elif mc.frame_budget > 0:
            from adafocus_tpu.models.gfv_plus import gather_frames, select_topk

            fmap, pooled = model.apply(
                variables, batch["frames_small"], False, method=GFV.glance)
            if mc.plus_rl:
                idx = model.apply(
                    variables, pooled.astype(mc.dtype), rng, "top",
                    method=GFV.select_rollout)["idx"]
            else:
                scores = model.apply(variables, pooled,
                                     method=GFV.frame_scores)
                idx, _ = select_topk(scores, mc.frame_budget, rng, mode="top")
            roll = model.apply(
                variables, gather_frames(fmap, idx), rng, "greedy", False,
                method=GFV.policy_rollout)
            flat = gather_frames(flat, idx)
            actions = roll["actions"]
        else:
            _, _, roll = glance_policy_actions(
                model, variables, batch["frames_small"], rng, mode="greedy")
            actions = roll["actions"]
        patches = extract_for_frames(
            flat, actions, mc.image_size, mc.patch_size)
        batches.append({"frames_small": np.asarray(batch["frames_small"],
                                                   np.float32),
                        "patches": np.asarray(patches, np.float32)})
    if not batches:
        raise SystemExit("run.quantize: no validation batches to calibrate on")
    return calibrate_gfv(model, variables, batches,
                         heads=cfg.run.quantize_heads)


def make_eval_step_forced(model, mode: str):
    """Eval step with the patch policy OVERRIDDEN: 'random' / 'center'
    patches, or 'oracle' patches from ground-truth target tracks supplied
    per batch (batch['actions']). These bracket the learned policy's
    accuracy from below and above — the policy-quality evidence the
    reference never measures (it has only the random training baseline,
    actnet/models/gfv_net.py:334-336)."""
    import jax.numpy as jnp

    from adafocus_tpu.models.gfv import inference_with_actions
    from adafocus_tpu.ops.metrics import topk_accuracy
    from adafocus_tpu.ops.patch import random_patch_actions

    cfg = model.cfg
    consensus = cfg.classifier == "consensus"
    if cfg.frame_budget > 0:
        raise SystemExit(
            "run.eval_policy overrides are not defined for AdaFocus+ "
            "frame-budget models")

    def step(state, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        b = batch["frames_small"].shape[0]
        n = cfg.video_div if consensus else batch["frames_small"].shape[1]
        if mode == "random":
            actions = random_patch_actions(rng, (b, n))
        elif mode == "center":
            actions = jnp.full((b, n, 2), 0.5, jnp.float32)
        else:  # oracle: ground-truth actions attached by the prep wrapper
            actions = batch["actions"]
        if consensus:
            from adafocus_tpu.models.gfv_sthsth import (
                inference_sthsth_with_actions,
            )

            logits = inference_sthsth_with_actions(
                model, variables, batch["frames_flat"],
                batch["frames_small"], actions)
        else:
            logits = inference_with_actions(
                model, variables, batch["frames_flat"],
                batch["frames_small"], actions)
        final = logits[:, -1] if logits.ndim == 3 else logits
        top1, top5 = topk_accuracy(final.astype(jnp.float32),
                                   batch["labels"])
        return logits, {"top1": top1, "top5": top5}

    return step


def build_oracle_table(cfg, loader) -> "np.ndarray":
    """(num_records, T, 2) ground-truth patch actions aligned with the val
    loader's record order, from the dataset's gt.npz (run.oracle_gt). Uses
    the same deterministic center-of-segment sampling as val mode."""
    import numpy as np

    from adafocus_tpu.data.miniact import load_gt, oracle_actions
    from adafocus_tpu.data.sampling import sample_segment_indices

    paths, centers, presence = load_gt(cfg.run.oracle_gt)
    row = {p: i for i, p in enumerate(paths)}
    records = loader.records
    lcfg = loader.cfg
    if lcfg.dense_sample or lcfg.twice_sample:
        raise SystemExit("eval_policy=oracle does not support multi-clip "
                         "sampling")
    mc = cfg.model
    t = mc.t_focuser
    out = np.empty((len(records), t, 2), np.float32)
    for i, rec in enumerate(records):
        r = row[rec.path]
        idx = sample_segment_indices(rec.num_frames, t, mode="val") - 1
        out[i] = oracle_actions(
            centers[r][idx], presence[r][idx], lcfg.canvas_size,
            mc.image_size, mc.patch_size,
        )
    if mc.classifier == "consensus":
        # one action per division: mean of the present frames' targets
        d = mc.video_div
        pres = np.stack([presence[row[rec.path]][
            sample_segment_indices(rec.num_frames, t, mode="val") - 1]
            for rec in records]).reshape(len(records), d, t // d, 1)
        div = out.reshape(len(records), d, t // d, 2)
        w = np.maximum(pres.sum(axis=2), 1e-6)
        out = np.where(
            pres.any(axis=2), (div * pres).sum(axis=2) / w,
            np.float32(0.5))
    return out


def make_eval_step_q8(model, scales, impl: str = "auto", qw=None):
    """Eval step on the int8 PTQ serving forward (any family). ``qw``:
    prepared-weight cache (models/quant_inference.prepare_q8); its int8
    kernels become jit constants, matching what the export artifact
    serves."""
    import jax.numpy as jnp

    from adafocus_tpu.models.quant_inference import (
        inference_q8, inference_q8_plus, inference_q8_sthsth,
    )
    from adafocus_tpu.ops.metrics import topk_accuracy

    cfg = model.cfg
    if cfg.frame_budget > 0:
        fam = inference_q8_plus
    elif cfg.classifier == "consensus":
        fam = inference_q8_sthsth
    else:
        fam = inference_q8

    def step(state, batch, rng):
        from adafocus_tpu.ops.quant import quantize_frames

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # serving transport format: frames/patches move as int8 (half the
        # extraction DMA) — the accuracy this step measures is exactly what
        # the benchmarked int8 path serves
        logits = fam(model, variables, scales,
                     quantize_frames(batch["frames_flat"]),
                     quantize_frames(batch["frames_small"]), rng, impl=impl,
                     qw=qw)
        final = logits[:, -1] if logits.ndim == 3 else logits
        top1, top5 = topk_accuracy(final.astype(jnp.float32),
                                   batch["labels"])
        return logits, {"top1": top1, "top5": top5}

    return step


def main(argv: Optional[Sequence[str]] = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    from adafocus_tpu.cli.common import apply_platform

    apply_platform(cfg.run)
    log = Logger(os.path.join(cfg.run.ckpt_dir, "evaluate.log"))
    log(echo(cfg))
    root_key = set_all_seeds(cfg.run.seed)

    model = build_model(cfg)
    state = create_train_state(model, root_key)
    if cfg.run.resume:
        tree = ckpt.load_checkpoint(cfg.run.resume, best=True) \
            or ckpt.load_checkpoint(cfg.run.resume)
        if tree is None:
            raise SystemExit(f"no checkpoint under {cfg.run.resume}")
        state = state.replace(
            params=tree["params"],
            batch_stats=tree.get("batch_stats", state.batch_stats),
        )
        log(f"loaded checkpoint from {cfg.run.resume}")
    else:
        log("WARNING: run.resume not set — evaluating a fresh init")

    loader = build_loader(cfg, train=False)
    prep = make_batch_prep(cfg, train=False)
    policy_mode = cfg.run.eval_policy
    if policy_mode not in ("learned", "random", "center", "oracle"):
        raise SystemExit(f"unknown run.eval_policy {policy_mode!r}")
    if policy_mode != "learned" and cfg.run.quantize:
        raise SystemExit("run.eval_policy overrides cannot combine with "
                         "run.quantize")
    if policy_mode == "oracle":
        if not cfg.run.oracle_gt:
            raise SystemExit("eval_policy=oracle needs run.oracle_gt")
        import jax.numpy as jnp

        table = jnp.asarray(build_oracle_table(cfg, loader))
        base_prep = prep

        def prep(raw, rng, _bp=base_prep, _tbl=table):
            batch, labels, k = _bp(raw, rng)
            if k != 1:
                raise SystemExit("oracle eval does not support multi-clip")
            batch["actions"] = _tbl[jnp.asarray(raw["record_index"])]
            return batch, labels, k

        log(f"oracle actions table built for {table.shape[0]} videos")
    if policy_mode != "learned":
        eval_step = make_eval_step_forced(model, policy_mode)
    elif cfg.run.quantize == "int8":
        scales = calibrate_from_loader(
            model, state, loader, prep, cfg, jax.random.fold_in(root_key, 1),
            cfg.run.quantize_batches)
        log(f"int8 PTQ: calibrated {sum(len(s) for s in scales.values())} "
            f"activation scales on {cfg.run.quantize_batches} val batches")
        from adafocus_tpu.models.quant_inference import prepare_q8

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        qw = prepare_q8(model, variables, scales)
        log(f"int8 PTQ: prepared {sum(len(q) for q in qw.values())} "
            f"quantized weight sets")
        eval_step = make_eval_step_q8(model, scales, qw=qw)
    elif cfg.run.quantize:
        raise SystemExit(f"unknown run.quantize mode {cfg.run.quantize!r}")
    elif cfg.run.family == "sthsth":
        eval_step = make_sthsth_eval_step(model)
    elif cfg.model.frame_budget > 0:
        from adafocus_tpu.train.stages_plus import make_plus_eval_step

        eval_step = make_plus_eval_step(model)
    else:
        eval_step = make_eval_step(model)
    eval_step = jax.jit(eval_step)
    multi_label = cfg.run.dataset in ("actnet", "fcvid")
    if cfg.run.visualize_patches > 0:
        path = os.path.join(cfg.run.ckpt_dir, "patches.png")
        visualize_policy_patches(
            model, state, loader, prep, cfg, path, root_key)
        log(f"policy patch grid saved to {path}")
    results = validate(state, eval_step, loader, prep, log, multi_label,
                       jax.random.fold_in(root_key, 0x7FFFFFFF),
                       anytime=cfg.run.anytime_eval)
    log("final: " + " ".join(f"{k}={v:.4f}" for k, v in results.items()))
    return results


if __name__ == "__main__":
    main()
