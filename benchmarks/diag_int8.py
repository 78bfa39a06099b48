"""Isolate the int8 PTQ accuracy collapse (miniact eval/int8 mAP 0.18 vs
bf16 0.95) by evaluating the SAME checkpoint with each quantized component
toggled independently: backbones-only, heads-only, classifier-head-only,
policy-head-only, and float-vs-int8 frame transport.

Usage: python benchmarks/diag_int8.py [--variants a,b,...] [--ckpt DIR]
Writes benchmarks/diag_int8.json.
"""

from __future__ import annotations

import argparse
import json
import os

import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    # NOTE: not via PYTHONPATH — that breaks this environment's TPU
    # plugin registration (backend 'axon' goes unregistered)
    sys.path.insert(0, REPO)

import jax  # noqa: E402

BASE_OVERRIDES = [
    "run.dataset=miniact", f"run.data_root={REPO}/.data/miniact",
    "model.num_classes=50", "model.num_frames=16",
    "model.image_size=224", "model.glance_size=224",
    "model.patch_size=96", "model.action_dim=49",
    "model.remat=true",
    "loader.batch_size=32", "loader.canvas_size=256",
    "loader.cache=device",
    # the diagnostic needs head scales to toggle head variants; the
    # serving default (run.quantize_heads=false) omits them
    "run.quantize_heads=true",
]


def make_eval_step_q8_float_transport(model, scales, qw=None):
    """Like cli/evaluate.make_eval_step_q8 but WITHOUT int8 frame
    transport: frames stay float all the way into the stems."""
    import jax.numpy as jnp

    from adafocus_tpu.models.quant_inference import inference_q8
    from adafocus_tpu.ops.metrics import topk_accuracy

    def step(state, batch, rng):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = inference_q8(model, variables, scales,
                              batch["frames_flat"], batch["frames_small"],
                              rng, qw=qw)
        final = logits[:, -1] if logits.ndim == 3 else logits
        top1, top5 = topk_accuracy(final.astype(jnp.float32),
                                   batch["labels"])
        return logits, {"top1": top1, "top5": top5}

    return step


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=f"{REPO}/.data/miniact_work/ck_s3")
    ap.add_argument("--variants", default="bf16,full,backbones,heads,"
                    "cls_head,policy_head,float_transport")
    ap.add_argument("--out", default=f"{REPO}/benchmarks/diag_int8.json")
    args = ap.parse_args()

    from adafocus_tpu.cli.common import (
        Logger, apply_platform, build_loader, build_model, make_batch_prep,
        set_all_seeds,
    )
    from adafocus_tpu.cli.evaluate import (
        calibrate_from_loader, make_eval_step_q8,
    )
    from adafocus_tpu.cli.train import validate
    from adafocus_tpu.config import load_config
    from adafocus_tpu.train import checkpoint as ckpt
    from adafocus_tpu.train.stages import create_train_state, make_eval_step

    cfg = load_config(None, BASE_OVERRIDES + [f"run.resume={args.ckpt}"])
    apply_platform(cfg.run)
    log = Logger(None)
    root_key = set_all_seeds(cfg.run.seed)
    model = build_model(cfg)
    state = create_train_state(model, root_key)
    tree = ckpt.load_checkpoint(cfg.run.resume, best=True) \
        or ckpt.load_checkpoint(cfg.run.resume)
    assert tree is not None, f"no checkpoint under {cfg.run.resume}"
    state = state.replace(params=tree["params"],
                          batch_stats=tree.get("batch_stats",
                                               state.batch_stats))
    loader = build_loader(cfg, train=False)
    prep = make_batch_prep(cfg, train=False)

    scales = calibrate_from_loader(
        model, state, loader, prep, cfg, jax.random.fold_in(root_key, 1), 4)
    heads = scales["heads"]
    print("calibrated scales:",
          {k: len(v) for k, v in scales.items()}, flush=True)
    import numpy as np
    print("head scale ranges:",
          {k: (float(np.min(v)), float(np.max(v)))
           for k, v in heads.items()}, flush=True)

    def variant_scales(which):
        if which == "backbones":
            return {"glancer": scales["glancer"],
                    "focuser": scales["focuser"]}
        if which == "heads":
            return {"glancer": {}, "focuser": {}, "heads": heads}
        if which == "cls_head":
            return {"glancer": {}, "focuser": {}, "heads": {
                k: v for k, v in heads.items() if k.startswith("cls/")}}
        if which == "policy_head":
            return {"glancer": {}, "focuser": {}, "heads": {
                k: v for k, v in heads.items() if k.startswith("policy/")}}
        return scales  # full / float_transport

    results = {}
    for variant in args.variants.split(","):
        if variant == "bf16":
            step = make_eval_step(model)
        elif variant == "float_transport":
            step = make_eval_step_q8_float_transport(
                model, variant_scales(variant))
        else:
            step = make_eval_step_q8(model, variant_scales(variant))
        step = jax.jit(step)
        res = validate(state, step, loader, prep, log, True,
                       jax.random.fold_in(root_key, 0x7FFFFFFF))
        results[variant] = res
        print(f"[{variant}] " + " ".join(
            f"{k}={v:.4f}" for k, v in res.items()), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
