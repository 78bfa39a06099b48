"""Export a trained checkpoint as an AOT serving artifact.

Completes the train -> checkpoint -> serve pipeline the reference lacks
entirely (its "deployment" is importing the training repo,
actnet/main_dist.py evaluate=True): load a checkpoint, optionally
calibrate int8 activation scales on validation batches, and write a
self-contained StableHLO artifact (serving.py) that runs with plain jax
and no framework code.

Usage::

    python -m adafocus_tpu.cli.export run.resume=<ckpt_dir> \
        export.path=model.stablehlo export.batch=64 [run.quantize=int8 ...]

The artifact serves ``(frames_flat, frames_small) -> per-step logits`` at
the fixed ``export.batch`` (XLA static shapes — export one artifact per
served batch size). ``export.platforms`` lowers for other backends (e.g.
'cpu,tpu').
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
from adafocus_tpu.config import echo, load_config
from adafocus_tpu.train import checkpoint as ckpt
from adafocus_tpu.train.stages import create_train_state


def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--path", default="model.stablehlo",
                    help="output artifact path")
    ap.add_argument("--batch", type=int, default=64,
                    help="served batch size (one artifact per batch size)")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering platforms ('' = current)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    from adafocus_tpu.cli.common import apply_platform

    apply_platform(cfg.run)
    log = Logger(os.path.join(cfg.run.ckpt_dir, "export.log"))
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
        log("WARNING: run.resume not set — exporting a fresh init")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mode, scales = "bf16", None
    if cfg.run.quantize == "int8":
        from adafocus_tpu.cli.evaluate import calibrate_from_loader

        loader = build_loader(cfg, train=False)
        prep = make_batch_prep(cfg, train=False)
        scales = calibrate_from_loader(
            model, state, loader, prep, cfg, jax.random.fold_in(root_key, 1),
            cfg.run.quantize_batches)
        mode = "int8"
        log(f"int8 PTQ: calibrated on {cfg.run.quantize_batches} val batches")
    elif cfg.run.quantize:
        raise SystemExit(f"unknown run.quantize mode {cfg.run.quantize!r}")

    from adafocus_tpu.serving import export_inference, save_exported

    platforms = [p for p in args.platforms.split(",") if p] or None
    exported = export_inference(
        model, variables, batch_size=args.batch, mode=mode, scales=scales,
        platforms=platforms)
    save_exported(exported, args.path)
    size_mb = os.path.getsize(args.path) / 1e6
    log(f"exported {mode} artifact: {args.path} ({size_mb:.1f} MB, "
        f"batch={args.batch}, platforms={platforms or 'current'})")


if __name__ == "__main__":
    main()
