"""End-to-end input-pipeline benchmark: synthetic JPEG dataset on disk ->
VideoLoader decode throughput (threads vs decode_procs) -> loader-included
training steps/s, quantifying the host/device gap (the reference's
DataLoader-worker path, actnet/main_dist.py:194-239).

Usage: ``python benchmarks/bench_input_pipeline.py [--videos 64]
[--frames 32] [--size 360x480] [--batch 16] [--procs 0,2]
[--train-steps 8]``. Writes benchmarks/input_pipeline.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_dataset(root: str, videos: int, frames: int, h: int, w: int):
    from PIL import Image

    rng = np.random.RandomState(0)
    for v in range(videos):
        d = os.path.join(root, f"v{v:04d}")
        os.makedirs(d, exist_ok=True)
        # realistic-entropy frames (smooth gradients + noise compress like
        # natural video, unlike pure noise)
        yy, xx = np.mgrid[0:h, 0:w]
        for i in range(1, frames + 1):
            base = (
                128 + 80 * np.sin(xx / 37.0 + v) * np.cos(yy / 29.0 + i / 3.0)
            )[..., None] + rng.randint(-20, 20, (h, w, 3))
            img = np.clip(base, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(d, f"image_{i:06d}.jpg"), quality=87)


def bench_loader(records, root, batch, segments, seg_focuser, procs,
                 epochs=2):
    from adafocus_tpu.data.pipeline import (
        FrameFolderSource, LoaderConfig, VideoLoader,
    )

    cfg = LoaderConfig(
        num_segments=segments, num_segments_focuser=seg_focuser,
        canvas_size=256, batch_size=batch, num_workers=8,
        decode_procs=procs, prefetch=2,
    )
    loader = VideoLoader(records, FrameFolderSource(root), cfg)
    frames_per_video = segments + (seg_focuser or 0)
    best = 0.0
    for e in range(epochs):  # first epoch warms page cache + proc pool
        loader.set_epoch(e)
        n = 0
        t0 = time.perf_counter()
        for b in loader:
            n += len(b["labels"])
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
    loader.close()
    return {"videos_per_sec": round(best, 2),
            "frames_per_sec": round(best * frames_per_video, 1)}


def bench_train_loop(records, root, batch, steps):
    """Loader-INCLUDED stage-1 training steps/s on the default accelerator
    (tiny model dims keep compile time sane; the host decode is the
    bottleneck under test)."""
    import jax
    import jax.numpy as jnp

    import adafocus_tpu

    adafocus_tpu.enable_compilation_cache()
    from adafocus_tpu.cli.common import make_batch_prep
    from adafocus_tpu.config import ExperimentConfig, sync_derived
    import dataclasses

    from adafocus_tpu.data.pipeline import (
        FrameFolderSource, LoaderConfig, VideoLoader,
    )
    from adafocus_tpu.models.gfv import GFV, GFVConfig
    from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
    from adafocus_tpu.train.stages import create_train_state, make_stage_train_step

    model_cfg = GFVConfig(num_classes=16, num_frames=16, image_size=224,
                          glance_size=224, patch_size=96, action_dim=49)
    cfg = ExperimentConfig(model=model_cfg)
    cfg = dataclasses.replace(
        cfg, loader=dataclasses.replace(cfg.loader, batch_size=batch,
                                        canvas_size=256, num_workers=8),
    )
    cfg = sync_derived(cfg)
    loader = VideoLoader(records, FrameFolderSource(root), cfg.loader)
    prep = make_batch_prep(cfg, train=True)

    model = GFV(model_cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=10))
    state = create_train_state(model, jax.random.key(0), tx=tx)
    step = jax.jit(make_stage_train_step(model, 1, tx))

    times, done = [], 0
    key = jax.random.key(1)
    while done < steps + 1:
        for raw in loader:
            t0 = time.perf_counter()
            batch_dev, _, _ = prep(raw, jax.random.fold_in(key, done))
            state, metrics = step(state, batch_dev, jax.random.fold_in(key, done))
            jax.block_until_ready(metrics["loss"])
            if done > 0:  # skip compile step
                times.append(time.perf_counter() - t0)
            done += 1
            if done >= steps + 1:
                break
    loader.close()
    sec = float(np.median(times))
    return {"steps_per_sec": round(1.0 / sec, 3),
            "videos_per_sec": round(batch / sec, 2),
            "device": jax.devices()[0].device_kind}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", default="360x480")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--procs", default="0,2")
    ap.add_argument("--train-steps", type=int, default=0,
                    help=">0: also time loader-included train steps")
    ap.add_argument("--root", default="/tmp/afl_bench_frames")
    args = ap.parse_args()

    h, w = (int(x) for x in args.size.split("x"))
    marker = os.path.join(
        args.root, f".done_{args.videos}_{args.frames}_{h}x{w}")
    if not os.path.exists(marker):
        print(f"writing {args.videos}x{args.frames} JPEGs to {args.root} ...",
              flush=True)
        make_dataset(args.root, args.videos, args.frames, h, w)
        open(marker, "w").close()

    from adafocus_tpu.data.records import VideoRecord

    records = [VideoRecord(f"v{v:04d}", args.frames, (v % 16, -1, -1))
               for v in range(args.videos)]

    out = {"videos": args.videos, "frames_per_video": args.frames,
           "jpeg_size": f"{h}x{w}", "segments": args.segments,
           "batch": args.batch, "cpus": os.cpu_count(), "loader": {}}
    for procs in (int(p) for p in args.procs.split(",")):
        r = bench_loader(records, args.root, args.batch, args.segments, 0,
                         procs)
        out["loader"][f"decode_procs={procs}"] = r
        print(json.dumps({f"decode_procs={procs}": r}), flush=True)

    if args.train_steps > 0:
        out["train_loop"] = bench_train_loop(
            records, args.root, args.batch, args.train_steps)
        print(json.dumps({"train_loop": out["train_loop"]}), flush=True)

    path = os.path.join(os.path.dirname(__file__), "input_pipeline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
