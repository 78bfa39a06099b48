"""Benchmark sweep reproducing the reference's headline table format
(BASELINE.md): videos/sec/chip + analytic GFLOPs/video per patch size for
both families, on whatever accelerator JAX exposes.

Usage: ``python benchmarks/run_benchmarks.py [--batch 64] [--families
actnet,sthsth] [--quick]``. Writes ``benchmarks/results.json`` and prints a
markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


# reference numbers to compare against (BASELINE.md); latency_s is the
# reference's bs=1 CPU latency row (figure/sthsth.png, Intel i7-10870H)
REFERENCE = {
    ("actnet", 96): {"gflops": 17.0},
    ("actnet", 128): {"gflops": 27.0},
    ("actnet", 160): {"gflops": 38.0},
    ("actnet", 192): {"gflops": 53.0},
    ("sthsth", 144): {"gflops": 23.5, "videos_per_sec": 143.8,
                      "latency_s": 0.32},
    ("sthsth", 160): {"gflops": 27.5, "videos_per_sec": 122.1,
                      "latency_s": 0.36},
    ("sthsth", 176): {"gflops": 33.7, "videos_per_sec": 104.2,
                      "latency_s": 0.42},
}


def actnet_cfg(patch: int):
    from adafocus_tpu.models.gfv import GFVConfig

    return GFVConfig(
        num_classes=200, num_frames=16, image_size=224, glance_size=224,
        patch_size=patch, action_dim=49, dtype=jnp.bfloat16,
    )


def sthsth_cfg(patch: int):
    from adafocus_tpu.models.gfv import GFVConfig

    # the reference's published sth-sth rows are the full AdaFocus-TSM
    # model with the CONTINUOUS Gaussian policy and the 64-ch BatchNorm
    # state encoder (sthsth/train_stage2.sh: ppo_continuous=True
    # actorcritic_with_bn=True; sthsth/models/ppo.py:33-44), so the
    # matched-config throughput must time that recipe, not the actnet
    # 32-ch discrete encoder (round-4 sweeps did; the encoder is <1% of
    # the program, but the comparison should be faithful)
    return GFVConfig(
        num_classes=174, num_frames=8, num_frames_focuser=12, image_size=224,
        glance_size=224, patch_size=patch, action_dim=49,
        classifier="consensus", tsm=True, video_div=1,
        continuous_policy=True, policy_channels=64, policy_bn=True,
        dtype=jnp.bfloat16,
    )


# AdaFocus+ frontier points: (patch, frame budget K of 16)
PLUS_POINTS = ((96, 8), (128, 8), (160, 12), (192, 12))


def plus_cfg(point):
    import dataclasses

    patch, budget = point
    return dataclasses.replace(actnet_cfg(patch), frame_budget=budget)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--families", default="actnet,sthsth")
    ap.add_argument("--quick", action="store_true",
                    help="fewer iters/repeats, skip flops")
    ap.add_argument("--int8", action="store_true",
                    help="also time the int8 PTQ serving path "
                         "(models/quant_inference.py) per config")
    ap.add_argument("--eval-views", action="store_true",
                    help="also time the test-time multi-crop eval fans at "
                         "the flagship patch of each family: oversample "
                         "(5 crops x flip = 10 views) and full_res (3), "
                         "reference GroupOverSample/GroupFullResSample")
    args = ap.parse_args()

    import adafocus_tpu
    from adafocus_tpu.utils.device_lock import wait_for_device

    wait_for_device()  # never sweep against concurrent training (PERF.md)
    adafocus_tpu.enable_compilation_cache()
    from adafocus_tpu.benchmark import (
        inference_gflops_per_video,
        time_inference,
    )
    from adafocus_tpu.models.gfv import GFV

    sweeps = {
        "actnet": ((96, 128, 160, 192), actnet_cfg),
        "sthsth": ((144, 160, 176), sthsth_cfg),
        "actnet_plus": (PLUS_POINTS, plus_cfg),
    }
    inner, repeats = (3, 1) if args.quick else (10, 3)

    results = []
    for family in args.families.split(","):
        patches, make_cfg = sweeps[family]
        for patch in patches:
            model = GFV(make_cfg(patch))
            vps = time_inference(model, batch=args.batch,
                                 inner_iters=inner, repeats=repeats)
            # bs=1 latency (the reference's CPU-latency row): one video per
            # dispatch, inner-loop-timed like the throughput path
            lat_vps = time_inference(model, batch=1, inner_iters=inner,
                                     repeats=repeats)
            latency_ms = 1000.0 / lat_vps
            if isinstance(patch, tuple):  # AdaFocus+ (patch, budget) point
                patch = f"{patch[0]}@K{patch[1]}"
            row = {"family": family, "patch": patch,
                   "videos_per_sec": round(vps, 1),
                   "latency_ms_bs1": round(latency_ms, 2),
                   "batch": args.batch,
                   "device": jax.devices()[0].device_kind}
            if not args.quick:
                row["gflops_per_video"] = round(
                    inference_gflops_per_video(model), 2)
            ref = REFERENCE.get((family, patch), {})
            if "videos_per_sec" in ref:
                row["speedup_vs_ref_gpu"] = round(
                    vps / ref["videos_per_sec"], 2)
            if "latency_s" in ref:
                row["latency_speedup_vs_ref_cpu"] = round(
                    ref["latency_s"] * 1000.0 / latency_ms, 1)
            if "gflops" in ref:
                row["ref_gflops"] = ref["gflops"]
            if args.int8:
                # mode='int8' = the serving default: int8 backbones + int8
                # frame transport, bf16 heads (head quantization is
                # throughput-neutral but -4.5 top-1; bench_int8_modes.py
                # measures the 'int8+heads' opt-in)
                row["int8_mode"] = "backbones+transport, bf16 heads"
                row["videos_per_sec_int8"] = round(
                    time_inference(model, batch=args.batch, inner_iters=inner,
                                   repeats=repeats, mode="int8"), 1)
                # bs=1 int8 serving latency: exercises the prepared-weight
                # cache (quant_inference.prepare_q8) — without it batch-1
                # re-quantizes every weight per call (0.84x bf16; PERF.md)
                row["latency_ms_bs1_int8"] = round(
                    1000.0 / time_inference(model, batch=1,
                                            inner_iters=inner,
                                            repeats=repeats, mode="int8"), 2)
            if args.eval_views and patch in (96, 144):
                # multi-crop eval throughput at the flagship point: the
                # model runs views x batch forwards per video (the accuracy
                # deltas these buy are the miniact eval/oversample +
                # eval/full_res rows)
                for name, v in (("oversample", 10), ("full_res", 3)):
                    row[f"videos_per_sec_{name}_x{v}"] = round(
                        time_inference(model, batch=max(args.batch // v, 1),
                                       inner_iters=inner, repeats=repeats,
                                       views=v), 1)
            results.append(row)
            print(json.dumps(row), flush=True)

    # quick mode (fewer iters, no flops) must not clobber full-sweep numbers
    out = os.path.join(
        os.path.dirname(__file__),
        "results_quick.json" if args.quick else "results.json",
    )
    merged = {}
    if os.path.exists(out):  # family-at-a-time runs accumulate
        with open(out) as f:
            for r in json.load(f):
                merged[(r["family"], r["patch"])] = r
    for r in results:
        merged[(r["family"], r["patch"])] = r
    with open(out, "w") as f:
        json.dump(list(merged.values()), f, indent=1)

    print("\n| family | patch | videos/s/chip | bs=1 latency (ms) "
          "| GFLOPs/video (ref) | vs ref GPU |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['family']} | {r['patch']}^2 | {r['videos_per_sec']} "
              f"| {r['latency_ms_bs1']} "
              f"| {r.get('gflops_per_video', '-')} ({r.get('ref_gflops', '-')}) "
              f"| {r.get('speedup_vs_ref_gpu', '-')}x |")


if __name__ == "__main__":
    main()
