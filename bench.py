"""Throughput benchmark: flagship two-phase inference, videos/sec/chip.

Prints ONE JSON line. vs_baseline compares against the reference's best
published GPU throughput, 143.8 videos/s (AdaFocus-TSM 144^2, batch 64, RTX
2080Ti — BASELINE.md); our flagship here is the ActivityNet configuration
at the reference's published operating point (16 frames, 224^2 glance +
96^2 patches, MobileNetV2+ResNet-50+GRU, bf16, ~17 GF/video like the
reference's actnet-96 row). The full BASELINE-format sweep (both families,
every patch size, analytic GFLOPs/video) lives in
benchmarks/run_benchmarks.py.

See adafocus_tpu/benchmark.py for the timing methodology (in-dispatch
fori_loop with a loop-carried dependency; scalar fetch forces completion).
"""

import json
import os


def main():
    import adafocus_tpu

    adafocus_tpu.enable_compilation_cache()
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    inner_iters = int(os.environ.get("BENCH_ITERS", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    from __graft_entry__ import _flagship
    from adafocus_tpu.benchmark import time_inference

    videos_per_sec = time_inference(
        _flagship(), batch=batch, inner_iters=inner_iters, repeats=repeats
    )

    baseline = 143.8  # reference GPU videos/s (BASELINE.md)
    print(json.dumps({
        "metric": f"videos/sec/chip (ActivityNet flagship, B={batch}, T=16, bf16)",
        "value": round(videos_per_sec, 2),
        "unit": "videos/s",
        "vs_baseline": round(videos_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
