"""Quantify the int8 serving-default change: time the 'int8' mode
(backbones + int8 transport, bf16 heads — the accuracy-preserving default,
benchmarks/diag_int8.json) against 'int8+heads' (full quantization,
−4.5 top-1) and bf16, at the two headline configs.

Usage: python benchmarks/bench_int8_modes.py [--batch 64] [--quick]
Writes benchmarks/bench_int8_modes.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "bench_int8_modes.json"))
    args = ap.parse_args()

    import adafocus_tpu

    adafocus_tpu.enable_compilation_cache()
    from adafocus_tpu.benchmark import time_inference
    from adafocus_tpu.models.gfv import GFV
    from benchmarks.run_benchmarks import actnet_cfg, sthsth_cfg

    inner, repeats = (3, 1) if args.quick else (10, 3)
    results = {}

    def flush():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    for name, cfg in (("actnet96", actnet_cfg(96)),
                      ("sthsth144", sthsth_cfg(144))):
        row = results.setdefault(name, {})
        for mode in ("bf16", "int8", "int8+heads"):
            # each mode measured and persisted independently: a hang/OOM in
            # one mode (round 4 lost the sthsth144 int8+heads point to a
            # timeout) must not discard the modes already measured
            try:
                row[mode] = round(time_inference(
                    GFV(cfg), batch=args.batch, inner_iters=inner,
                    repeats=repeats, mode=mode), 1)
            except Exception as e:  # record the failure, keep going
                row[mode] = None
                row[mode + "_error"] = f"{type(e).__name__}: {e}"
            print(f"{name} {mode}: {row[mode]} videos/s", flush=True)
            flush()
        if row.get("bf16") and row.get("int8"):
            row["int8_vs_bf16"] = round(row["int8"] / row["bf16"], 3)
        if row.get("int8") and row.get("int8+heads"):
            row["heads_vs_default"] = round(row["int8+heads"] / row["int8"], 3)
        flush()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
