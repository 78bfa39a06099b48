"""Per-op device-time attribution for the flagship inference program.

Runs the flagship forward under ``jax.profiler`` and prints the top device
ops by total time (XLA fusion names + any HLO metadata the trace carries).
This is the measurement tool behind PERF.md's bandwidth-roofline analysis.

Usage:  python benchmarks/profile_ops.py [--batch 64] [--top 40] [--family actnet]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--family", default="flagship",
                    help="'flagship' (actnet glance-96 entry config) or "
                         "'actnet'/'sthsth' at --patch (the PERF.md "
                         "roofline claim must hold across operating "
                         "points, not just the flagship)")
    ap.add_argument("--patch", type=int, default=0,
                    help="patch size for --family actnet/sthsth "
                         "(default: 96 actnet / 144 sthsth)")
    args = ap.parse_args()

    import adafocus_tpu
    from adafocus_tpu.utils.device_lock import wait_for_device

    wait_for_device()  # traces are timing measurements too
    adafocus_tpu.enable_compilation_cache()
    import jax

    from __graft_entry__ import _flagship
    from adafocus_tpu.benchmark import _inference_fn, make_data
    from adafocus_tpu.train.stages import create_train_state
    from adafocus_tpu.utils.profiling import top_ops, trace

    if args.family == "flagship":
        model = _flagship()
    else:
        from adafocus_tpu.models.gfv import GFV
        from run_benchmarks import actnet_cfg, sthsth_cfg

        make_cfg = {"actnet": actnet_cfg, "sthsth": sthsth_cfg}[args.family]
        patch = args.patch or {"actnet": 96, "sthsth": 144}[args.family]
        model = GFV(make_cfg(patch))
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    data = make_data(model.cfg, args.batch)
    fn = jax.jit(_inference_fn(model))
    call = lambda: fn(state.params, state.batch_stats, data["frames_flat"],
                      data["frames_small"], jax.random.key(1))
    jax.block_until_ready(call())  # compile + warm

    logdir = args.logdir or tempfile.mkdtemp(prefix="adafocus_prof_")
    with trace(logdir):
        for _ in range(args.steps):
            out = call()
        jax.block_until_ready(out)

    rows = top_ops(logdir, n=args.top, group=args.group)
    total = sum(ms for _, ms, _ in rows)
    print(f"trace dir: {logdir}")
    print(f"{'op':<64} {'ms/step':>9} {'count':>6}")
    for name, ms, cnt in rows:
        print(f"{name[:64]:<64} {ms / args.steps:>9.3f} {cnt:>6}")
    print(f"(top-{args.top} total {total / args.steps:.2f} ms/step over "
          f"{args.steps} steps)")


if __name__ == "__main__":
    main()
