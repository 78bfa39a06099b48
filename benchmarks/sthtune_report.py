"""Summarize the sthtune stage-2 recipe sweep: per-variant eval bracket
(learned/random/oracle mAP), oracle-gap recovery, and the reward
trajectory over stage-2 training (first/last-epoch mean of the logged
``reward_mean``), so the winning recipe for phase_sthhard is a one-look
decision. Reads benchmarks/miniact_results.json + the harness train logs.

Usage: python benchmarks/sthtune_report.py [--results PATH] [--workdir PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def reward_trajectory(log_path: str):
    """(first-epoch mean, last-epoch mean, n_epochs) of reward_mean lines."""
    if not os.path.exists(log_path):
        return None
    per_epoch: dict = {}
    with open(log_path) as f:
        for line in f:
            m = re.match(r"epoch (\d+) .*reward_mean=(-?[0-9.]+)", line)
            if m:
                per_epoch.setdefault(int(m.group(1)), []).append(
                    float(m.group(2)))
    if not per_epoch:
        return None
    first = min(per_epoch)
    last = max(per_epoch)
    mean = lambda xs: sum(xs) / len(xs)
    return mean(per_epoch[first]), mean(per_epoch[last]), len(per_epoch)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results",
                    default=os.path.join(REPO, "benchmarks/miniact_results.json"))
    ap.add_argument("--workdir",
                    default=os.path.join(REPO, ".data/miniact_work"))
    args = ap.parse_args()
    with open(args.results) as f:
        r = json.load(f)

    variants = sorted({k.split("/")[1] for k in r if k.startswith("sthtune/")})
    if not variants:
        print("no sthtune/* rows yet in", args.results)
        return
    print(f"| variant | learned mAP | random mAP | oracle mAP | "
          f"gap recovery | reward first->last |")
    print("|---|---|---|---|---|---|")
    best = None
    for name in variants:
        g = lambda m: r.get(f"sthtune/{name}/{m}", {}).get("mAP")
        ln, rn, oc = g("learned"), g("random"), g("oracle")
        rec = ((ln - rn) / (oc - rn)
               if None not in (ln, rn, oc) and oc > rn else None)
        traj = reward_trajectory(
            os.path.join(args.workdir, "logs", f"train_tune_{name}.log"))
        cells = [
            name,
            f"{ln:.4f}" if ln is not None else "—",
            f"{rn:.4f}" if rn is not None else "—",
            f"{oc:.4f}" if oc is not None else "—",
            f"{rec * 100:.0f}%" if rec is not None else "—",
            (f"{traj[0]:+.4f} -> {traj[1]:+.4f} ({traj[2]} ep)"
             if traj else "—"),
        ]
        print("| " + " | ".join(cells) + " |")
        if rec is not None and (best is None or rec > best[1]):
            best = (name, rec)
    if best:
        print(f"\nwinner: {best[0]} (oracle-gap recovery {best[1] * 100:.0f}%)")


if __name__ == "__main__":
    main()
