"""mini-ActivityNet accuracy harness: the full AdaFocus recipe, end to end,
on real hardware, with policy-quality accuracy evidence.

Runs (resumable; each phase skipped when its artifacts exist):

  1. dataset    generate the mini-ActivityNet proxy benchmark
                (adafocus_tpu/data/miniact.py) if absent.
  2. base       the reference's 4-stage recipe chained through checkpoints
                (stage 0 backbone pretrain -> 1 joint random-patch -> 2 PPO
                spatial policy -> 3 classifier finetune), mirroring
                /root/reference actnet/main_dist.py:424-571 + README stage
                commands.
  3. baselines  eval mAP/top-1 of the SAME stage-3 weights under four patch
                policies: learned (greedy PPO), random, center, and the
                ground-truth oracle — the bracket that shows the learned
                policy's quality (learned > random > center, learned ->
                oracle).
  4. int8       int8 PTQ eval on the learned checkpoint: accuracy delta vs
                bf16 for the +17-23% serving-throughput path.
  5. frontier   AdaFocus+ accuracy-vs-budget: K in {T/4, T/2, 3T/4, T} for
                both selector variants (ST top-K and joint-RL plus_rl).
  6. sthsth     the sth-sth family flagship RL recipe — TSM backbones,
                dual-rate sampling, per-division CONTINUOUS Gaussian PPO
                (reference sthsth/stage2.py:214-286,
                models/ppo_continuous.py:142-196) — with the same
                learned/random/center/oracle eval bracket.
  7. hard       stages 1-3 + the eval bracket at the spatially-demanding
                operating point (glance 96² — the glance shows WHERE the
                target is but cannot read class identity). The default
                224²-glance brackets saturate (the glancer alone solves
                miniact); this is where policy quality is measurable.
  8. sthhard    same hard operating point for the sth-sth continuous
                divisional PPO.

Each training/eval runs as a subprocess of the real CLIs (cli/train.py,
cli/evaluate.py) — this harness only sequences them and collects numbers
into ``--results`` (JSON) + a markdown table on stdout.

Usage:
  python benchmarks/miniact_harness.py                  # full, on TPU
  python benchmarks/miniact_harness.py --tiny           # CPU smoke
  python benchmarks/miniact_harness.py --phases base,baselines
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# configuration profiles
# ---------------------------------------------------------------------------

def profiles(args):
    """(dataset generation argv, shared CLI overrides, per-stage epochs)."""
    if args.tiny:
        gen = ["--classes", "4", "--train-per-class", "6",
               "--val-per-class", "3", "--frames", "4", "--canvas", "64"]
        base = [
            "run.platform=cpu", "run.dataset=miniact",
            f"run.data_root={args.dataset}",
            "model.num_classes=4", "model.num_frames=4",
            "model.image_size=32", "model.glance_size=16",
            "model.patch_size=16", "model.action_dim=4",
            "model.hidden_dim=16", "model.policy_hidden=16",
            "model.dtype=float32",
            "loader.batch_size=4", "loader.canvas_size=40",
            "loader.cache=host", "run.print_freq=100",
        ]
        epochs = {"s0": 2, "s1": 2, "s2": 2, "s3": 1,
                  "plus1": 1, "plus2": 1, "sth1": 2, "sth2": 2}
        budgets = [2, 4]
        sth = ["model.num_frames=4", "model.num_frames_focuser=4",
               "model.video_div=2"]
    else:
        gen = ["--classes", "50", "--train-per-class", "24",
               "--val-per-class", "8", "--frames", "16", "--canvas", "256"]
        # the flagship ActivityNet operating point (reference
        # conf/default.yaml: 16 frames, 224^2 glance, 96^2 patches,
        # 49-anchor policy), bf16 on the TPU chip
        base = [
            "run.dataset=miniact", f"run.data_root={args.dataset}",
            "model.num_classes=50", "model.num_frames=16",
            "model.image_size=224", "model.glance_size=224",
            "model.patch_size=96", "model.action_dim=49",
            # per-block remat: the B=32x16-frame train steps must share HBM
            # with the device-resident dataset cache (models/gfv.py remat)
            "model.remat=true",
            "loader.batch_size=32", "loader.canvas_size=256",
            "loader.cache=device", "run.print_freq=20",
            "run.eval_freq=5",
        ]
        epochs = {"s0": 25, "s1": 20, "s2": 30, "s3": 10,
                  "plus1": 8, "plus2": 8, "sth1": 20, "sth2": 25}
        # two trained budget points (compiles dominate: every K is a
        # distinct XLA program, so each extra budget costs ~2 cold
        # compiles x 2 selector variants); the base eval supplies the
        # K=T=16 end of the frontier
        budgets = [4, 12]
        sth = ["model.num_frames=8", "model.num_frames_focuser=12",
               "model.video_div=2"]
    return gen, base, epochs, budgets, sth


# ---------------------------------------------------------------------------
# subprocess plumbing
# ---------------------------------------------------------------------------

def run_cli(module: str, overrides, log_path: str) -> str:
    """Run a CLI module as a subprocess, teeing output to ``log_path``;
    returns captured stdout+stderr text. Raises on nonzero exit."""
    cmd = [sys.executable, "-m", module] + list(overrides)
    t0 = time.time()
    print(f"  $ {' '.join(cmd[2:])}", flush=True)
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    with open(log_path, "w") as f:
        f.write(out)
    if proc.returncode != 0:
        print(out[-4000:])
        raise RuntimeError(
            f"{module} failed (rc={proc.returncode}); log: {log_path}")
    print(f"    done in {time.time() - t0:.0f}s", flush=True)
    return out


def parse_final(out: str) -> dict:
    """'final: top1=0.91 top5=0.99 mAP=0.95' -> dict."""
    m = re.findall(r"final:((?: \w+=[0-9.]+)+)", out)
    if not m:
        raise RuntimeError("no 'final:' line in eval output")
    return {k: float(v) for k, v in re.findall(r"(\w+)=([0-9.]+)", m[-1])}


def parse_best(out: str) -> float:
    m = re.findall(r"done\. best acc ([0-9.]+)", out)
    return float(m[-1]) if m else float("nan")


def parse_anytime(out: str):
    m = re.findall(r"anytime mAP per timestep: ([0-9. ]+)", out)
    return [float(x) for x in m[-1].split()] if m else None


class Harness:
    def __init__(self, args):
        self.args = args
        self.gen_args, self.base, self.epochs, self.budgets, self.sth = \
            profiles(args)
        self.work = args.workdir
        os.makedirs(self.work, exist_ok=True)
        self.results_path = args.results
        self.results = {}
        if os.path.exists(self.results_path):
            with open(self.results_path) as f:
                self.results = json.load(f)

    def save(self):
        os.makedirs(os.path.dirname(self.results_path) or ".", exist_ok=True)
        with open(self.results_path, "w") as f:
            json.dump(self.results, f, indent=1)

    def ck(self, name: str) -> str:
        return os.path.join(self.work, f"ck_{name}")

    def train(self, name: str, overrides) -> float:
        """Train once (skipped if the done-marker exists); returns best acc."""
        ck = self.ck(name)
        marker = os.path.join(ck, ".harness_done")
        if os.path.exists(marker):
            with open(marker) as f:
                return float(f.read().strip() or "nan")
        out = run_cli(
            "adafocus_tpu.cli.train",
            list(overrides) + [f"run.ckpt_dir={ck}"],
            os.path.join(self.work, "logs", f"train_{name}.log"),
        )
        best = parse_best(out)
        with open(marker, "w") as f:
            f.write(str(best))
        return best

    def evaluate(self, key: str, ckpt_name: str, overrides) -> dict:
        if key in self.results:
            return self.results[key]
        out = run_cli(
            "adafocus_tpu.cli.evaluate",
            list(overrides) + [f"run.resume={self.ck(ckpt_name)}",
                               f"run.ckpt_dir={self.ck(ckpt_name)}"],
            os.path.join(self.work, "logs", f"eval_{key}.log"),
        )
        res = parse_final(out)
        anytime = parse_anytime(out)
        if anytime:
            res["anytime_mAP"] = anytime
        self.results[key] = res
        self.save()
        return res

    # -- phases -------------------------------------------------------------

    def phase_dataset(self):
        if os.path.exists(os.path.join(self.args.dataset, "gt.npz")):
            return
        print("[dataset] generating mini-ActivityNet ...", flush=True)
        subprocess.run(
            [sys.executable, "-m", "adafocus_tpu.data.miniact",
             "--root", self.args.dataset] + self.gen_args,
            cwd=REPO, check=True)

    def phase_base(self):
        b, e = self.base, self.epochs
        print("[base] stage 0 (backbone pretrain)")
        self.results["train/s0"] = self.train(
            "s0", b + ["run.stage=0", f"run.epochs={e['s0']}"])
        print("[base] stage 1 (joint, random patches)")
        self.results["train/s1"] = self.train(
            "s1", b + ["run.stage=1", f"run.epochs={e['s1']}",
                       f"run.warm_start={self.ck('s0')}"])
        print("[base] stage 2 (spatial PPO)")
        self.results["train/s2"] = self.train(
            "s2", b + ["run.stage=2", f"run.epochs={e['s2']}",
                       f"run.warm_start={self.ck('s1')}"])
        print("[base] stage 3 (classifier finetune, frozen greedy policy)")
        self.results["train/s3"] = self.train(
            "s3", b + ["run.stage=3", f"run.epochs={e['s3']}",
                       f"run.warm_start={self.ck('s2')}"])
        self.save()

    def phase_baselines(self):
        gt = os.path.join(self.args.dataset, "gt.npz")
        for mode in ("learned", "random", "center", "oracle"):
            ov = self.base + [f"run.eval_policy={mode}",
                              "run.anytime_eval=true"]
            if mode == "oracle":
                ov.append(f"run.oracle_gt={gt}")
            print(f"[baselines] eval_policy={mode}")
            self.evaluate(f"eval/{mode}", "s3", ov)

    def phase_int8(self):
        print("[int8] PTQ eval on the learned checkpoint (serving default: "
              "int8 backbones + transport, bf16 heads)")
        self.evaluate(
            "eval/int8", "s3",
            self.base + ["run.quantize=int8", "run.quantize_batches=4"])
        print("[int8] PTQ eval with quantized heads (opt-in: measured "
              "throughput-neutral, -4.5 top-1 — PERF.md round 4)")
        self.evaluate(
            "eval/int8_heads", "s3",
            self.base + ["run.quantize=int8", "run.quantize_batches=4",
                         "run.quantize_heads=true"])

    def phase_frontier(self):
        b, e = self.base, self.epochs
        for k in self.budgets:
            st = f"plusK{k}"
            print(f"[frontier] ST selector, K={k}")
            self.train(
                st + "_s1",
                b + [f"model.frame_budget={k}", "run.stage=1",
                     f"run.epochs={e['plus1']}",
                     f"run.warm_start={self.ck('s1')}"])
            self.train(
                st + "_s2",
                b + [f"model.frame_budget={k}", "run.stage=2",
                     f"run.epochs={e['plus2']}",
                     f"run.warm_start={self.ck(st + '_s1')}"])
            self.evaluate(
                f"frontier/st_K{k}", st + "_s2",
                b + [f"model.frame_budget={k}"])
            rl = f"plusrlK{k}"
            print(f"[frontier] joint-RL selector (plus_rl), K={k}")
            self.train(
                rl + "_s1",
                b + [f"model.frame_budget={k}", "model.plus_rl=true",
                     "run.stage=1", f"run.epochs={e['plus1']}",
                     f"run.warm_start={self.ck('s1')}"])
            self.train(
                rl + "_s2",
                b + [f"model.frame_budget={k}", "model.plus_rl=true",
                     "run.stage=2", f"run.epochs={e['plus2']}",
                     f"run.warm_start={self.ck(rl + '_s1')}"])
            self.evaluate(
                f"frontier/rl_K{k}", rl + "_s2",
                b + [f"model.frame_budget={k}", "model.plus_rl=true"])

    def phase_hard(self):
        """The spatially-demanding operating point: glance_size drops so
        the downsampled glance can no longer resolve the ~8px motif cells
        that carry class identity (at 224->96 they shrink to ~3.4px, below
        the MobileNet stem's resolving power) while still showing WHERE the
        marked target tile is; only the full-res 96^2 patch reads the
        motif. Patch location now matters — oracle >> random — giving
        stage-2's PPO real reward signal. This is the regime the reference
        is built for (cheap global scan -> localize -> expensive local
        look, README.md:28-30): the default glance_size=224 bracket
        saturates on miniact because the glancer solves the task alone."""
        g = 8 if self.args.tiny else 96
        hb = [o for o in self.base
              if not o.startswith("model.glance_size=")]
        hb += [f"model.glance_size={g}"]
        e = self.epochs
        print(f"[hard] stage 1 (joint, random patches, glance {g})")
        self.results["hard/s1"] = self.train(
            "h1", hb + ["run.stage=1", f"run.epochs={e['s1']}",
                        f"run.warm_start={self.ck('s0')}"])
        print("[hard] stage 2 (spatial PPO)")
        self.results["hard/s2"] = self.train(
            "h2", hb + ["run.stage=2", f"run.epochs={e['s2']}",
                        f"run.warm_start={self.ck('h1')}"])
        print("[hard] stage 3 (classifier finetune, frozen greedy policy)")
        self.results["hard/s3"] = self.train(
            "h3", hb + ["run.stage=3", f"run.epochs={e['s3']}",
                        f"run.warm_start={self.ck('h2')}"])
        self.save()
        gt = os.path.join(self.args.dataset, "gt.npz")
        for mode in ("learned", "random", "center", "oracle"):
            ov = hb + [f"run.eval_policy={mode}", "run.anytime_eval=true"]
            if mode == "oracle":
                ov.append(f"run.oracle_gt={gt}")
            print(f"[hard] eval_policy={mode}")
            self.evaluate(f"hard/{mode}", "h3", ov)
        self.save()

    def phase_sthsth(self):
        b = [o for o in self.base
             if not o.startswith(("model.num_frames",))]
        b += self.sth + ["run.family=sthsth", "model.tsm=true",
                         "model.classifier=consensus",
                         "model.continuous_policy=true"]
        e = self.epochs
        print("[sthsth] stage 1 (TSM joint, random patches; glancer warm "
              "from base stage 0)")
        self.results["train/sth1"] = self.train(
            "sth1", b + ["run.stage=1", f"run.epochs={e['sth1']}",
                         f"run.warm_start={self.ck('s0')}"])
        print("[sthsth] stage 2 (per-division continuous Gaussian PPO)")
        self.results["train/sth2"] = self.train(
            "sth2", b + ["run.stage=2", f"run.epochs={e['sth2']}",
                         f"run.warm_start={self.ck('sth1')}"])
        gt = os.path.join(self.args.dataset, "gt.npz")
        for mode in ("learned", "random", "center", "oracle"):
            ov = b + [f"run.eval_policy={mode}"]
            if mode == "oracle":
                ov.append(f"run.oracle_gt={gt}")
            print(f"[sthsth] eval_policy={mode}")
            self.evaluate(f"sthsth/{mode}", "sth2", ov)
        self.save()

    def phase_sthhard(self):
        """sth-sth family at the spatially-demanding operating point
        (glance 96², see phase_hard): the continuous per-division Gaussian
        PPO (reference sthsth/models/ppo_continuous.py:142-196) must
        localize the marked tile from a glance that cannot read motifs.
        The default-glance sth-sth bracket saturates just like actnet's
        (oracle headroom ~2 mAP); this is the bracket where the policy's
        quality is measurable."""
        g = 8 if self.args.tiny else 96
        b = [o for o in self.base
             if not o.startswith(("model.num_frames",
                                  "model.glance_size="))]
        b += self.sth + [f"model.glance_size={g}", "run.family=sthsth",
                         "model.tsm=true", "model.classifier=consensus",
                         "model.continuous_policy=true"]
        e = self.epochs
        print(f"[sthhard] stage 1 (TSM joint, random patches, glance {g})")
        self.results["sthhard/s1"] = self.train(
            "sh1", b + ["run.stage=1", f"run.epochs={e['sth1']}",
                        f"run.warm_start={self.ck('s0')}"])
        print("[sthhard] stage 2 (per-division continuous Gaussian PPO)")
        self.results["sthhard/s2"] = self.train(
            "sh2", b + ["run.stage=2", f"run.epochs={e['sth2']}",
                        f"run.warm_start={self.ck('sh1')}"])
        gt = os.path.join(self.args.dataset, "gt.npz")
        for mode in ("learned", "random", "center", "oracle"):
            ov = b + [f"run.eval_policy={mode}"]
            if mode == "oracle":
                ov.append(f"run.oracle_gt={gt}")
            print(f"[sthhard] eval_policy={mode}")
            self.evaluate(f"sthhard/{mode}", "sh2", ov)
        self.save()

    # -- reporting ----------------------------------------------------------

    def report(self):
        r = self.results
        lines = ["", "## mini-ActivityNet results", ""]

        def row(key):
            d = r.get(key, {})
            return (f"{d.get('mAP', float('nan')):.4f} | "
                    f"{d.get('top1', float('nan')):.4f}")

        if "eval/learned" in r:
            lines += ["| patch policy | mAP | top-1 |", "|---|---|---|"]
            for mode in ("oracle", "learned", "random", "center"):
                if f"eval/{mode}" in r:
                    lines.append(f"| {mode} | {row(f'eval/{mode}')} |")
        if "eval/int8" in r:
            lines.append(f"| learned (int8) | {row('eval/int8')} |")
        if "eval/int8_heads" in r:
            lines.append(
                f"| learned (int8+heads) | {row('eval/int8_heads')} |")
        hard = [k for k in r if k.startswith("hard/") and "/" in k
                and isinstance(r[k], dict)]
        if hard:
            lines += ["", "| hard (glance 96) policy | mAP | top-1 |",
                      "|---|---|---|"]
            for mode in ("oracle", "learned", "random", "center"):
                if f"hard/{mode}" in r:
                    lines.append(f"| {mode} | {row(f'hard/{mode}')} |")
        front = [k for k in r if k.startswith("frontier/")]
        if front:
            lines += ["", "| AdaFocus+ | mAP | top-1 |", "|---|---|---|"]
            for key in sorted(front):
                lines.append(f"| {key[9:]} | {row(key)} |")
        sthh = [k for k in r if k.startswith("sthhard/")
                and isinstance(r[k], dict)]
        if sthh:
            lines += ["", "| sth-sth hard (glance 96) policy | mAP | top-1 |",
                      "|---|---|---|"]
            for mode in ("oracle", "learned", "random", "center"):
                if f"sthhard/{mode}" in r:
                    lines.append(f"| {mode} | {row(f'sthhard/{mode}')} |")
        sth = [k for k in r if k.startswith("sthsth/")]
        if sth:
            lines += ["", "| sth-sth policy | mAP | top-1 |", "|---|---|---|"]
            for key in ("sthsth/oracle", "sthsth/learned", "sthsth/random",
                        "sthsth/center"):
                if key in r:
                    lines.append(f"| {key[7:]} | {row(key)} |")
        print("\n".join(lines))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default=os.path.join(REPO, ".data/miniact"))
    ap.add_argument("--workdir", default=os.path.join(REPO, ".data/miniact_work"))
    ap.add_argument("--results",
                    default=os.path.join(REPO, "benchmarks/miniact_results.json"))
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke profile (tiny dataset + model)")
    ap.add_argument("--phases",
                    default="dataset,base,baselines,hard,int8,sthsth,sthhard,frontier")
    args = ap.parse_args(argv)
    h = Harness(args)
    for phase in args.phases.split(","):
        getattr(h, f"phase_{phase.strip()}")()
        h.save()
    h.report()


if __name__ == "__main__":
    main()
