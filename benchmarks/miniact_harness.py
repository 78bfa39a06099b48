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
                  "plus1": 1, "plus2": 1, "sth1": 2, "sth2": 2, "sth3": 1}
        budgets = [2, 4]
        sth = ["model.num_frames=4", "model.num_frames_focuser=4",
               "model.video_div=2", "model.action_std=0.25",
               "model.policy_channels=8", "model.policy_bn=true"]
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
                  "plus1": 8, "plus2": 8, "sth1": 20, "sth2": 25, "sth3": 10}
        # two trained budget points (compiles dominate: every K is a
        # distinct XLA program, so each extra budget costs ~2 cold
        # compiles x 2 selector variants); the base eval supplies the
        # K=T=16 end of the frontier
        budgets = [4, 12]
        # action_std 0.25 + the 64-ch BatchNorm state encoder are the
        # reference's published stage-2 recipe (sthsth/train_stage2.sh:
        # action_std=0.25 actorcritic_with_bn=True; the conf-yaml default
        # 0.1 was round 4's under-exploring setting, and round 4's harness
        # also silently ran the actnet 32-ch BN-free encoder because these
        # overrides never loaded configs/sthsth_default.yaml)
        sth = ["model.num_frames=8", "model.num_frames_focuser=12",
               "model.video_div=2", "model.action_std=0.25",
               "model.policy_channels=64", "model.policy_bn=true"]
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
        self.seeds = [int(s) for s in str(args.seeds).split(",") if s]
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

    def aggregate(self, key: str, seed_keys) -> dict:
        """mean +- std over per-seed eval rows -> self.results[key]."""
        import statistics

        present = [k for k in seed_keys if k in self.results]
        rows = [self.results[k] for k in present]
        agg = {}
        for field in ("mAP", "top1", "top5"):
            xs = [r[field] for r in rows if field in r]
            if xs:
                agg[field] = statistics.mean(xs)
                agg[field + "_std"] = (statistics.pstdev(xs)
                                       if len(xs) > 1 else 0.0)
        agg["n_seeds"] = len(rows)
        agg["per_seed"] = {k.rsplit("@", 1)[-1]: {
            f: r[f] for f in ("mAP", "top1") if f in r}
            for k, r in zip(present, rows)}
        self.results[key] = agg
        self.save()
        return agg

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
        # test-time multi-crop fans (reference GroupOverSample /
        # GroupFullResSample, actnet/ops/transforms.py:255-336): accuracy
        # delta vs the center-crop learned row above; throughput cost is
        # benched separately (benchmarks/run_benchmarks.py)
        for crops in ("oversample", "full_res"):
            print(f"[baselines] eval_crops={crops}")
            self.evaluate(
                f"eval/{crops}", "s3",
                self.base + [f"augment.eval_crops={crops}"])

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
        """AdaFocus+ accuracy-vs-budget, seed-replicated: the round-4
        RL-vs-ST margins were +0.24..+0.56 mAP from single runs — thinner
        than single-run noise — so both selector variants retrain per seed
        (from the shared base s1) and the reported rows are mean +- std."""
        b, e = self.base, self.epochs
        for k in self.budgets:
            for tag, extra in (("st", []), ("rl", ["model.plus_rl=true"])):
                print(f"[frontier] {tag.upper()} selector, K={k}, "
                      f"seeds {self.seeds}")
                seed_keys = []
                for seed in self.seeds:
                    name = f"plus{tag}K{k}_{seed}"
                    sb = b + extra + [f"model.frame_budget={k}",
                                      f"run.seed={seed}"]
                    self.train(
                        name + "_s1",
                        sb + ["run.stage=1", f"run.epochs={e['plus1']}",
                              f"run.warm_start={self.ck('s1')}"])
                    self.train(
                        name + "_s2",
                        sb + ["run.stage=2", f"run.epochs={e['plus2']}",
                              f"run.warm_start={self.ck(name + '_s1')}"])
                    key = f"frontier/{tag}_K{k}@{seed}"
                    self.evaluate(key, name + "_s2", sb)
                    seed_keys.append(key)
                self.aggregate(f"frontier/{tag}_K{k}", seed_keys)

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

    def _sth_hard_base(self):
        g = 8 if self.args.tiny else 96
        b = [o for o in self.base
             if not o.startswith(("model.num_frames",
                                  "model.glance_size="))]
        return b + self.sth + [
            f"model.glance_size={g}", "run.family=sthsth",
            "model.tsm=true", "model.classifier=consensus",
            "model.continuous_policy=true"], g

    def phase_sthtune(self):
        """Stage-2 recipe sweep for the sth-sth continuous divisional PPO
        at the hard operating point — round 4's bracket showed it barely
        localizing (15% oracle-gap recovery vs the discrete policy's 57%).
        Each variant trains sh2 from the SHARED sh1 and is judged by the
        learned-vs-random margin evaluated directly on the sh2 weights (no
        stage 3 — the comparison isolates the policy). Swept knobs per the
        reference recipe space: action_std (train_stage2.sh uses 0.25),
        video_div (conf/stage2.yaml default is 1 — one action per video),
        reward mode (actnet get_reward modes on divisional credit)."""
        b, g = self._sth_hard_base()
        e = self.epochs
        print(f"[sthtune] stage 1 (shared with sthhard, glance {g})")
        self.results["sthhard/s1"] = self.train(
            "sh1", b + ["run.stage=1", f"run.epochs={e['sth1']}",
                        f"run.warm_start={self.ck('s0')}"])
        variants = {
            # name: (overrides on top of the std-0.25 div-2 default)
            "std025_div2": [],
            "std010_div2": ["model.action_std=0.1"],
            "std050_div2": ["model.action_std=0.5"],
            "std025_div1": ["model.video_div=1"],
            "std025_div2_conf": ["ppo.reward_mode=conf"],
            "std025_div2_prev": ["ppo.reward_mode=prev"],
        }
        gt = os.path.join(self.args.dataset, "gt.npz")
        for name, extra in variants.items():
            vb = b + extra
            print(f"[sthtune] variant {name}: stage 2 from shared sh1")
            self.train(
                f"tune_{name}",
                vb + ["run.stage=2", f"run.epochs={e['sth2']}",
                      f"run.warm_start={self.ck('sh1')}"])
            for mode in ("learned", "random", "oracle"):
                ov = vb + [f"run.eval_policy={mode}"]
                if mode == "oracle":
                    ov.append(f"run.oracle_gt={gt}")
                self.evaluate(f"sthtune/{name}/{mode}", f"tune_{name}", ov)
        self.save()

    def phase_sthhard(self):
        """sth-sth family at the spatially-demanding operating point
        (glance 96², see phase_hard): the continuous per-division Gaussian
        PPO (reference sthsth/models/ppo_continuous.py:142-196) must
        localize the marked tile from a glance that cannot read motifs.
        The full 3-stage recipe (the reference's stage3.py classifier
        finetune included), seed-replicated: stage 1 is policy-independent
        (random patches) and shared; stages 2+3 and the eval bracket rerun
        per seed; reported rows are mean +- std."""
        b, g = self._sth_hard_base()
        e = self.epochs
        print(f"[sthhard] stage 1 (TSM joint, random patches, glance {g})")
        self.results["sthhard/s1"] = self.train(
            "sh1", b + ["run.stage=1", f"run.epochs={e['sth1']}",
                        f"run.warm_start={self.ck('s0')}"])
        # stage 1 is random-patch and recipe-independent; the sthtune
        # winner's overrides apply to stages 2/3 and the eval bracket
        b += [o for o in str(self.args.sth_extra).split(",") if o]
        gt = os.path.join(self.args.dataset, "gt.npz")
        mode_keys = {m: [] for m in ("learned", "random", "center", "oracle")}
        for seed in self.seeds:
            sb = b + [f"run.seed={seed}"]
            print(f"[sthhard] seed {seed}: stage 2 (per-division continuous "
                  "Gaussian PPO)")
            self.results[f"sthhard/s2@{seed}"] = self.train(
                f"sh2_{seed}",
                sb + ["run.stage=2", f"run.epochs={e['sth2']}",
                      f"run.warm_start={self.ck('sh1')}"])
            print(f"[sthhard] seed {seed}: stage 3 (classifier finetune, "
                  "frozen greedy policy)")
            self.results[f"sthhard/s3@{seed}"] = self.train(
                f"sh3_{seed}",
                sb + ["run.stage=3", f"run.epochs={e['sth3']}",
                      f"run.warm_start={self.ck(f'sh2_{seed}')}"])
            for mode in ("learned", "random", "center", "oracle"):
                ov = sb + [f"run.eval_policy={mode}"]
                if mode == "oracle":
                    ov.append(f"run.oracle_gt={gt}")
                print(f"[sthhard] seed {seed}: eval_policy={mode}")
                key = f"sthhard/{mode}@{seed}"
                self.evaluate(key, f"sh3_{seed}", ov)
                mode_keys[mode].append(key)
            self.save()
        for mode, keys in mode_keys.items():
            self.aggregate(f"sthhard/{mode}", keys)
        # oracle-gap recovery per seed: (learned - random)/(oracle - random)
        rec = []
        for seed in self.seeds:
            ln = self.results.get(f"sthhard/learned@{seed}", {})
            rn = self.results.get(f"sthhard/random@{seed}", {})
            oc = self.results.get(f"sthhard/oracle@{seed}", {})
            if all("mAP" in d for d in (ln, rn, oc)) and \
                    oc["mAP"] > rn["mAP"]:
                rec.append((ln["mAP"] - rn["mAP"]) / (oc["mAP"] - rn["mAP"]))
        if rec:
            self.results["sthhard/oracle_gap_recovery"] = {
                "per_seed": rec, "mean": sum(rec) / len(rec)}
        self.save()

    # -- reporting ----------------------------------------------------------

    def report(self):
        r = self.results
        lines = ["", "## mini-ActivityNet results", ""]

        def row(key):
            d = r.get(key, {})

            def cell(f):
                if f not in d:
                    return "nan"
                s = f"{d[f]:.4f}"
                if d.get(f + "_std") is not None and d.get("n_seeds", 1) > 1:
                    s += f" ±{d[f + '_std']:.4f}"
                return s

            return f"{cell('mAP')} | {cell('top1')}"

        if "eval/learned" in r:
            lines += ["| patch policy | mAP | top-1 |", "|---|---|---|"]
            for mode in ("oracle", "learned", "random", "center"):
                if f"eval/{mode}" in r:
                    lines.append(f"| {mode} | {row(f'eval/{mode}')} |")
        for key, label in (("eval/int8", "learned (int8)"),
                           ("eval/int8_heads", "learned (int8+heads)"),
                           ("eval/oversample", "learned (oversample x10)"),
                           ("eval/full_res", "learned (full_res x3)")):
            if key in r:
                lines.append(f"| {label} | {row(key)} |")
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
            rec = r.get("sthhard/oracle_gap_recovery")
            if rec:
                lines.append(f"\noracle-gap recovery: mean {rec['mean']:.2f}"
                             f" (per seed: "
                             + " ".join(f"{x:.2f}" for x in rec["per_seed"])
                             + ")")
        tune = sorted({k.split("/")[1] for k in r
                       if k.startswith("sthtune/")})
        if tune:
            lines += ["", "| sthtune variant | learned mAP | random mAP "
                          "| oracle mAP |", "|---|---|---|---|"]
            for name in tune:
                cells = [
                    f"{r.get(f'sthtune/{name}/{m}', {}).get('mAP', float('nan')):.4f}"
                    for m in ("learned", "random", "oracle")]
                lines.append(f"| {name} | " + " | ".join(cells) + " |")
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
    ap.add_argument("--seeds", default="1007",
                    help="comma-separated run.seed list for the seed-"
                         "replicated phases (frontier, sthhard)")
    ap.add_argument("--sth-extra", default="",
                    help="comma-separated extra overrides for the sthhard "
                         "stages 2/3 + evals (the sthtune winner's recipe)")
    ap.add_argument("--phases",
                    default="dataset,base,baselines,hard,int8,sthsth,"
                            "sthtune,sthhard,frontier")
    args = ap.parse_args(argv)
    h = Harness(args)

    import contextlib

    from adafocus_tpu.utils.device_lock import device_lock

    # hold the advisory chip lock so driver/user benches wait instead of
    # timing against this training (PERF.md round-4 integrity note); the
    # tiny profile is CPU-only and takes no lock
    lock = (contextlib.nullcontext() if args.tiny
            else device_lock(note="miniact_harness"))
    with lock:
        for phase in args.phases.split(","):
            getattr(h, f"phase_{phase.strip()}")()
            h.save()
    h.report()


if __name__ == "__main__":
    main()
