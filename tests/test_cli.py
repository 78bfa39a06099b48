"""End-to-end CLI regression: one tiny synthetic training run + evaluate
with checkpoint resume, through the real argv surface (both families)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "model.num_classes=5", "model.num_frames=2", "model.image_size=24",
    "model.glance_size=16", "model.patch_size=16", "model.action_dim=4",
    "model.hidden_dim=8", "model.policy_hidden=8", "model.dtype=float32",
    "loader.batch_size=2", "loader.canvas_size=32", "loader.num_workers=1",
    "run.platform=cpu", "run.synthetic_data=true", "run.synthetic_videos=4",
    "run.epochs=1", "run.print_freq=1",
]


def _run(module, args, timeout=420):
    # strip the 8-virtual-device XLA_FLAGS the test conftest sets — the
    # subprocess must see a plain 1-device CPU
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    return subprocess.run(
        [sys.executable, "-m", module] + args,
        cwd=REPO, capture_output=True, text=True, timeout=timeout, env=env,
    )


@pytest.mark.slow
def test_train_then_evaluate_actnet(tmp_path):
    ck = str(tmp_path / "ck")
    r = _run("adafocus_tpu.cli.train",
             TINY + ["run.stage=1", f"run.ckpt_dir={ck}", "run.dataset=actnet"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "checkpoint saved" in r.stdout and "done." in r.stdout
    assert os.path.exists(os.path.join(ck, "checkpoint"))
    assert os.path.exists(os.path.join(ck, "training.log"))

    r2 = _run("adafocus_tpu.cli.evaluate",
              TINY + [f"run.ckpt_dir={tmp_path / 'ev'}", f"run.resume={ck}",
                      "run.dataset=actnet"])
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "final: top1=" in r2.stdout


@pytest.mark.slow
def test_train_sthsth_stage2(tmp_path):
    ck = str(tmp_path / "ck2")
    r = _run("adafocus_tpu.cli.train",
             TINY + ["run.stage=2", "run.family=sthsth",
                     "run.dataset=somethingv1", "model.classifier=consensus",
                     "model.tsm=true", "model.num_frames_focuser=4",
                     "model.video_div=2", f"run.ckpt_dir={ck}"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ppo/loss" in r.stdout and "done." in r.stdout
