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

    # int8 PTQ serving eval through the same surface
    r3 = _run("adafocus_tpu.cli.evaluate",
              TINY + [f"run.ckpt_dir={tmp_path / 'ev8'}", f"run.resume={ck}",
                      "run.dataset=actnet", "run.quantize=int8",
                      "run.quantize_batches=1"])
    assert r3.returncode == 0, r3.stdout + r3.stderr
    assert "int8 PTQ: calibrated" in r3.stdout
    assert "final: top1=" in r3.stdout

    # AOT export of the same checkpoint (serving.py artifact)
    art = str(tmp_path / "model.stablehlo")
    r4 = _run("adafocus_tpu.cli.export",
              ["--path", art, "--batch", "2"]
              + TINY + [f"run.ckpt_dir={tmp_path / 'exp'}",
                        f"run.resume={ck}", "run.dataset=actnet"])
    assert r4.returncode == 0, r4.stdout + r4.stderr
    assert "exported bf16 artifact" in r4.stdout
    assert os.path.getsize(art) > 1e6  # weights baked in


@pytest.mark.slow
def test_real_jpeg_pipeline_learns(tmp_path):
    """Real-data end to end: JPEG frame folders on disk + list files ->
    native decode -> device augmentation -> stage-0 training -> val.
    Classes are color-coded (trivially separable), so the run must end
    well above the 1/3 chance level — this pins the decode/augment/train
    composition on actual files, not synthetic arrays."""
    np = pytest.importorskip("numpy")
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path / "data"
    frames = root / "frames"
    frames.mkdir(parents=True)
    rng = np.random.default_rng(0)
    colors = np.asarray([[200, 40, 40], [40, 200, 40], [40, 40, 200]])

    def write_video(name, label):
        d = frames / name
        d.mkdir()
        for i in range(1, 5):
            img = np.clip(
                colors[label][None, None, :]
                + rng.normal(0, 20, (48, 48, 3)), 0, 255
            ).astype(np.uint8)
            Image.fromarray(img).save(d / f"image_{i:06d}.jpg")

    train_rows, val_rows = [], []
    for i in range(24):
        write_video(f"tr{i}", i % 3)
        train_rows.append(f"tr{i} 4 {i % 3}")
    for i in range(12):
        write_video(f"va{i}", i % 3)
        val_rows.append(f"va{i} 4 {i % 3}")
    (root / "train_split.txt").write_text("\n".join(train_rows))
    (root / "val_split.txt").write_text("\n".join(val_rows))

    ck = str(tmp_path / "ck_real")
    r = _run("adafocus_tpu.cli.train",
             TINY + ["run.stage=0", "run.synthetic_data=false",
                     "run.dataset=minik", f"run.data_root={root}",
                     "run.epochs=6", "model.num_classes=3",
                     "model.num_frames=4", "loader.batch_size=4",
                     "optim.backbone_lr=0.01", "optim.fc_lr=0.01",
                     f"run.ckpt_dir={ck}"],
             timeout=1100)
    assert r.returncode == 0, r.stdout + r.stderr
    import re

    top1s = [float(m) for m in re.findall(r"val: top1=([0-9.]+)", r.stdout)]
    assert top1s, r.stdout
    # early epochs sit at chance while BN running stats converge; the run
    # must end clearly above the 1/3 chance level (this exact setup
    # previously exposed the stale-batch-stats bug — tests/test_batchstats)
    assert max(top1s) > 0.5, (
        f"real-JPEG pipeline failed to learn color classes: {top1s}")


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
