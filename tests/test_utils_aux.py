"""Aux subsystem tests: torch weight conversion (numerics vs torch),
checkpoint save/resume/stage-loading, config loading, FLOPs counter,
visualization, profiling meters."""

import dataclasses
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

pytestmark = pytest.mark.smoke  # fast CPU tier: `pytest -m smoke`

# ---------------------------------------------------------------------------
# torch weight conversion
# ---------------------------------------------------------------------------


def test_convbn_numerics_vs_torch():
    """Converted conv+bn must reproduce torch's eval-mode output."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from adafocus_tpu.models.layers import ConvBNAct
    from adafocus_tpu.utils.torch_weights import _convbn

    tmod = tnn.Sequential(
        tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False),
        tnn.BatchNorm2d(8),
    ).eval()
    with torch.no_grad():
        tmod[1].running_mean.normal_()
        tmod[1].running_var.uniform_(0.5, 2.0)
        tmod[1].weight.normal_()
        tmod[1].bias.normal_()

    sd = {f"c.{k}": v for k, v in tmod[0].state_dict().items()}
    sd.update({f"b.{k}": v for k, v in tmod[1].state_dict().items()})
    params, stats = _convbn(sd, "c", "b")

    x = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    mod = ConvBNAct(8, kernel_size=3, strides=2, act=None)
    got = mod.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expect, atol=1e-4
    )


def _flax_to_torch_resnet_sd(params, stats, basic: bool):
    """Reverse-map a flax resnet tree into torchvision naming (test helper)."""
    sd = {}

    def put_convbn(prefix_c, prefix_b, p, s):
        sd[f"{prefix_c}.weight"] = np.transpose(p["conv"]["kernel"], (3, 2, 0, 1))
        sd[f"{prefix_b}.weight"] = p["bn"]["scale"]
        sd[f"{prefix_b}.bias"] = p["bn"]["bias"]
        sd[f"{prefix_b}.running_mean"] = s["bn"]["mean"]
        sd[f"{prefix_b}.running_var"] = s["bn"]["var"]

    put_convbn("conv1", "bn1", params["stem"], stats["stem"])
    for name in params:
        if not name.startswith("layer"):
            continue
        stage, j = name[5:].split("_")
        src = f"layer{stage}.{j}"
        p, s = params[name], stats[name]
        for c in (1, 2) if basic else (1, 2, 3):
            put_convbn(f"{src}.conv{c}", f"{src}.bn{c}", p[f"conv{c}"], s[f"conv{c}"])
        if "down" in p:
            put_convbn(f"{src}.downsample.0", f"{src}.downsample.1",
                       p["down"], s["down"])
    sd["fc.weight"] = params["fc"]["kernel"].T
    sd["fc.bias"] = params["fc"]["bias"]
    return sd


def test_convert_resnet18_roundtrip():
    from adafocus_tpu.models.resnet import resnet18
    from adafocus_tpu.utils.torch_weights import convert_resnet

    model = resnet18(num_classes=7)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    ref_p = jax.tree.map(np.asarray, variables["params"])
    ref_s = jax.tree.map(np.asarray, variables["batch_stats"])
    sd = _flax_to_torch_resnet_sd(ref_p, ref_s, basic=True)
    got_p, got_s = convert_resnet(sd, depth=18)
    assert jax.tree.structure(got_p) == jax.tree.structure(ref_p)
    for a, b in zip(jax.tree.leaves(got_p), jax.tree.leaves(ref_p)):
        np.testing.assert_array_equal(a, b)
    assert jax.tree.structure(got_s) == jax.tree.structure(ref_s)


def test_convert_mobilenet_roundtrip():
    from adafocus_tpu.models.mobilenet import MobileNetV2
    from adafocus_tpu.utils.torch_weights import _MBV2_BLOCKS, convert_mobilenet_v2

    model = MobileNetV2(num_classes=11)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    p = jax.tree.map(np.asarray, variables["params"])
    s = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = {}

    def put(prefix_c, prefix_b, pp, ss):
        sd[f"{prefix_c}.weight"] = np.transpose(pp["conv"]["kernel"], (3, 2, 0, 1))
        sd[f"{prefix_b}.weight"] = pp["bn"]["scale"]
        sd[f"{prefix_b}.bias"] = pp["bn"]["bias"]
        sd[f"{prefix_b}.running_mean"] = ss["bn"]["mean"]
        sd[f"{prefix_b}.running_var"] = ss["bn"]["var"]

    put("features.0.0", "features.0.1", p["stem"], s["stem"])
    idx = 1
    for i, n in enumerate(_MBV2_BLOCKS):
        for j in range(n):
            bp, bs = p[f"block_{i}_{j}"], s[f"block_{i}_{j}"]
            src = f"features.{idx}"
            if "expand" in bp:
                put(f"{src}.conv.0.0", f"{src}.conv.0.1", bp["expand"], bs["expand"])
                put(f"{src}.conv.1.0", f"{src}.conv.1.1", bp["dw"], bs["dw"])
                put(f"{src}.conv.2", f"{src}.conv.3", bp["project"], bs["project"])
            else:
                put(f"{src}.conv.0.0", f"{src}.conv.0.1", bp["dw"], bs["dw"])
                put(f"{src}.conv.1", f"{src}.conv.2", bp["project"], bs["project"])
            idx += 1
    put(f"features.{idx}.0", f"features.{idx}.1", p["head_conv"], s["head_conv"])
    sd["classifier.1.weight"] = p["classifier"]["kernel"].T
    sd["classifier.1.bias"] = p["classifier"]["bias"]

    got_p, got_s = convert_mobilenet_v2(sd)
    assert jax.tree.structure(got_p) == jax.tree.structure(p)
    for a, b in zip(jax.tree.leaves(got_p), jax.tree.leaves(p)):
        np.testing.assert_array_equal(a, b)


def test_merge_into_skips_mismatched_heads():
    from adafocus_tpu.utils.torch_weights import merge_into

    fresh = {"focuser": {"stem": {"conv": {"kernel": np.zeros((3, 3, 3, 8))}},
                         "fc": {"kernel": np.zeros((8, 10)), "bias": np.zeros(10)}},
             "policy": {"w": np.ones(2)}}
    conv_p = {"stem": {"conv": {"kernel": np.ones((3, 3, 3, 8))}},
              "fc": {"kernel": np.ones((8, 1000)), "bias": np.ones(1000)}}
    p, s = merge_into(fresh, {}, "focuser", conv_p, {})
    assert p["focuser"]["stem"]["conv"]["kernel"].mean() == 1.0  # copied
    assert p["focuser"]["fc"]["kernel"].shape == (8, 10)          # kept fresh
    assert p["policy"]["w"].mean() == 1.0                         # untouched


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------


def _tiny_state():
    from adafocus_tpu.models.gfv import GFV, GFVConfig
    from adafocus_tpu.train.optim import OptimConfig, make_stage_optimizer
    from adafocus_tpu.train.stages import create_train_state

    cfg = GFVConfig(num_classes=3, num_frames=2, image_size=24, glance_size=16,
                    patch_size=16, action_dim=4, hidden_dim=8, policy_hidden=8,
                    dtype=jnp.float32)
    model = GFV(cfg)
    tx = make_stage_optimizer(1, OptimConfig(epochs=1, steps_per_epoch=1))
    return model, tx, create_train_state(model, jax.random.key(0), tx=tx)


def test_checkpoint_save_load_resume(tmp_path):
    from adafocus_tpu.train import checkpoint as ckpt

    model, tx, state = _tiny_state()
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, state, epoch=3, acc=0.5, best_acc=0.5, is_best=True)
    tree = ckpt.load_checkpoint(d)
    assert tree is not None
    assert int(tree["meta"]["epoch"]) == 3
    assert ckpt.best_acc_of(tree) == 0.5
    restored = ckpt.restore_train_state(state, tree)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    best = ckpt.load_checkpoint(d, best=True)
    assert best is not None


def test_checkpoint_stage_components(tmp_path):
    from adafocus_tpu.train import checkpoint as ckpt

    model, tx, state = _tiny_state()
    # pretend a previous stage trained: bump glancer params by 1
    mutated = state.replace(params={
        **state.params,
        "glancer": jax.tree.map(lambda x: x + 1.0, state.params["glancer"]),
        "policy": jax.tree.map(lambda x: x + 1.0, state.params["policy"]),
    })
    d = str(tmp_path / "ck2")
    ckpt.save_checkpoint(d, mutated, 0, 0.1, 0.1)
    tree = ckpt.load_checkpoint(d)
    # stage 1 loads glancer+focuser only -> policy keeps fresh init
    warm = ckpt.load_stage_components(state, tree, stage=1)
    g0 = jax.tree.leaves(state.params["glancer"])[0]
    g1 = jax.tree.leaves(warm.params["glancer"])[0]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0) + 1.0)
    p0 = jax.tree.leaves(state.params["policy"])[0]
    p1 = jax.tree.leaves(warm.params["policy"])[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


def test_config_yaml_and_overrides(tmp_path):
    from adafocus_tpu.config import load_config

    y = tmp_path / "c.yaml"
    y.write_text(
        "run:\n  family: sthsth\n  epochs: 3\n"
        "model:\n  num_frames: 8\n  num_frames_focuser: 12\n"
        "  dtype: float32\n  patch_size: 144\n"
        "optim:\n  lr_steps: [10, 20]\n"
    )
    cfg = load_config(str(y), ["model.patch_size=160", "run.seed=7",
                               "optim.backbone_lr=0.02"])
    assert cfg.run.family == "sthsth" and cfg.run.epochs == 3
    assert cfg.model.patch_size == 160
    assert cfg.model.dtype == jnp.float32
    assert cfg.optim.lr_steps == (10, 20)
    assert cfg.optim.backbone_lr == 0.02
    # derived syncing
    assert cfg.loader.num_segments == 8
    assert cfg.loader.num_segments_focuser == 12
    assert cfg.augment.flip is False  # sthsth disables flip
    assert cfg.loader.seed == 7


def test_config_defaults_no_yaml():
    from adafocus_tpu.config import echo, load_config

    cfg = load_config(None, ["model.action_dim=25"])
    assert cfg.model.action_dim == 25
    assert "experiment config" in echo(cfg)


# ---------------------------------------------------------------------------
# flops counter
# ---------------------------------------------------------------------------


def test_xla_flops_matmul():
    from adafocus_tpu.ops.flops import gflops_per_video, xla_flops

    a = jnp.zeros((8, 64, 32))
    b = jnp.zeros((8, 32, 16))
    fl = xla_flops(lambda x, y: jnp.einsum("bij,bjk->bik", x, y), a, b)
    assert abs(fl - 2 * 8 * 64 * 32 * 16) / fl < 0.1
    g = gflops_per_video(lambda x, y: jnp.einsum("bij,bjk->bik", x, y), 8, a, b)
    assert abs(g - fl / 8 / 1e9) < 1e-12


# ---------------------------------------------------------------------------
# visualization + profiling
# ---------------------------------------------------------------------------


def test_visualize_patch_grid(tmp_path):
    pytest.importorskip("PIL")
    from adafocus_tpu.utils.visualize import denormalize, save_patch_grid

    frames = np.zeros((2, 3, 32, 32, 3), np.float32)
    offs = np.zeros((2, 3, 2), np.int64)
    offs[..., 0] = 4
    offs[..., 1] = 8
    path = str(tmp_path / "grid.png")
    save_patch_grid(path, frames, offs, patch_size=16)
    assert os.path.exists(path)
    from PIL import Image

    img = np.asarray(Image.open(path))
    assert img.shape == (2 * 32, 3 * 32, 3)
    # red box edge present at the patch corner of the first tile
    assert img[4, 8 : 24].max() > 200


def test_step_timer():
    from adafocus_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.data_ready()
    t.step_done(jnp.zeros(()))
    assert t.count == 1 and "ms/step" in t.summary()


def test_compilation_cache_enable_keyed_on_primary_platform(tmp_path):
    """The persistent-cache guard must trip on CPU-PRIMARY platform lists
    only. This environment resolves ``jax_platforms`` to ``"axon,cpu"``
    (runtime-appended CPU fallback); a substring test silently disabled
    the cache for every TPU run (regression: round 4)."""
    import subprocess
    import sys

    script = (
        "import jax, adafocus_tpu, sys\n"
        "jax.config.update('jax_platforms', sys.argv[1])\n"
        "adafocus_tpu.enable_compilation_cache(sys.argv[2])\n"
        "print(jax.config.jax_compilation_cache_dir)\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(platforms):
        out = subprocess.run(
            [sys.executable, "-c", script, platforms, str(tmp_path)],
            capture_output=True, text=True, timeout=120, env=env, cwd=repo,
        )
        assert out.returncode == 0, out.stderr
        return out.stdout.strip()

    assert run("cpu") == "None"            # CPU-primary: stays uncached
    assert run("cpu,tpu") == "None"        # still CPU-primary
    assert run("tpu,cpu") == str(tmp_path)  # accelerator-primary: cached


def test_device_lock_advisory_protocol(tmp_path):
    """Benches must wait for a LIVE training lock holder, break stale
    locks (dead pid) immediately, and the holder must clean up on exit —
    the mechanical form of PERF.md's "never bench during training" rule
    (round 3's BENCH_r03 was polluted by exactly this)."""
    import json
    import time

    from adafocus_tpu.utils.device_lock import (
        device_lock,
        wait_for_device,
    )

    path = str(tmp_path / "chip.lock")

    # free chip: returns immediately
    assert wait_for_device(path=path, timeout_secs=0.1, poll_secs=0.01)

    # held by THIS (live) process: bounded wait then contended=False
    with device_lock(note="train", path=path):
        t0 = time.time()
        assert not wait_for_device(path=path, timeout_secs=0.3,
                                   poll_secs=0.05)
        assert time.time() - t0 >= 0.3
    assert not os.path.exists(path)  # released on exit

    # stale lock (dead pid): treated as free, no wait
    with open(path, "w") as f:
        json.dump({"pid": 2 ** 22 + 12345, "note": "crashed"}, f)
    assert wait_for_device(path=path, timeout_secs=5, poll_secs=0.01)

    # corrupt lock file: treated as free rather than wedging the bench
    with open(path, "w") as f:
        f.write("not json")
    assert wait_for_device(path=path, timeout_secs=5, poll_secs=0.01)
