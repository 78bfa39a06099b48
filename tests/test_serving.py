"""AOT export/serving (adafocus_tpu/serving.py): serialize the deployment
forward to StableHLO bytes, reload without model code, numerically match
the direct forward — per family and for the int8 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adafocus_tpu.models.gfv import GFV, GFVConfig, inference
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.serving import export_inference, load_exported, save_exported
from adafocus_tpu.train.stages import create_train_state


def _tiny_cfg(**kw):
    base = dict(
        num_classes=5, num_frames=2, image_size=32, glance_size=32,
        patch_size=16, action_dim=4, hidden_dim=16, policy_hidden=16,
        dtype=jnp.float32,
    )
    base.update(kw)
    return GFVConfig(**base)


def _data(cfg, b=2, seed=7):
    tf = cfg.t_focuser
    frames = jax.random.normal(
        jax.random.key(seed), (b * tf, cfg.image_size, cfg.image_size, 3),
        jnp.float32)
    flat = pad_for_extraction(frames)
    return (
        flat.reshape(b, tf, *flat.shape[1:]),
        jax.random.normal(
            jax.random.key(seed + 1),
            (b, cfg.num_frames, cfg.glance_size, cfg.glance_size, 3),
            jnp.float32),
    )


def test_export_roundtrip_actnet(tmp_path):
    cfg = _tiny_cfg()
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    flat, small = _data(cfg)

    exp = export_inference(model, variables, batch_size=2, seed=3)
    path = str(tmp_path / "actnet.stablehlo")
    save_exported(exp, path)
    fn = load_exported(path)
    got = fn(flat, small)
    ref = inference(model, variables, flat, small, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_export_roundtrip_sthsth(tmp_path):
    from adafocus_tpu.models.gfv_sthsth import inference_sthsth

    cfg = _tiny_cfg(classifier="consensus", tsm=True, video_div=2,
                    num_frames_focuser=4)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    flat, small = _data(cfg)

    exp = export_inference(model, variables, batch_size=2, seed=3)
    path = str(tmp_path / "sthsth.stablehlo")
    save_exported(exp, path)
    got = load_exported(path)(flat, small)
    ref = inference_sthsth(model, variables, flat, small, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_export_int8(tmp_path):
    from adafocus_tpu.models.quant_inference import (
        calibrate_gfv, inference_q8,
    )

    cfg = _tiny_cfg()
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    flat, small = _data(cfg)
    patches = jax.random.normal(
        jax.random.key(11), (2 * cfg.t_focuser, 16, 16, 3), jnp.float32)
    scales = calibrate_gfv(model, variables,
                           [{"frames_small": small, "patches": patches}])

    exp = export_inference(model, variables, batch_size=2, mode="int8",
                           scales=scales, seed=3)
    path = str(tmp_path / "actnet_q8.stablehlo")
    save_exported(exp, path)
    got = load_exported(path)(flat, small)
    ref = inference_q8(model, variables, scales, flat, small,
                       jax.random.key(3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_export_multi_platform(tmp_path):
    """Lowering for ('cpu', 'tpu') from a CPU host produces one artifact
    executable on either backend (runs here on cpu)."""
    cfg = _tiny_cfg()
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    flat, small = _data(cfg)
    exp = export_inference(model, variables, batch_size=2,
                           platforms=("cpu", "tpu"), seed=3)
    path = str(tmp_path / "multi.stablehlo")
    save_exported(exp, path)
    got = load_exported(path)(flat, small)
    ref = inference(model, variables, flat, small, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_export_int8_requires_scales():
    cfg = _tiny_cfg()
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    with pytest.raises(ValueError, match="scales"):
        export_inference(model, variables, batch_size=2, mode="int8")
