"""Fused Pallas block kernels == flax inference path.

The fused deployment engine (models/fused_inference.py, ops/fused_blocks.py)
re-executes the backbones from the same variables pytree; these tests pin
exact agreement (f32) and deployment-tolerance agreement (bf16) against the
flax modules, per block and for whole backbones, TSM on and off.
Kernels run in interpreter mode here (CPU test mesh); the real-TPU compile
is exercised by the benchmark sweep and the driver entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adafocus_tpu.models.fused_inference import (
    _merge_bn,
    mobilenet_features_fused,
    resnet_features_fused,
)
from adafocus_tpu.models.mobilenet import InvertedResidual, MobileNetV2
from adafocus_tpu.models.resnet import Bottleneck, resnet50
from adafocus_tpu.ops.fused_blocks import (
    fold_bottleneck,
    fold_inv_residual,
    fused_bottleneck,
    fused_inverted_residual,
)


def _vars_merged(vs):
    return _merge_bn(
        jax.tree.map(np.asarray, vs["params"]),
        jax.tree.map(np.asarray, vs.get("batch_stats", {})),
    )


@pytest.mark.parametrize(
    "cin,cout,stride,expand",
    [
        (8, 8, 1, 6),    # residual
        (8, 12, 1, 6),   # channel change, no residual
        (8, 12, 2, 6),   # stride 2
        (8, 8, 1, 1),    # expand_ratio 1 (block0)
    ],
)
def test_fused_inverted_residual_matches_flax(cin, cout, stride, expand):
    m = InvertedResidual(features=cout, strides=stride, expand_ratio=expand)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, cin), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    with jax.default_matmul_precision("highest"):
        ref = m.apply(vs, x)
    folded = fold_inv_residual(_vars_merged(vs))
    use_res = stride == 1 and cin == cout
    out = fused_inverted_residual(
        x, folded, stride=stride, use_res=use_res, interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "stride,downsample,size",
    [(1, True, 8), (1, False, 8), (2, True, 8),
     (2, True, 9)],  # odd size under stride 2 (sth-sth 144^2 recipe maps)
)
def test_fused_bottleneck_matches_flax(stride, downsample, size):
    m = Bottleneck(features=16, strides=stride, downsample=downsample)
    x = jax.random.normal(jax.random.key(2), (2, size, size, 64), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    with jax.default_matmul_precision("highest"):
        ref = m.apply(vs, x)
    folded = fold_bottleneck(_vars_merged(vs))
    out = fused_bottleneck(x, folded, stride=stride, interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_fused_bottleneck_tsm_split_residual():
    """use_res=False returns the pre-residual branch so the TSM caller can
    add the unshifted residual outside (models/resnet.py:62-74)."""
    m = Bottleneck(features=16, strides=1, downsample=False)
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, 64), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    with jax.default_matmul_precision("highest"):
        ref = m.apply(vs, x)
    folded = fold_bottleneck(_vars_merged(vs))
    branch = fused_bottleneck(
        x, folded, stride=1, use_res=False, interpret=True)
    out = jax.nn.relu(branch + x)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n_frames", [0, 2])
def test_fused_mobilenet_backbone(n_frames):
    m = MobileNetV2(num_classes=10, n_frames=n_frames)
    x = jax.random.normal(jax.random.key(4), (4, 32, 32, 3), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    with jax.default_matmul_precision("highest"):
        ref_map, ref_pool = m.apply(vs, x, method=MobileNetV2.features)
    fmap, pooled = mobilenet_features_fused(
        vs, x, n_frames=n_frames, interpret=True)
    np.testing.assert_allclose(fmap, ref_map, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(pooled, ref_pool, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("n_frames", [0, 2])
def test_fused_resnet50_backbone(n_frames):
    m = resnet50(num_classes=10, n_frames=n_frames)
    x = jax.random.normal(jax.random.key(5), (4, 32, 32, 3), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    with jax.default_matmul_precision("highest"):
        ref_map, ref_pool = m.apply(vs, x, method=m.features)
    fmap, pooled = resnet_features_fused(
        vs, x, n_frames=n_frames, interpret=True)
    np.testing.assert_allclose(fmap, ref_map, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(pooled, ref_pool, atol=5e-4, rtol=1e-4)


@pytest.fixture
def interpret_kernels(monkeypatch):
    """Run fused kernels in interpreter mode (CPU test mesh)."""
    from adafocus_tpu.ops import fused_blocks

    monkeypatch.setattr(fused_blocks, "INTERPRET_DEFAULT", True)


def test_inference_fused_dispatch_actnet(interpret_kernels):
    """gfv.inference(fused='on') == inference(fused='off') — the deployment
    dispatch the driver entry and the benchmark sweep use on TPU."""
    from adafocus_tpu.models.gfv import GFV, GFVConfig, inference
    from adafocus_tpu.train.stages import create_train_state
    from adafocus_tpu.ops.patch import pad_for_extraction

    cfg = GFVConfig(num_classes=5, num_frames=2, image_size=32,
                    glance_size=32, patch_size=16, action_dim=4,
                    hidden_dim=16, policy_hidden=16, dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = jax.random.normal(
        jax.random.key(7), (2 * cfg.num_frames, 32, 32, 3), jnp.float32)
    flat = pad_for_extraction(frames)
    flat = flat.reshape(2, cfg.num_frames, *flat.shape[1:])
    small = jax.random.normal(
        jax.random.key(8), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    rng = jax.random.key(9)
    with jax.default_matmul_precision("highest"):
        ref = inference(model, variables, flat, small, rng, fused="off")
    out = inference(model, variables, flat, small, rng, fused="on")
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_inference_fused_dispatch_sthsth(interpret_kernels):
    from adafocus_tpu.models.gfv import GFV, GFVConfig
    from adafocus_tpu.models.gfv_sthsth import inference_sthsth
    from adafocus_tpu.train.stages import create_train_state
    from adafocus_tpu.ops.patch import pad_for_extraction

    cfg = GFVConfig(num_classes=5, num_frames=2, num_frames_focuser=4,
                    image_size=32, glance_size=32, patch_size=16,
                    action_dim=4, hidden_dim=16, policy_hidden=16,
                    classifier="consensus", tsm=True, video_div=2,
                    dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = jax.random.normal(
        jax.random.key(7), (2 * cfg.t_focuser, 32, 32, 3), jnp.float32)
    flat = pad_for_extraction(frames)
    flat = flat.reshape(2, cfg.t_focuser, *flat.shape[1:])
    small = jax.random.normal(
        jax.random.key(8), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    rng = jax.random.key(9)
    with jax.default_matmul_precision("highest"):
        ref = inference_sthsth(model, variables, flat, small, rng,
                               fused="off")
    out = inference_sthsth(model, variables, flat, small, rng, fused="on")
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_fused_mobilenet_bf16_close_to_f32_flax():
    """Deployment dtype: fused bf16 path stays within bf16 noise of the
    f32 flax forward (same tolerance class as the flax bf16 path itself)."""
    m = MobileNetV2(num_classes=10)
    x32 = jax.random.normal(jax.random.key(6), (2, 32, 32, 3), jnp.float32)
    vs = m.init(jax.random.key(0), x32)
    with jax.default_matmul_precision("highest"):
        _, ref_pool = m.apply(vs, x32, method=MobileNetV2.features)
    _, pooled = mobilenet_features_fused(
        vs, x32.astype(jnp.bfloat16), interpret=True)
    flax_bf16 = MobileNetV2(num_classes=10, dtype=jnp.bfloat16)
    _, pool_flax16 = flax_bf16.apply(
        vs, x32.astype(jnp.bfloat16), method=MobileNetV2.features)
    err_fused = float(jnp.max(jnp.abs(pooled.astype(jnp.float32) - ref_pool)))
    err_flax = float(
        jnp.max(jnp.abs(pool_flax16.astype(jnp.float32) - ref_pool)))
    assert err_fused < max(4 * err_flax, 0.05), (err_fused, err_flax)
