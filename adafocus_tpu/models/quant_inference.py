"""int8 PTQ deployment forward of the backbones.

Mirrors the flax backbones (models/mobilenet.py, models/resnet.py) from the
same variables pytree with every conv-bn unit executed as an int8 MXU conv
(ops/quant.py): BN folded, weights per-channel int8, activations per-tensor
int8 with calibrated scales. The requantize epilogue fuses into each conv's
output, so inter-conv activations move through HBM at half the bf16 width —
a direct lever on the bandwidth-bound early stages (PERF.md) on top of the
~1.45x int8 MXU conv throughput measured on v5e.

Calibration and execution share one traversal (``_run_backbone``): with
``scales=None`` it runs the bf16 reference math and records each unit
input's abs-max; with a scales dict it runs quantized. ``calibrate_*``
reduce abs-maxes over batches on the host.

Stems stay bf16 (3-channel inputs, XLA space-to-depth), as do pooling,
residual carries, the policy, and the classifier.

The reference has no quantized path (fp32/AMP only); this is TPU-added
serving capability. Quality is pinned by tests/test_quant.py: unit-level
quant math, backbone q8-vs-f32 feature agreement, and the full deployment
forward through ``inference`` dispatch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from adafocus_tpu.models.fused_inference import _merge_bn, _subtree
from adafocus_tpu.models.layers import make_divisible
from adafocus_tpu.models.mobilenet import _INVERTED_RESIDUAL_CFG
from adafocus_tpu.models.tsm import temporal_shift
from adafocus_tpu.ops.fused_blocks import _relu6, fold_bn
from adafocus_tpu.ops.quant import (
    QConv,
    act_scale_from_absmax,
    int8_conv,
    quantize_act,
    quantize_weight,
)


class _UnitRunner:
    """Executes conv-bn units either in bf16 (recording input abs-maxes,
    calibration mode) or quantized int8 (execution mode)."""

    def __init__(self, scales: Optional[Dict[str, jax.Array]], dtype):
        self.scales = scales
        self.dtype = dtype
        self.absmax: Dict[str, jax.Array] = {}

    def __call__(self, name, x, unit, strides=1, groups=1, act=None):
        # units without a calibrated scale (the stems) run bf16
        if self.scales is None or name not in self.scales:
            if self.scales is None:
                self.absmax[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            kernel, bias = fold_bn(unit["conv"]["kernel"], unit["bn"],
                                   self.dtype)
            kh = kernel.shape[0]
            pad = (kh - 1) // 2
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel, (strides, strides),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            ).astype(jnp.float32) + bias
        else:
            kernel, bias = fold_bn(unit["conv"]["kernel"], unit["bn"])
            kq, ws = quantize_weight(kernel)
            s_x = self.scales[name]
            q = quantize_act(x, s_x)
            y = int8_conv(q, QConv(kq, ws, bias, s_x), strides, groups)
        if act is not None:
            y = act(y)
        return y.astype(self.dtype)


def _mbv2_backbone(params, x, runner, n_frames=0, shift_div=8,
                   width_mult=1.0):
    h = runner("stem", x, params["stem"], strides=2, act=_relu6)
    in_c = make_divisible(32 * width_mult)
    for i, (t, c, n, s) in enumerate(_INVERTED_RESIDUAL_CFG):
        out_c = make_divisible(c * width_mult)
        for j in range(n):
            stride = s if j == 0 else 1
            use_res = stride == 1 and in_c == out_c
            name = f"block_{i}_{j}"
            block = params[name]
            b = h
            if use_res and n_frames > 0:
                b = temporal_shift(b, n_frames, shift_div)
            if "expand" in block:
                b = runner(f"{name}/expand", b, block["expand"], act=_relu6)
            b = runner(f"{name}/dw", b, block["dw"], strides=stride,
                       groups=b.shape[-1], act=_relu6)
            b = runner(f"{name}/project", b, block["project"])
            h = h + b if use_res else b
            in_c = out_c
    fmap = runner("head_conv", h, params["head_conv"], act=_relu6)
    return fmap, jnp.mean(fmap, axis=(1, 2))


def _resnet_backbone(params, x, runner, stage_sizes=(3, 4, 6, 3),
                     n_frames=0, shift_div=8):
    h = runner("stem", x, params["stem"], strides=2, act=jax.nn.relu)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ).astype(runner.dtype)
    for stage, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            stride = 2 if (stage > 0 and j == 0) else 1
            name = f"layer{stage + 1}_{j}"
            block = params[name]
            b = h
            if n_frames > 0:
                b = temporal_shift(b, n_frames, shift_div)
            b = runner(f"{name}/conv1", b, block["conv1"], act=jax.nn.relu)
            b = runner(f"{name}/conv2", b, block["conv2"], strides=stride,
                       act=jax.nn.relu)
            b = runner(f"{name}/conv3", b, block["conv3"])
            if "down" in block:
                res = runner(f"{name}/down", h, block["down"],
                             strides=stride)
            else:
                res = h
            h = jax.nn.relu(b.astype(jnp.float32)
                            + res.astype(jnp.float32)).astype(runner.dtype)
    return h, jnp.mean(h, axis=(1, 2))


def _run_backbone(kind, variables, x, scales, n_frames=0, dtype=None):
    params = _merge_bn(variables["params"], variables.get("batch_stats", {}))
    runner = _UnitRunner(scales, dtype or x.dtype)
    fn = _mbv2_backbone if kind == "mbv2" else _resnet_backbone
    fmap, pooled = fn(params, x, runner, n_frames=n_frames)
    if scales is None:
        return fmap, pooled, runner.absmax
    return fmap, pooled


def mobilenet_features_q8(variables, x, scales, n_frames=0):
    """MobileNetV2.features, int8 units (stem bf16). scales: per-unit
    activation scales from ``calibrate_backbone``."""
    return _run_backbone("mbv2", variables, x, scales, n_frames)


def resnet_features_q8(variables, x, scales, n_frames=0):
    """ResNet50.features, int8 units (stem bf16)."""
    return _run_backbone("resnet", variables, x, scales, n_frames)


def calibrate_backbone(kind, variables, batches, n_frames=0,
                       dtype=jnp.bfloat16):
    """Run the bf16 forward over calibration batches; return per-unit
    activation scales {unit_name: f32 scale} (abs-max calibration).

    kind: 'mbv2' | 'resnet'. batches: iterable of (N, H, W, 3) arrays.
    """
    collect = jax.jit(
        lambda v, xb: _run_backbone(kind, v, xb, None, n_frames, dtype)[2]
    )
    running: Dict[str, jax.Array] = {}
    for xb in batches:
        absmax = jax.device_get(collect(variables, xb.astype(dtype)))
        for k, v in absmax.items():
            running[k] = max(running.get(k, 0.0), float(v))
    # the stem runs bf16; its entry is collected but unused
    return {k: jnp.float32(act_scale_from_absmax(jnp.float32(v)))
            for k, v in running.items() if k != "stem"}


# ---------------------------------------------------------------------------
# Full GFV deployment forward (both backbones int8).
# ---------------------------------------------------------------------------


def calibrate_gfv(model, variables, batches) -> Dict[str, Dict[str, jax.Array]]:
    """Calibrate both backbones from deployment-shaped batches.

    batches: iterable of dicts with 'frames_small' (B, T, g, g, 3) and
    'patches' (N, P, P, 3) — run a few eval batches through
    ``glance_policy_actions`` + ``extract_for_frames`` to produce patches
    (see tests/test_quant.py for the recipe). Returns
    {'glancer': scales, 'focuser': scales}.
    """
    cfg = model.cfg
    g_batches, f_batches = [], []
    for b in batches:
        fs = b["frames_small"]
        g_batches.append(fs.reshape((-1,) + fs.shape[2:]))
        f_batches.append(b["patches"])
    return {
        "glancer": calibrate_backbone(
            "mbv2", _subtree(variables, "glancer"), g_batches,
            n_frames=cfg.num_frames if cfg.tsm else 0, dtype=cfg.dtype),
        "focuser": calibrate_backbone(
            "resnet", _subtree(variables, "focuser"), f_batches,
            n_frames=cfg.t_focuser if cfg.tsm else 0, dtype=cfg.dtype),
    }


def q8_glance(model, variables, scales, frames_small):
    cfg = model.cfg
    b, t = frames_small.shape[:2]
    flat = frames_small.reshape((b * t,) + frames_small.shape[2:])
    fmap, pooled = _run_backbone(
        "mbv2", _subtree(variables, "glancer"), flat.astype(cfg.dtype),
        scales["glancer"], n_frames=cfg.num_frames if cfg.tsm else 0)
    return fmap.reshape((b, t) + fmap.shape[1:]), pooled.reshape(b, t, -1)


def q8_focus(model, variables, scales, patches):
    cfg = model.cfg
    _, pooled = _run_backbone(
        "resnet", _subtree(variables, "focuser"), patches.astype(cfg.dtype),
        scales["focuser"], n_frames=cfg.t_focuser if cfg.tsm else 0)
    return pooled


def inference_q8(model, variables, scales, frames_flat, frames_small, rng,
                 impl: str = "auto"):
    """int8 deployment forward (actnet GRU family): quantized glance +
    focus backbones, bf16 policy/classifier. Mirrors models/gfv.py
    ``inference``."""
    from adafocus_tpu.models.gfv import (
        GFV, extract_for_frames, fuse_and_classify,
    )

    cfg = model.cfg
    b, t = frames_small.shape[:2]
    fmap, pooled = q8_glance(model, variables, scales, frames_small)
    roll = model.apply(
        variables, fmap.astype(cfg.dtype), rng, "greedy", False,
        method=GFV.policy_rollout)
    patches = extract_for_frames(
        frames_flat, roll["actions"], cfg.image_size, cfg.patch_size,
        impl=impl)
    local = q8_focus(model, variables, scales, patches).reshape(b, t, -1)
    return fuse_and_classify(
        model, variables, pooled.astype(cfg.dtype),
        local.astype(cfg.dtype), train=False)


def inference_q8_plus(model, variables, scales, frames_flat, frames_small,
                      rng, impl: str = "auto"):
    """int8 deployment forward (AdaFocus+ temporal selection): quantized
    glance + focus backbones; selector (ST top-K or plus_rl greedy
    sequential), spatial policy, and classifier stay bf16. Mirrors
    models/gfv_plus.py ``inference_plus``."""
    from adafocus_tpu.models.gfv import (
        GFV, extract_for_frames, fuse_and_classify,
    )
    from adafocus_tpu.models.gfv_plus import (
        gather_frames, scatter_frames, select_topk,
    )

    cfg = model.cfg
    b, t = frames_small.shape[:2]
    k = cfg.frame_budget
    fmap, pooled = q8_glance(model, variables, scales, frames_small)
    fmap = fmap.astype(cfg.dtype)
    pooled = pooled.astype(cfg.dtype)
    if cfg.plus_rl:
        sel_roll = model.apply(
            variables, pooled, rng, "top", method=GFV.select_rollout)
        idx = sel_roll["idx"]
    else:
        scores = model.apply(variables, pooled, method=GFV.frame_scores)
        idx, _ = select_topk(scores, k, rng, mode="top")
    fmap_sel = gather_frames(fmap, idx)
    roll = model.apply(
        variables, fmap_sel, rng, "greedy", False, method=GFV.policy_rollout)
    patches = extract_for_frames(
        gather_frames(frames_flat, idx), roll["actions"], cfg.image_size,
        cfg.patch_size, impl=impl)
    local_sel = q8_focus(model, variables, scales, patches).reshape(b, k, -1)
    local_full = scatter_frames(local_sel.astype(cfg.dtype), idx, t)
    return fuse_and_classify(model, variables, pooled, local_full,
                             train=False)


def inference_q8_sthsth(model, variables, scales, frames_flat, frames_small,
                        rng, impl: str = "auto"):
    """int8 deployment forward (sth-sth consensus family): quantized TSM
    glance + focus backbones, bf16 policy/classifier heads. Mirrors
    models/gfv_sthsth.py ``inference_sthsth``."""
    from adafocus_tpu.models.gfv import GFV, extract_for_frames
    from adafocus_tpu.models.gfv_sthsth import (
        actions_per_frame, sum_consensus,
    )

    cfg = model.cfg
    b, tf = frames_flat.shape[:2]
    tg = frames_small.shape[1]
    fmap, pooled = q8_glance(model, variables, scales, frames_small)
    global_logits = model.apply(
        variables, pooled.reshape(b * tg, -1), False,
        method=lambda m, p, train: m.glancer.classify(p, train),
    ).reshape(b, tg, -1)
    roll = model.apply(
        variables, fmap.astype(cfg.dtype), rng, "greedy", False,
        method=GFV.policy_rollout_div)
    actions = actions_per_frame(roll["actions"], tf)
    patches = extract_for_frames(
        frames_flat, actions, cfg.image_size, cfg.patch_size, impl=impl)
    feats = q8_focus(model, variables, scales, patches).reshape(b, tf, -1)
    local_logits = model.apply(
        variables, feats.astype(cfg.dtype), False,
        method=GFV.classify_frame_logits)
    return sum_consensus(global_logits, local_logits, cfg.with_glancer)
