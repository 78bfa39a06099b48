"""Fused deployment forward of the backbones (Pallas block kernels).

The flax modules (models/mobilenet.py, models/resnet.py) are the single
source of truth for parameters and for training; this module re-executes
their inference forward from the same variables pytree with each residual
block as ONE Pallas kernel (ops/fused_blocks.py), eliminating the HBM
round-trips of the expanded hidden activations.

**Routing default: OFF.** The per-block micro-benchmark
(benchmarks/bench_fused_blocks.py) measured XLA's convolutions 2-5x
faster than the fused kernels on every backbone block shape at the
flagship operating point — the VPU tap formulation costs more than the
HBM traffic it saves (see ops/fused_blocks.py for the full analysis).
The path remains available via ``fused='on'`` and is exactness-pinned by
tests/test_fused_blocks.py (f32 exact-tolerance and bf16
deployment-tolerance, every block shape of both backbones, TSM on/off).

The stem / maxpool / head convs stay on XLA: their inputs are tiny
(3-channel images) or MXU-friendly (1x1 at 7^2 with K>=320), and XLA's
space-to-depth handling of the stem is already good.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from adafocus_tpu.models.layers import make_divisible
from adafocus_tpu.models.mobilenet import _INVERTED_RESIDUAL_CFG
from adafocus_tpu.models.tsm import temporal_shift
from adafocus_tpu.ops.fused_blocks import (
    _relu6,
    fold_bottleneck,
    fold_inv_residual,
    fold_bn,
    fused_bottleneck,
    fused_inverted_residual,
)


def fused_enabled(fused: str = "auto") -> bool:
    """'on' | 'off' | 'auto' (the dispatch convention of ops/patch.py's
    impl='auto'). 'auto' currently resolves to OFF: the first-cut fused
    kernels lose to XLA on most block shapes (benchmarks/
    bench_fused_blocks.py) — flip to per-block routing once the kernels
    win; 'on' forces the fused path (tests, micro-benchmarks)."""
    if fused == "on":
        return True
    return False


def _subtree(variables: dict, name: str) -> dict:
    return {
        "params": variables["params"][name],
        "batch_stats": dict(variables.get("batch_stats", {})).get(name, {}),
    }


def fused_glance(model, variables, frames_small: jax.Array):
    """GFV.glance (models/gfv.py:155-162) on the fused path:
    (B, T, g, g, 3) -> (fmap (B, T, gh, gw, 1280), pooled (B, T, 1280))."""
    cfg = model.cfg
    b, t = frames_small.shape[:2]
    flat = frames_small.reshape((b * t,) + frames_small.shape[2:])
    fmap, pooled = mobilenet_features_fused(
        _subtree(variables, "glancer"), flat.astype(cfg.dtype),
        n_frames=cfg.num_frames if cfg.tsm else 0,
    )
    return fmap.reshape((b, t) + fmap.shape[1:]), pooled.reshape(b, t, -1)


def fused_glance_logits(model, variables, frames_small: jax.Array):
    """GFV.glance_logits (models/gfv.py:164-174) on the fused path:
    returns (fmap, per-frame glancer logits)."""
    cfg = model.cfg
    b, t = frames_small.shape[:2]
    fmap, pooled = fused_glance(model, variables, frames_small)
    logits = model.apply(
        variables, pooled.reshape(b * t, -1), False,
        method=lambda m, p, train: m.glancer.classify(p, train),
    )
    return fmap, logits.reshape(b, t, -1)


def fused_focus(model, variables, patches: jax.Array) -> jax.Array:
    """GFV.focus (models/gfv.py:237-240) on the fused path:
    (N, P, P, 3) -> (N, 2048) pooled focuser features."""
    cfg = model.cfg
    _, pooled = resnet_features_fused(
        _subtree(variables, "focuser"), patches.astype(cfg.dtype),
        n_frames=cfg.t_focuser if cfg.tsm else 0,
    )
    return pooled


def _merge_bn(params: dict, stats: dict) -> dict:
    """Overlay batch_stats ({bn: {mean, var}}) onto the params tree so each
    conv-bn unit carries {conv: {kernel}, bn: {scale, bias, mean, var}}."""
    out = {}
    for k, v in params.items():
        if not isinstance(v, dict):
            out[k] = v
        elif k == "bn":
            merged = dict(v)
            merged.update(stats.get("bn", {}))
            out[k] = merged
        else:
            out[k] = _merge_bn(v, stats.get(k, {}))
    return out


def _conv_bn(x, unit: dict, strides: int, act, dtype, groups: int = 1):
    """XLA conv + folded BN (stem / head convs)."""
    kernel, bias = fold_bn(unit["conv"]["kernel"], unit["bn"], dtype)
    kh = kernel.shape[0]
    pad = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel, (strides, strides), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    y = y.astype(jnp.float32) + bias
    if act is not None:
        y = act(y)
    return y.astype(dtype)


def mobilenet_features_fused(
    variables: dict,
    x: jax.Array,
    n_frames: int = 0,
    shift_div: int = 8,
    width_mult: float = 1.0,
    interpret=None,
) -> Tuple[jax.Array, jax.Array]:
    """MobileNetV2.features (models/mobilenet.py:108-116) on the fused path.

    variables: {params: {...glancer tree...}, batch_stats: {...}} of the
    flax MobileNetV2. x: (N, H, W, 3). Returns (feature map, pooled).
    """
    params = _merge_bn(variables["params"], variables.get("batch_stats", {}))
    dtype = x.dtype
    h = _conv_bn(x, params["stem"], 2, _relu6, dtype)

    in_c = make_divisible(32 * width_mult)
    for i, (t, c, n, s) in enumerate(_INVERTED_RESIDUAL_CFG):
        out_c = make_divisible(c * width_mult)
        for j in range(n):
            stride = s if j == 0 else 1
            use_res = stride == 1 and in_c == out_c
            block = params[f"block_{i}_{j}"]
            folded = fold_inv_residual(block, dtype)
            if use_res and n_frames > 0:
                shifted = temporal_shift(h, n_frames, shift_div)
                branch = fused_inverted_residual(
                    shifted, folded, stride=stride, use_res=False,
                    interpret=interpret)
                h = h + branch
            else:
                h = fused_inverted_residual(
                    h, folded, stride=stride, use_res=use_res,
                    interpret=interpret)
            in_c = out_c

    fmap = _conv_bn(h, params["head_conv"], 1, _relu6, dtype)
    return fmap, jnp.mean(fmap, axis=(1, 2))


def resnet_features_fused(
    variables: dict,
    x: jax.Array,
    stage_sizes=(3, 4, 6, 3),
    n_frames: int = 0,
    shift_div: int = 8,
    interpret=None,
) -> Tuple[jax.Array, jax.Array]:
    """ResNet.features (models/resnet.py:127-139, Bottleneck stages) on the
    fused path. Returns (feature map, pooled)."""
    params = _merge_bn(variables["params"], variables.get("batch_stats", {}))
    dtype = x.dtype
    h = _conv_bn(x, params["stem"], 2, jax.nn.relu, dtype)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ).astype(dtype)

    for stage, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            stride = 2 if (stage > 0 and j == 0) else 1
            block = params[f"layer{stage + 1}_{j}"]
            folded = fold_bottleneck(block, dtype)
            if n_frames > 0:
                shifted = temporal_shift(h, n_frames, shift_div)
                branch = fused_bottleneck(
                    shifted, folded, stride=stride, use_res=False,
                    interpret=interpret)
                res = h
                if folded.wd is not None:
                    down = {"conv": block["down"]["conv"],
                            "bn": block["down"]["bn"]}
                    res = _conv_bn(h, down, stride, None, dtype)
                elif stride != 1:
                    res = h[:, ::stride, ::stride, :]
                h = jax.nn.relu(branch.astype(jnp.float32)
                                + res.astype(jnp.float32)).astype(dtype)
            else:
                h = fused_bottleneck(
                    h, folded, stride=stride, use_res=True,
                    interpret=interpret)

    return h, jnp.mean(h, axis=(1, 2))
