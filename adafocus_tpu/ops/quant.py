"""Post-training int8 quantization (PTQ) primitives for the deployment
forward.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8 — scale = max|w| / 127 over
    each output channel, after BatchNorm folding (ops/fused_blocks.fold_bn);
  * activations: symmetric int8 with abs-max scales calibrated over
    calibration batches (models/quant_inference.py) — per-tensor for the
    backbone conv units (homogeneous post-ReLU ranges), per-INPUT-channel
    for the head matmuls (GAP/concat features have outlier channels; the
    scale vector folds exactly into the f32 kernel before weight
    quantization, see models/quant_inference._HeadRunner);
  * convs run int8 x int8 -> int32 on the MXU (measured ~1.45x the bf16
    conv throughput on v5e; int8 also halves HBM activation traffic, which
    the early backbone stages are bound by — PERF.md);
  * accumulators rescale to f32 via (act_scale * weight_scale), add the
    folded BN bias, apply the activation, and requantize for the next unit.

The reference has no quantized deployment path (100% fp32/AMP PyTorch,
SURVEY.md section 2.3); this subsystem is TPU-added capability for the
serving story. Training is untouched.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class QConv(NamedTuple):
    """A quantized conv-bn unit: int8 kernel + per-channel rescale."""

    kernel_q: jax.Array   # int8, HWIO (or (Cin, Cout) for folded 1x1)
    w_scale: jax.Array    # (Cout,) f32 — per-output-channel weight scale
    bias: jax.Array       # (Cout,) f32 — folded BN bias
    x_scale: jax.Array    # () f32 — calibrated input activation scale


def quantize_weight(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8. kernel: (..., Cout) f32.
    Returns (int8 kernel, (Cout,) f32 scales)."""
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 with the calibrated scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def act_scale_from_absmax(absmax: jax.Array) -> jax.Array:
    return jnp.maximum(absmax.astype(jnp.float32), 1e-12) / 127.0


def int8_conv(
    x_q: jax.Array,
    unit: QConv,
    strides: int = 1,
    groups: int = 1,
) -> jax.Array:
    """int8 conv -> f32 (rescaled, bias added; NO activation).

    x_q: (N, H, W, Cin) int8 quantized with unit.x_scale.
    unit.kernel_q: (kh, kw, Cin/groups, Cout) int8.
    """
    kh = unit.kernel_q.shape[0]
    pad = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x_q, unit.kernel_q, (strides, strides), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    rescale = unit.x_scale * unit.w_scale  # (Cout,)
    return y.astype(jnp.float32) * rescale + unit.bias


def int8_dense(x_q: jax.Array, unit: QConv) -> jax.Array:
    """int8 (N, Cin) @ (Cin, Cout) -> f32 (rescaled + bias)."""
    y = jnp.dot(x_q, unit.kernel_q, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (unit.x_scale * unit.w_scale) + unit.bias


def dequantize(x_q: jax.Array, scale: jax.Array) -> jax.Array:
    return x_q.astype(jnp.float32) * scale


def _frame_absmax() -> float:
    """Static bound on ImageNet-normalized pixels: max_c of
    max(mean_c, 1 - mean_c) / std_c — no calibration needed."""
    from adafocus_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    return max(
        max(m, 1.0 - m) / s for m, s in zip(IMAGENET_MEAN, IMAGENET_STD))


# int8 transport scale for normalized video frames/patches (the serving
# input format: frames quantized once where they are produced — at the
# on-device augmentation or by the caller — then moved/patch-extracted at
# half the bf16 HBM width, dequantized inside the backbone stems).
FRAME_SCALE = _frame_absmax() / 127.0


def quantize_frames(frames: jax.Array) -> jax.Array:
    """Normalized float frames -> int8 transport format (FRAME_SCALE)."""
    return quantize_act(frames, jnp.float32(FRAME_SCALE))
