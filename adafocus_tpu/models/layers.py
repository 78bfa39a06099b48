"""Shared conv/norm building blocks (NHWC, TPU-native layout).

The reference backbones are NCHW torchvision copies; on TPU, XLA prefers
NHWC with channels on the 128-lane minor dimension, so everything here is
channels-last. BatchNorm follows torch semantics (eps=1e-5, running-stat
momentum 0.1) and supports cross-replica stats via ``axis_name`` — replacing
the implicit .eval()-mode freezing games the reference plays
(sthsth/models/tsn.py:146-162 in /root/reference) with an explicit flag.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBNAct(nn.Module):
    """Conv2d (no bias) + BatchNorm + optional activation, torch-parity math."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: Optional[Callable[[jax.Array], jax.Array]] = nn.relu6
    dtype: Any = None
    axis_name: Optional[str] = None
    bn_momentum: float = 0.9  # flax momentum = 1 - torch momentum (0.1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def global_avg_pool(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding used by MobileNetV2 (reference actnet/models/mobilenet.py:14-29)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v
