"""MobileNetV2 glancer backbone (NHWC, functional flax).

Capability parity with the reference's torchvision copy
(actnet/models/mobilenet.py:71-169 in /root/reference): same inverted-residual
config, ``get_featmap``-style dual output (pre-pool feature map AND pooled
vector), feature_dim=1280, plus a classification head used for stage-0
glancer pretraining. When ``n_frames > 0``, every residual-connected block
temporally shifts channels before its convs — the TSM glancer variant
(sthsth/models/gfv_net.py:237-241).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from adafocus_tpu.models.layers import ConvBNAct, global_avg_pool, make_divisible
from adafocus_tpu.models.tsm import temporal_shift

# (expand_ratio t, channels c, num_blocks n, stride s)
_INVERTED_RESIDUAL_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand_ratio: int
    dtype: Any = None
    axis_name: Optional[str] = None
    n_frames: int = 0  # >0: apply TSM shift on the residual branch input
    shift_div: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_features = x.shape[-1]
        hidden = int(round(in_features * self.expand_ratio))
        use_res = self.strides == 1 and in_features == self.features

        h = x
        if use_res and self.n_frames > 0:
            h = temporal_shift(h, self.n_frames, self.shift_div)
        if self.expand_ratio != 1:
            h = ConvBNAct(hidden, kernel_size=1, dtype=self.dtype,
                          axis_name=self.axis_name, name="expand")(h, train)
        h = ConvBNAct(hidden, kernel_size=3, strides=self.strides, groups=hidden,
                      dtype=self.dtype, axis_name=self.axis_name, name="dw")(h, train)
        h = ConvBNAct(self.features, kernel_size=1, act=None, dtype=self.dtype,
                      axis_name=self.axis_name, name="project")(h, train)
        if use_res:
            h = x + h
        return h


class MobileNetV2(nn.Module):
    """MobileNetV2; ``__call__`` returns logits, ``features`` returns
    (pre-pool map, pooled vec) — get_featmap parity
    (actnet/models/mobilenet.py:146-152).
    """

    num_classes: int = 1000
    width_mult: float = 1.0
    dtype: Any = None
    axis_name: Optional[str] = None
    dropout_rate: float = 0.2
    n_frames: int = 0
    shift_div: int = 8
    remat: bool = False

    @property
    def feature_dim(self) -> int:
        return make_divisible(1280 * max(1.0, self.width_mult))

    def setup(self):
        input_channel = make_divisible(32 * self.width_mult)
        self.stem = ConvBNAct(input_channel, kernel_size=3, strides=2,
                              dtype=self.dtype, axis_name=self.axis_name)
        # see resnet.py: checkpoint-compatible per-block remat
        block_ctor = (
            nn.remat(InvertedResidual, static_argnums=(2,))
            if self.remat else InvertedResidual
        )
        blocks = []
        for i, (t, c, n, s) in enumerate(_INVERTED_RESIDUAL_CFG):
            out_c = make_divisible(c * self.width_mult)
            for j in range(n):
                blocks.append(
                    block_ctor(
                        out_c,
                        strides=s if j == 0 else 1,
                        expand_ratio=t,
                        dtype=self.dtype,
                        axis_name=self.axis_name,
                        n_frames=self.n_frames,
                        shift_div=self.shift_div,
                        name=f"block_{i}_{j}",
                    )
                )
        self.blocks = blocks
        self.head_conv = ConvBNAct(self.feature_dim, kernel_size=1,
                                   dtype=self.dtype, axis_name=self.axis_name)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype)

    def backbone(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.stem(x, train)
        for block in self.blocks:
            x = block(x, train)
        return self.head_conv(x, train)

    def features(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        fmap = self.backbone(x, train)
        return fmap, global_avg_pool(fmap)

    def classify(self, pooled: jax.Array, train: bool = False) -> jax.Array:
        pooled = self.dropout(pooled, deterministic=not train)
        return self.classifier(pooled)

    def features_and_logits(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        """TSM-glancer surface: (feature map, LOGITS)
        (reference sthsth/models/mobilenetv2.py:116-121)."""
        fmap, pooled = self.features(x, train)
        return fmap, self.classify(pooled, train)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        _, pooled = self.features(x, train)
        return self.classify(pooled, train)
