"""ResNet focuser backbone (NHWC, functional flax).

Capability parity with the reference's torchvision copy
(actnet/models/resnet.py:117-377 in /root/reference): BasicBlock/Bottleneck,
constructors resnet18..resnet101, ``get_featmap``/``get_featvec``-style dual
output, feature_dim = 2048 for resnet50. When ``n_frames > 0`` the TSM shift
is inserted at each residual block's branch input — the 'blockres' placement
of make_temporal_shift (sthsth/ops/temporal_shift.py:99-142).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adafocus_tpu.models.layers import ConvBNAct, global_avg_pool
from adafocus_tpu.models.tsm import temporal_shift


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = None
    axis_name: Optional[str] = None
    n_frames: int = 0
    shift_div: int = 8

    expansion: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        if self.n_frames > 0:
            h = temporal_shift(h, self.n_frames, self.shift_div)
        h = ConvBNAct(self.features, 3, self.strides, act=nn.relu,
                      dtype=self.dtype, axis_name=self.axis_name, name="conv1")(h, train)
        h = ConvBNAct(self.features, 3, 1, act=None,
                      dtype=self.dtype, axis_name=self.axis_name, name="conv2")(h, train)
        if self.downsample:
            x = ConvBNAct(self.features * self.expansion, 1, self.strides, act=None,
                          dtype=self.dtype, axis_name=self.axis_name, name="down")(x, train)
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = None
    axis_name: Optional[str] = None
    n_frames: int = 0
    shift_div: int = 8
    # wide-ResNet variants (torchvision width_per_group=128, reference
    # actnet/models/resnet.py wide_resnet101_2): the inner 1x1/3x3 convs
    # widen by this factor while the block output stays features*expansion
    inner_mult: int = 1

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        if self.n_frames > 0:
            h = temporal_shift(h, self.n_frames, self.shift_div)
        h = ConvBNAct(self.features * self.inner_mult, 1, 1, act=nn.relu,
                      dtype=self.dtype, axis_name=self.axis_name, name="conv1")(h, train)
        h = ConvBNAct(self.features * self.inner_mult, 3, self.strides, act=nn.relu,
                      dtype=self.dtype, axis_name=self.axis_name, name="conv2")(h, train)
        h = ConvBNAct(self.features * self.expansion, 1, 1, act=None,
                      dtype=self.dtype, axis_name=self.axis_name, name="conv3")(h, train)
        if self.downsample:
            x = ConvBNAct(self.features * self.expansion, 1, self.strides, act=None,
                          dtype=self.dtype, axis_name=self.axis_name, name="down")(x, train)
        return nn.relu(x + h)


class ResNet(nn.Module):
    """``partial_bn``: TSM-style partial-BN freezing for finetuning — only
    the stem's BatchNorm collects batch statistics in training; every
    block BN runs on its running stats (reference sthsth/models/tsn.py
    train()/partialBN, :146-162, made an explicit flag instead of a
    .eval() side effect)."""

    block_cls: type = Bottleneck
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    inner_mult: int = 1   # wide variants (Bottleneck only)
    num_classes: int = 1000
    dtype: Any = None
    axis_name: Optional[str] = None
    n_frames: int = 0
    shift_div: int = 8
    partial_bn: bool = False
    remat: bool = False

    @property
    def feature_dim(self) -> int:
        return 512 * self.block_cls.expansion

    def setup(self):
        self.stem = ConvBNAct(64, kernel_size=7, strides=2, act=nn.relu,
                              dtype=self.dtype, axis_name=self.axis_name)
        # per-block rematerialization (jax.checkpoint via the flax lift):
        # param/stats structure and init values are unchanged, so rematted
        # and plain programs share checkpoints. static arg 2 = ``train``.
        block_ctor = (
            nn.remat(self.block_cls, static_argnums=(2,))
            if self.remat else self.block_cls
        )
        blocks = []
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for j in range(n_blocks):
                strides = 2 if (stage > 0 and j == 0) else 1
                in_features = 64 if (stage == 0 and j == 0) else (
                    features * self.block_cls.expansion if j > 0
                    else 64 * (2 ** (stage - 1)) * self.block_cls.expansion
                )
                downsample = j == 0 and (
                    strides != 1 or in_features != features * self.block_cls.expansion
                )
                wide = ({"inner_mult": self.inner_mult}
                        if self.block_cls is Bottleneck else {})
                blocks.append(
                    block_ctor(
                        features,
                        strides=strides,
                        downsample=downsample,
                        dtype=self.dtype,
                        axis_name=self.axis_name,
                        n_frames=self.n_frames,
                        shift_div=self.shift_div,
                        name=f"layer{stage + 1}_{j}",
                        **wide,
                    )
                )
        self.blocks = blocks
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)

    def backbone(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.stem(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        block_train = train and not self.partial_bn
        for block in self.blocks:
            x = block(x, block_train)
        return x

    def features(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """get_featmap parity (actnet/models/resnet.py:211-240):
        (pre-pool map (B,h,w,C), pooled (B,C))."""
        fmap = self.backbone(x, train)
        return fmap, global_avg_pool(fmap)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        _, pooled = self.features(x, train)
        return self.fc(pooled)


def resnet18(**kw) -> ResNet:
    return ResNet(block_cls=BasicBlock, stage_sizes=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block_cls=BasicBlock, stage_sizes=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block_cls=Bottleneck, stage_sizes=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(block_cls=Bottleneck, stage_sizes=(3, 4, 23, 3), **kw)


def resnet152(**kw) -> ResNet:
    """reference actnet/models/resnet.py:311-320 (constructor parity;
    no reference recipe uses it)."""
    return ResNet(block_cls=Bottleneck, stage_sizes=(3, 8, 36, 3), **kw)


def wide_resnet101(**kw) -> ResNet:
    """torchvision wide_resnet101_2 (width_per_group=128): inner
    bottleneck convs 2x wide, block outputs unchanged — reference
    actnet/models/resnet.py:323-339 (constructor parity; no reference
    recipe uses it)."""
    return ResNet(block_cls=Bottleneck, stage_sizes=(3, 4, 23, 3),
                  inner_mult=2, **kw)
