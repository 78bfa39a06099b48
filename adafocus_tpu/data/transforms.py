"""On-device batched augmentation — the reference's PIL group transforms
re-designed for TPU.

The reference runs GroupMultiScaleCrop / GroupScale / GroupCenterCrop /
GroupRandomHorizontalFlip / Stack / Normalize per-frame in PIL inside
DataLoader worker processes (/root/reference actnet/ops/transforms.py:181-252,
303-343). Here the host pipeline only decodes JPEGs to a fixed uint8 canvas;
every augmentation is a batched, jit-compiled device op:

  * multi-scale crop = per-video (scale, offset) drawn from the reference's
    discrete grid (scales [1, .875, .75, .66], 13 fixed offsets,
    max_distort pairing — transforms.py:184-251), applied with ONE
    ``jax.image.scale_and_translate`` per video (static output shape, the
    dynamic crop geometry lives in the scale/translation operands);
  * horizontal flip = where() on a per-video bernoulli mask;
  * normalize = fused (x/255 - mean)/std in the same program;
  * ``Stack``/``ToTorchFormatTensor`` disappear: layout is NHWC end-to-end.

Applied per-video (all T frames share one crop/flip draw, matching the
group-transform semantics) via vmap over the batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    input_size: int = 224          # final H = W fed to the model
    scales: Tuple[float, ...] = (1.0, 0.875, 0.75, 0.66)
    max_distort: int = 1           # max |i - j| between the h/w scale picks
    more_fix_crop: bool = True     # 13 offsets instead of 5
    flip: bool = True              # sth-sth disables flip (label semantics)
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    # test-time crop strategy: 'center' (GroupCenterCrop), 'oversample'
    # (GroupOverSample: 4 corners + center, transforms.py:96-132), or
    # 'full_res' (GroupFullResSample: left/center/right, :135-177); the
    # non-center modes add a mirrored copy per crop when ``flip`` is set
    eval_crops: str = "center"


def normalize(images: jax.Array, cfg: AugmentConfig, dtype=jnp.float32) -> jax.Array:
    """uint8/float [0,255] NHWC -> normalized ``dtype``."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def _crop_pairs(canvas: int, cfg: AugmentConfig) -> jnp.ndarray:
    """The discrete (crop_h, crop_w) menu (transforms.py:204-214): sizes
    base*scale, snapped to input_size when within 3px, paired with
    |i-j| <= max_distort."""
    sizes = []
    for s in cfg.scales:
        v = int(canvas * s)
        sizes.append(cfg.input_size if abs(v - cfg.input_size) < 3 else v)
    pairs = [
        (sizes[i], sizes[j])
        for i in range(len(sizes))
        for j in range(len(sizes))
        if abs(i - j) <= cfg.max_distort
    ]
    return jnp.asarray(pairs, jnp.float32)  # (P, 2) = (h, w)


def _offset_grid(cfg: AugmentConfig) -> jnp.ndarray:
    """The 13 (or 5) fixed offsets as fractions of (canvas - crop) in
    quarter steps (transforms.py:230-251: e.g. center = (2/4, 2/4))."""
    quarters = [(0, 0), (4, 0), (0, 4), (4, 4), (2, 2)]
    if cfg.more_fix_crop:
        quarters += [(0, 2), (4, 2), (2, 4), (2, 0), (1, 1), (3, 1), (1, 3), (3, 3)]
    return jnp.asarray(quarters, jnp.float32) / 4.0  # (K, 2) = (h, w) fracs


def _resize_crop(
    frames: jax.Array, crop_hw: jax.Array, off_hw: jax.Array, out_size: int
) -> jax.Array:
    """Crop (crop_h, crop_w) at (off_h, off_w) and resize to out_size², all
    frames of one video at once, static output shape.

    scale_and_translate maps input coords x_in = (x_out - t) / s, so
    s = out/crop and t = -off * s.
    """
    scale = out_size / crop_hw                       # (2,)
    translation = -off_hw * scale                    # (2,)
    return jax.image.scale_and_translate(
        frames.astype(jnp.float32),
        frames.shape[:1] + (out_size, out_size) + frames.shape[3:],
        spatial_dims=(1, 2),
        scale=scale,
        translation=translation,
        method="linear",
    )


def _augment_one(
    frames: jax.Array, key: jax.Array, cfg: AugmentConfig, pairs, offsets
) -> jax.Array:
    """(T, H, W, C) uint8 canvas -> (T, S, S, C) f32 in [0,255]."""
    canvas = frames.shape[1]
    k_pair, k_off, k_flip = jax.random.split(key, 3)
    pair = pairs[jax.random.randint(k_pair, (), 0, pairs.shape[0])]       # (h, w)
    frac = offsets[jax.random.randint(k_off, (), 0, offsets.shape[0])]    # (h, w)
    # fixed offsets quantize to quarter steps of the residual span
    # (transforms.py:231-232: w_step = (W - crop_w) // 4)
    off = jnp.floor((jnp.asarray(
        [canvas, frames.shape[2]], jnp.float32) - pair) / 4.0) * 4.0 * frac
    out = _resize_crop(frames, pair, off, cfg.input_size)
    if cfg.flip:
        out = jnp.where(jax.random.bernoulli(k_flip), out[:, :, ::-1, :], out)
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def augment_train(
    videos: jax.Array, rng: jax.Array, cfg: AugmentConfig
) -> jax.Array:
    """(B, T, H, W, C) uint8 canvases -> (B, T, S, S, C) normalized f32.

    One (scale, offset, flip) draw per video, shared by its T frames — the
    reference's group-transform contract.
    """
    b = videos.shape[0]
    pairs = _crop_pairs(videos.shape[2], cfg)
    offsets = _offset_grid(cfg)
    keys = jax.random.split(rng, b)
    out = jax.vmap(_augment_one, in_axes=(0, 0, None, None, None))(
        videos, keys, cfg, pairs, offsets
    )
    return normalize(out, cfg)


@functools.partial(jax.jit, static_argnums=(1,))
def augment_eval(videos: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """Center crop to input_size (GroupScale+GroupCenterCrop eval path,
    reference main_dist.py:214-222) + normalize. (B,T,H,W,C) uint8."""
    h, w = videos.shape[2], videos.shape[3]
    s = cfg.input_size
    y0, x0 = (h - s) // 2, (w - s) // 2
    out = videos[:, :, y0 : y0 + s, x0 : x0 + s, :]
    return normalize(out, cfg)


def eval_crop_offsets(h: int, w: int, s: int, mode: str):
    """Static (y0, x0) anchors for the test-time crop menu. 'oversample' =
    fill_fix_offset(False): 4 corners + center (reference
    transforms.py:114,255-263); 'full_res' = left/right/center at the
    vertical midline (:153-159); 'center' = the GroupCenterCrop point.
    Quarter steps of the residual span, as the reference computes them."""
    h_step, w_step = (h - s) // 4, (w - s) // 4
    if mode == "center":
        return [((h - s) // 2, (w - s) // 2)]
    if mode == "oversample":
        quarters = [(0, 0), (0, 4), (4, 0), (4, 4), (2, 2)]
    elif mode == "full_res":
        quarters = [(2, 0), (2, 4), (2, 2)]
    else:
        raise ValueError(f"unknown eval_crops mode {mode!r}")
    return [(hq * h_step, wq * w_step) for hq, wq in quarters]


def num_eval_views(cfg: AugmentConfig) -> int:
    """How many test-time views ``augment_eval_views`` produces."""
    n = len(eval_crop_offsets(8, 8, 0, cfg.eval_crops))
    return n * 2 if (cfg.flip and cfg.eval_crops != "center") else n


@functools.partial(jax.jit, static_argnums=(1,))
def augment_eval_views(videos: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """(B, T, H, W, C) uint8 canvases -> (B, V, T, S, S, C) normalized f32:
    the GroupOverSample / GroupFullResSample test-time multi-crop
    (reference transforms.py:96-177), TPU-native — every view is a static
    slice (+ optional mirror) of the already-resident canvas, stacked into
    one batch so the whole view fan evaluates in a single program. The
    per-view softmax consensus happens in validate()'s multi-clip path."""
    s = cfg.input_size
    views = []
    for y0, x0 in eval_crop_offsets(
            videos.shape[2], videos.shape[3], s, cfg.eval_crops):
        crop = videos[:, :, y0:y0 + s, x0:x0 + s, :]
        views.append(crop)
        if cfg.flip and cfg.eval_crops != "center":
            views.append(crop[:, :, :, ::-1, :])
    return normalize(jnp.stack(views, axis=1), cfg)


def glance_downsample(frames: jax.Array, glance_size: int) -> jax.Array:
    """(..., S, S, C) -> (..., g, g, C) bilinear, the on-device analog of
    the reference's F.interpolate glancer input (main_dist.py:469)."""
    shape = frames.shape[:-3] + (glance_size, glance_size, frames.shape[-1])
    if shape == frames.shape:  # glance at full resolution (the reference's
        return frames          # published glance_size=224 operating point)
    return jax.image.resize(frames, shape, method="linear")
