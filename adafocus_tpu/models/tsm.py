"""Temporal Shift Module (TSM) as a pure function.

Reference: sthsth/ops/temporal_shift.py:28-46 in /root/reference shifts the
first C/div channels one frame left (toward t-1), the next C/div one frame
right, rest untouched — implemented there with ``torch.zeros_like`` + copies,
and a dead "InplaceShift" CUDA substitute (:49-76). On TPU this is a pad+slice
on the time axis that XLA fuses into the adjacent convolutions; no kernel
needed.

Layout note: inputs are NHWC frames flattened over (batch, time), i.e.
(B*T, H, W, C); the shift reshapes to (B, T, H, W, C) internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def temporal_shift(x: jax.Array, n_frames: int, shift_div: int = 8) -> jax.Array:
    """Shift channel groups across time.

    Args:
      x: (B*T, H, W, C) frame features.
      n_frames: T, frames per clip.
      shift_div: shift C/shift_div channels each direction.

    Returns:
      (B*T, H, W, C), where channels [0:fold) hold features from frame t+1
      (shift-left), [fold:2*fold) from frame t-1 (shift-right), zero-padded at
      clip boundaries — matching the reference's out[:, :-1, :fold] =
      x[:, 1:, :fold] semantics.
    """
    bt, h, w, c = x.shape
    if bt % n_frames != 0:
        raise ValueError(f"batch*time={bt} not divisible by n_frames={n_frames}")
    b = bt // n_frames
    fold = c // shift_div

    xt = x.reshape(b, n_frames, h, w, c)
    left, right, keep = (
        xt[..., :fold],
        xt[..., fold : 2 * fold],
        xt[..., 2 * fold :],
    )
    zeros = jnp.zeros((b, 1, h, w, fold), dtype=x.dtype)
    # shift left: out[t] = in[t+1]
    left = jnp.concatenate([left[:, 1:], zeros], axis=1)
    # shift right: out[t] = in[t-1]
    right = jnp.concatenate([zeros, right[:, :-1]], axis=1)
    out = jnp.concatenate([left, right, keep], axis=-1)
    return out.reshape(bt, h, w, c)
