"""TSM shift parity vs the reference semantics (sthsth/ops/temporal_shift.py:28-46),
re-derived here in numpy (modeled on the reference's own __main__ equivalence
test at temporal_shift.py:154-202)."""

import pytest

import numpy as np
import jax.numpy as jnp

from adafocus_tpu.models.tsm import temporal_shift

pytestmark = pytest.mark.smoke  # fast CPU tier: `pytest -m smoke`


def reference_shift(x, n_frames, shift_div):
    # x: (B*T, H, W, C) -> torch reference operates on (B, T, C, H, W);
    # semantics: out[:, :-1, :fold] = x[:, 1:, :fold] (left),
    #            out[:, 1:, fold:2fold] = x[:, :-1, fold:2fold] (right).
    bt, h, w, c = x.shape
    b = bt // n_frames
    fold = c // shift_div
    xt = x.reshape(b, n_frames, h, w, c)
    out = np.zeros_like(xt)
    out[:, :-1, ..., :fold] = xt[:, 1:, ..., :fold]
    out[:, 1:, ..., fold : 2 * fold] = xt[:, :-1, ..., fold : 2 * fold]
    out[..., 2 * fold :] = xt[..., 2 * fold :]
    return out.reshape(bt, h, w, c)


def test_shift_matches_reference_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(2 * 4, 3, 3, 16).astype(np.float32)
    ours = np.asarray(temporal_shift(jnp.asarray(x), n_frames=4, shift_div=8))
    np.testing.assert_array_equal(ours, reference_shift(x, 4, 8))


def test_shift_zero_boundaries():
    x = np.ones((1 * 2, 1, 1, 8), np.float32)
    out = np.asarray(temporal_shift(jnp.asarray(x), n_frames=2, shift_div=8))
    # channel 0 shifted left: last frame becomes zero
    assert out[1, 0, 0, 0] == 0.0
    # channel 1 shifted right: first frame becomes zero
    assert out[0, 0, 0, 1] == 0.0
    # untouched channels unchanged
    np.testing.assert_array_equal(out[:, :, :, 2:], x[:, :, :, 2:])
