"""Patch extraction: coordinate math (incl. the a=1.0 edge), slice/pallas
equivalence (pallas in interpreter mode on CPU), and the scatter-add VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adafocus_tpu.ops import patch as patch_ops

pytestmark = pytest.mark.smoke  # fast CPU tier: `pytest -m smoke`


def test_patch_offsets_edges():
    # reference math: floor(a * (S - P)); a=1.0 -> S-P (last valid offset)
    acts = jnp.array([[0.0, 1.0], [0.5, 0.999]])
    offs = patch_ops.patch_offsets(acts, image_size=224, patch_size=96)
    np.testing.assert_array_equal(np.asarray(offs), [[0, 128], [64, 127]])
    assert offs.dtype == jnp.int32


def test_extract_slice_matches_numpy():
    rng = np.random.RandomState(0)
    imgs = rng.randn(4, 32, 32, 3).astype(np.float32)
    offs = np.array([[0, 0], [5, 7], [16, 16], [1, 31 - 16 + 1]], np.int32)
    offs[3] = [16, 16]
    out = patch_ops.extract_patches_slice(jnp.asarray(imgs), jnp.asarray(offs), 16)
    expected = np.stack(
        [imgs[i, y : y + 16, x : x + 16] for i, (y, x) in enumerate(offs)]
    )
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_extract_pallas_interpret_matches_slice():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(3, 24, 24, 3).astype(np.float32))
    offs = jnp.asarray(np.array([[0, 0], [8, 8], [16, 16]], np.int32))
    with pltpu.force_tpu_interpret_mode():
        out_pl = patch_ops.extract_patches_pallas(imgs, offs, 8)
    out_sl = patch_ops.extract_patches_slice(imgs, offs, 8)
    np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_sl))


def test_extract_patches_public_api_and_vjp():
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    offs = jnp.asarray(np.array([[2, 3], [0, 8]], np.int32))

    def loss(images):
        p = patch_ops.extract_patches(images, offs, 8, "slice")
        return jnp.sum(p**2)

    g = jax.grad(loss)(imgs)
    # Gradient is 2*x inside the patch window, 0 outside.
    expected = np.zeros_like(np.asarray(imgs))
    for i, (y, x) in enumerate(np.asarray(offs)):
        expected[i, y : y + 8, x : x + 8] = 2 * np.asarray(imgs)[i, y : y + 8, x : x + 8]
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_random_patch_actions_in_range():
    acts = patch_ops.random_patch_actions(jax.random.key(0), (5, 4))
    assert acts.shape == (5, 4, 2)
    a = np.asarray(acts)
    assert (a >= 0).all() and (a <= 1).all()


def test_extract_chunked_grid_matches_slice(monkeypatch):
    """Large batches chain kernel calls (smem cap — see _MAX_KERNEL_GRID);
    the chunked path must be exact, including the remainder chunk."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(patch_ops, "_MAX_KERNEL_GRID", 4)
    rng = np.random.RandomState(3)
    n = 10  # 4 + 4 + 2: two full chunks + remainder
    imgs = jnp.asarray(rng.randn(n, 24, 24, 3).astype(np.float32))
    offs = jnp.asarray(rng.randint(0, 17, size=(n, 2)).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        out_pl = patch_ops.extract_patches_pallas(imgs, offs, 8)
    out_sl = patch_ops.extract_patches_slice(imgs, offs, 8)
    np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_sl))
