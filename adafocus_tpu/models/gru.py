"""Functional GRU matching torch.nn.GRU gate math.

The reference carries GRU hidden state as mutable module attributes with
``restart_batch`` reset flags (actnet/models/gfv_net.py:437-446 and
actnet/models/ppo.py:67-81 in /root/reference). Here the hidden state is an
explicit carry threaded through ``lax.scan`` — the TPU-native shape for
recurrence: one compiled program, no Python-step loop, no hidden module state.

Gate order follows torch ([r, z, n] stacked along the output dim) so that
torch-trained checkpoints convert by simple transpose.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRUCell(nn.Module):
    """Single GRU cell, torch-compatible math.

    r = sigmoid(x @ Wir + bir + h @ Whr + bhr)
    z = sigmoid(x @ Wiz + biz + h @ Whz + bhz)
    n = tanh(x @ Win + bin + r * (h @ Whn + bhn))
    h' = (1 - z) * n + z * h
    """

    hidden_size: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        H = self.hidden_size
        in_features = x.shape[-1]
        k = 1.0 / jnp.sqrt(H)

        def uniform_init(key, shape, dtype):
            return jax.random.uniform(key, shape, dtype, -k, k)

        wi = self.param("wi", uniform_init, (in_features, 3 * H), self.param_dtype)
        wh = self.param("wh", uniform_init, (H, 3 * H), self.param_dtype)
        bi = self.param("bi", uniform_init, (3 * H,), self.param_dtype)
        bh = self.param("bh", uniform_init, (3 * H,), self.param_dtype)

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        h = h.astype(dtype)
        wi, wh, bi, bh = (a.astype(dtype) for a in (wi, wh, bi, bh))

        # One fused matmul per operand: (B, in) @ (in, 3H) rides the MXU.
        gi = x @ wi + bi
        gh = h @ wh + bh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)

        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h

    def initial_state(self, batch: int) -> jax.Array:
        return jnp.zeros((batch, self.hidden_size), dtype=self.dtype or jnp.float32)


def gru_scan(cell: GRUCell, params, h0: jax.Array, xs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Run a GRU cell over the leading (time) axis of ``xs`` via lax.scan.

    Args:
      cell: the GRUCell module definition.
      params: its bound variables (``{'params': ...}``).
      h0: (B, H) initial hidden state.
      xs: (T, B, in) inputs.

    Returns:
      (final_hidden (B, H), stacked outputs (T, B, H)).
    """

    def step(h, x):
        h_next = cell.apply(params, h, x)
        return h_next, h_next

    return jax.lax.scan(step, h0, xs)
