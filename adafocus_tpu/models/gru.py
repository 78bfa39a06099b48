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

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gates(gi: jax.Array, h: jax.Array, gh: jax.Array) -> jax.Array:
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


class GRUCell(nn.Module):
    """Single GRU cell, torch-compatible math.

    r = sigmoid(x @ Wir + bir + h @ Whr + bhr)
    z = sigmoid(x @ Wiz + biz + h @ Whz + bhz)
    n = tanh(x @ Win + bin + r * (h @ Whn + bhn))
    h' = (1 - z) * n + z * h

    With ``in_features`` set, params are created in setup and the cell
    additionally exposes the TPU fast path: ``input_proj`` computes the
    input half of the gates for ALL timesteps in one batched MXU matmul,
    and ``step_from_proj`` runs only the (H, 3H) hidden matmul inside the
    scan — roughly halving the sequential work of a rolled-out GRU.
    Param names/shapes are identical either way.
    """

    hidden_size: int
    in_features: Optional[int] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _param_defs(self, in_features: int):
        H = self.hidden_size
        k = 1.0 / math.sqrt(H)

        def uniform_init(key, shape, dtype):
            return jax.random.uniform(key, shape, dtype, -k, k)

        return (
            ("wi", uniform_init, (in_features, 3 * H)),
            ("wh", uniform_init, (H, 3 * H)),
            ("bi", uniform_init, (3 * H,)),
            ("bh", uniform_init, (3 * H,)),
        )

    def setup(self):
        if self.in_features is not None:
            defs = self._param_defs(self.in_features)
            self.wi, self.wh, self.bi, self.bh = (
                self.param(name, init, shape, self.param_dtype)
                for name, init, shape in defs
            )

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        if self.in_features is None:  # legacy lazy-shape path
            wi, wh, bi, bh = (
                self.param(name, init, shape, self.param_dtype)
                for name, init, shape in self._param_defs(x.shape[-1])
            )
        else:
            wi, wh, bi, bh = self.wi, self.wh, self.bi, self.bh
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        h = h.astype(dtype)
        wi, wh, bi, bh = (a.astype(dtype) for a in (wi, wh, bi, bh))
        gi = x @ wi + bi
        gh = h @ wh + bh
        return _gates(gi, h, gh)

    def input_proj(self, x: jax.Array) -> jax.Array:
        """Input half of the gates, batched over any leading dims:
        (..., in) -> (..., 3H). Requires ``in_features``."""
        dtype = self.dtype or x.dtype
        return x.astype(dtype) @ self.wi.astype(dtype) + self.bi.astype(dtype)

    def step_from_proj(self, h: jax.Array, gi: jax.Array) -> jax.Array:
        """One recurrence step given a precomputed input projection."""
        dtype = self.dtype or h.dtype
        h = h.astype(dtype)
        gh = h @ self.wh.astype(dtype) + self.bh.astype(dtype)
        return _gates(gi.astype(dtype), h, gh)

    def scan_time(self, h0: jax.Array, xs_tb: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Scan over the leading time axis with the hoisted projection:
        xs_tb (T, B, in) -> (final hidden (B, H), stacked hiddens (T, B, H)).
        The (T*B, in) @ (in, 3H) matmul runs once, batched; only the
        (B, H) @ (H, 3H) recurrence stays sequential."""
        gi_all = self.input_proj(xs_tb)

        def step(h, gi):
            h_next = self.step_from_proj(h, gi)
            return h_next, h_next

        return jax.lax.scan(step, h0, gi_all)

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
