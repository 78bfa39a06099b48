"""Temporal classifiers fusing glance + focus features.

Parity with the reference heads:
  * RecurrentClassifier (actnet/models/gfv_net.py:409-457 in
    /root/reference): GRU(input=glance_dim+focus_dim=3328, hidden=1024) +
    per-step FC. The reference keeps hidden state ``hx`` on the module and
    resets it via ``restart_batch``; here the hidden is a ``lax.scan`` carry
    and a pure ``step`` is exposed for MDP-style single steps.
  * LinearClassifier (actnet/models/gfv_net.py:388-407): per-frame FC +
    softmax-mean consensus (trained with NLL on the log of the averaged
    probabilities).
  * ConsensusHead (sthsth/models/gfv_net.py:66-99 + ops/basic_ops.py:9-37):
    average-consensus of per-frame logits; the sth-sth model sums the
    glancer-logit consensus and focuser-logit consensus.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adafocus_tpu.models.gru import GRUCell


class RecurrentClassifier(nn.Module):
    """With ``in_dim`` set (the composed models always set it), the
    sequence forward uses the TPU fast path: the GRU input projection and
    the per-step FC run as single batched (B*T) matmuls; only the (H, 3H)
    recurrence is scanned."""

    num_classes: int
    hidden_dim: int = 1024
    in_dim: Optional[int] = None
    dtype: Any = None

    def setup(self):
        self.gru = GRUCell(hidden_size=self.hidden_dim,
                           in_features=self.in_dim, dtype=self.dtype)
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)

    def initial_hidden(self, batch: int) -> jax.Array:
        return jnp.zeros((batch, self.hidden_dim), self.dtype or jnp.float32)

    def step(self, hidden: jax.Array, feature: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """One timestep: (h, (B, D)) -> (h', (B, classes))."""
        hidden = self.gru(hidden, feature)
        return hidden, self.fc(hidden)

    def lookahead(self, hidden: jax.Array, feature: jax.Array) -> jax.Array:
        """One GRU step from a given hidden WITHOUT carrying the result —
        the reference's test_single_forward, which reads the stored ``hx``
        but never writes it back (actnet/models/gfv_net.py:449-457); used
        for the stage-2 random-patch reward baseline. (N, H), (N, D) ->
        (N, classes)."""
        return self.fc(self.gru(hidden, feature))

    def forward_with_hiddens(
        self, features: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Sequence forward that also returns the per-step GRU hiddens:
        (B, T, D) -> (logits (B, T, classes), hiddens (B, T, H)). Requires
        ``in_dim`` (the composed models always set it)."""
        b = features.shape[0]
        xs = jnp.swapaxes(features, 0, 1)
        _, hs = self.gru.scan_time(self.initial_hidden(b), xs)
        return jnp.swapaxes(self.fc(hs), 0, 1), jnp.swapaxes(hs, 0, 1)

    def __call__(self, features: jax.Array) -> jax.Array:
        """features (B, T, D) -> per-step logits (B, T, classes)."""
        b = features.shape[0]
        h0 = self.initial_hidden(b)
        xs = jnp.swapaxes(features, 0, 1)  # (T, B, D)
        if self.in_dim is not None:
            _, hs = self.gru.scan_time(h0, xs)       # (T, B, H)
            return jnp.swapaxes(self.fc(hs), 0, 1)   # batched FC

        def body(module, h, x):
            return module.step(h, x)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, logits = scan(self, h0, xs)
        return jnp.swapaxes(logits, 0, 1)  # (B, T, classes)


class LinearClassifier(nn.Module):
    """Per-frame FC; consensus = mean of per-frame softmax probabilities."""

    num_classes: int
    dropout_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False) -> jax.Array:
        """features (B, T, D) -> consensus log-probs (B, classes)."""
        if self.dropout_rate > 0:
            features = nn.Dropout(self.dropout_rate, deterministic=not train)(features)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(features)
        probs = jax.nn.softmax(logits, axis=-1).mean(axis=1)
        return jnp.log(jnp.clip(probs, 1e-12))


class ConsensusHead(nn.Module):
    """sth-sth local head: dropout + per-frame FC over focuser features
    (reference sthsth/models/gfv_net.py:91-93: dropout -> nn.Linear); the
    average consensus itself is ``avg_consensus`` applied by the caller."""

    num_classes: int
    dropout_rate: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False) -> jax.Array:
        """(..., D) focuser features -> (..., classes) per-frame logits."""
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(features)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def avg_consensus(logits: jax.Array, axis: int = 1) -> jax.Array:
    """Average consensus over the time axis (reference ops/basic_ops.py:9-37)."""
    return jnp.mean(logits, axis=axis)
