"""Recurrent actor-critic policy networks (discrete grid + continuous Gaussian).

Capability parity with the reference PPO nets:
  * discrete ActorCritic (actnet/models/ppo.py:27-122 in /root/reference):
    1x1-conv (or MLP) state encoder over the glancer feature map, a GRU
    carried across the T focus steps, a softmax actor over a K-point action
    grid, and a scalar critic;
  * sth-sth encoder variant with more channels + BatchNorm
    (sthsth/models/ppo.py:33-44);
  * continuous ActorCritic (sthsth/models/ppo_continuous.py:26-139):
    sigmoid 2-d mean, fixed diagonal Gaussian std, samples clamped to [0,1].

Where the reference carries GRU hidden state and an episode ``Memory`` as
mutable attributes with ``restart_batch`` flags, here ``step`` is a pure
function (carry in, carry out) designed to sit inside ``lax.scan``; the
rollout stack (T, B, ...) *is* the memory (see adafocus_tpu.ppo.rollout).

Action grids: the reference hardcodes K in {25,36,49,64} (+{16,81,100} for
sth-sth) uniformly spaced anchors over [0,1]^2
(actnet/models/gfv_net.py:272-307, sthsth/models/gfv_net.py:285-381); we
generate the same uniform sqrt(K) x sqrt(K) lattice for any square K.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adafocus_tpu.models.gru import GRUCell


def action_grid(action_dim: int) -> jax.Array:
    """K uniformly spaced (y, x) anchors in [0,1]^2; K must be a square."""
    k = int(math.isqrt(action_dim))
    if k * k != action_dim:
        raise ValueError(f"action_dim {action_dim} must be a perfect square")
    line = jnp.linspace(0.0, 1.0, k)
    yy, xx = jnp.meshgrid(line, line, indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (K, 2)


class StateEncoder(nn.Module):
    """Glance-feature-map -> flat policy state.

    conv variant: 1x1 conv to ``conv_channels`` (+ optional BatchNorm as in
    the sth-sth encoder), flatten, Dense -> feat_dim.
    mlp variant: global-avg-pool the map, Dense -> feat_dim.
    """

    feat_dim: int = 1024
    conv_channels: int = 32
    use_conv: bool = True
    use_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, fmap: jax.Array, train: bool = False) -> jax.Array:
        # fmap: (B, h, w, C)
        if self.use_conv:
            x = nn.Conv(self.conv_channels, (1, 1), use_bias=not self.use_bn,
                        dtype=self.dtype, name="proj")(fmap)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="bn")(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
        else:
            x = jnp.mean(fmap, axis=(1, 2))
        return nn.relu(nn.Dense(self.feat_dim, dtype=self.dtype, name="fc")(x))


class ActorCritic(nn.Module):
    """Recurrent actor-critic. ``step`` advances one focus step.

    discrete: actor emits logits over the K-point grid.
    continuous: actor emits a sigmoid 2-d mean; fixed std ``action_std``.
    """

    action_dim: int = 49
    hidden_dim: int = 1024
    feat_dim: int = 1024
    continuous: bool = False
    action_std: float = 0.1
    encoder_conv: bool = True
    encoder_channels: int = 32
    encoder_bn: bool = False
    dtype: Any = None

    def setup(self):
        self.encoder = StateEncoder(
            feat_dim=self.feat_dim,
            conv_channels=self.encoder_channels,
            use_conv=self.encoder_conv,
            use_bn=self.encoder_bn,
            dtype=self.dtype,
        )
        self.gru = GRUCell(hidden_size=self.hidden_dim,
                           in_features=self.feat_dim, dtype=self.dtype)
        out_dim = 2 if self.continuous else self.action_dim
        self.actor = nn.Dense(out_dim, dtype=self.dtype)
        self.critic = nn.Dense(1, dtype=self.dtype)

    def initial_hidden(self, batch: int) -> jax.Array:
        return jnp.zeros((batch, self.hidden_dim), self.dtype or jnp.float32)

    def encode(self, fmap: jax.Array, train: bool = False) -> jax.Array:
        return self.encoder(fmap, train)

    def step(
        self, hidden: jax.Array, fmap: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One focus step. Returns (hidden', actor_out, value).

        actor_out: (B, K) logits if discrete, (B, 2) sigmoid mean if
        continuous. value: (B,).
        """
        state = self.encode(fmap, train)
        hidden = self.gru(hidden, state)
        actor_out = self.actor(hidden)
        if self.continuous:
            actor_out = jax.nn.sigmoid(actor_out)
        value = self.critic(hidden)[..., 0]
        return hidden, actor_out, value

    def __call__(self, hidden: jax.Array, fmap: jax.Array, train: bool = False):
        return self.step(hidden, fmap, train)

    def rollout_states(
        self, fmaps_tb: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Whole-episode fast path: encode ALL timesteps in one batched
        call, scan only the GRU recurrence, then run actor/critic batched.

        Exact w.r.t. the stepwise path because actions never feed back into
        the recurrence (the GRU input is the encoded glance features only —
        reference ppo.py:67-96); the reference itself evaluates episodes
        batched this way (ppo.py:98-122).

        fmaps_tb: (T, B, gh, gw, C). Returns time-major
        (hiddens (T, B, H), actor_out (T, B, K|2), value (T, B)).
        """
        t, b = fmaps_tb.shape[:2]
        flat = fmaps_tb.reshape((t * b,) + fmaps_tb.shape[2:])
        states = self.encoder(flat, train).reshape(t, b, -1)
        _, hiddens = self.gru.scan_time(self.initial_hidden(b), states)
        actor_out = self.actor(hiddens)
        if self.continuous:
            actor_out = jax.nn.sigmoid(actor_out)
        value = self.critic(hiddens)[..., 0]
        return hiddens, actor_out, value


def sample_rollout(
    actor_out: jax.Array,
    rng: jax.Array,
    mode: str,
    continuous: bool,
    action_dim: int,
    action_std: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched action selection over a whole time-major rollout.

    actor_out: (T, B, K) logits or (T, B, 2) sigmoid means.
    Returns time-major (actions (T,B,2), idx (T,B), logprob (T,B)) —
    idx is zeros for continuous policies, logprob zeros in greedy mode.
    """
    t = actor_out.shape[0]
    keys = jax.random.split(rng, t)
    if continuous:
        if mode == "sample":
            actions, logprob = jax.vmap(sample_continuous, in_axes=(0, 0, None))(
                keys, actor_out, action_std)
        else:
            actions, logprob = actor_out, jnp.zeros(actor_out.shape[:-1])
        idx = jnp.zeros(actions.shape[:-1], jnp.int32)
    else:
        if mode == "sample":
            idx, logprob = jax.vmap(sample_discrete)(keys, actor_out)
        else:
            idx = greedy_discrete(actor_out)
            logprob = jnp.zeros(idx.shape)
        actions = discrete_to_coords(idx, action_dim)
    return actions, idx, logprob


def sample_discrete(
    key: jax.Array, logits: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Sample from the categorical actor; returns (action_idx, logprob)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    idx = jax.random.categorical(key, logits, axis=-1)
    return idx, jnp.take_along_axis(logp, idx[..., None], axis=-1)[..., 0]


def greedy_discrete(logits: jax.Array) -> jax.Array:
    """Eval-time deterministic action (reference ppo.py:94)."""
    return jnp.argmax(logits, axis=-1)


def discrete_to_coords(idx: jax.Array, action_dim: int) -> jax.Array:
    """Grid index -> (y, x) in [0,1]^2 (reference gfv_net.py:345-347)."""
    return action_grid(action_dim)[idx]


def sample_continuous(
    key: jax.Array, mean: jax.Array, action_std: float
) -> Tuple[jax.Array, jax.Array]:
    """Sample from N(mean, std^2 I), clamp to [0,1]; returns (action, logprob).

    The reference clamps FIRST and evaluates the behavior logprob on the
    clamped action (sthsth/models/ppo_continuous.py:99-105: double-ReLU
    clamp, then ``dist.log_prob(action)``); its ``evaluate`` scores the same
    stored clamped action (:133), so PPO ratios start at exactly 1. Scoring
    the raw sample instead (a pre-round-5 bug here) makes the ratio of every
    clamped sample wrong — at the reference's recipe std of 0.25
    (train_stage2.sh) a large fraction of samples clamp, which corrupted the
    continuous policy's updates.
    """
    noise = jax.random.normal(key, mean.shape) * action_std
    action = jnp.clip(mean + noise, 0.0, 1.0)
    logprob = gaussian_logprob(action, mean, action_std)
    return action, logprob


def gaussian_logprob(x: jax.Array, mean: jax.Array, action_std: float) -> jax.Array:
    var = action_std**2
    logp = -0.5 * ((x - mean) ** 2 / var + jnp.log(2.0 * jnp.pi * var))
    return jnp.sum(logp, axis=-1)


def gaussian_entropy(action_std: float, dim: int = 2) -> float:
    return 0.5 * dim * (1.0 + math.log(2.0 * math.pi * action_std**2))
