"""GRU cell parity vs torch.nn.GRUCell (the reference's recurrence primitive:
torch GRU at actnet/models/gfv_net.py:420 and ppo.py:49)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from adafocus_tpu.models.gru import GRUCell, gru_scan

pytestmark = pytest.mark.smoke  # fast CPU tier: `pytest -m smoke`


@pytest.fixture(scope="module")
def cell_and_torch():
    in_dim, hidden = 12, 16
    tcell = torch.nn.GRUCell(in_dim, hidden)
    cell = GRUCell(hidden_size=hidden)
    params = cell.init(jax.random.key(0), jnp.zeros((1, hidden)), jnp.zeros((1, in_dim)))
    # Copy torch weights into our layout: torch weight_ih is (3H, in) stacked [r,z,n].
    p = dict(params["params"])
    p["wi"] = jnp.asarray(tcell.weight_ih.detach().numpy().T)
    p["wh"] = jnp.asarray(tcell.weight_hh.detach().numpy().T)
    p["bi"] = jnp.asarray(tcell.bias_ih.detach().numpy())
    p["bh"] = jnp.asarray(tcell.bias_hh.detach().numpy())
    return cell, {"params": p}, tcell, in_dim, hidden


def test_single_step_matches_torch(cell_and_torch):
    cell, params, tcell, in_dim, hidden = cell_and_torch
    rng = np.random.RandomState(0)
    x = rng.randn(4, in_dim).astype(np.float32)
    h = rng.randn(4, hidden).astype(np.float32)

    ours = cell.apply(params, jnp.asarray(h), jnp.asarray(x))
    theirs = tcell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_scan_matches_torch_unroll(cell_and_torch):
    cell, params, tcell, in_dim, hidden = cell_and_torch
    rng = np.random.RandomState(1)
    T, B = 7, 3
    xs = rng.randn(T, B, in_dim).astype(np.float32)
    h0 = np.zeros((B, hidden), np.float32)

    h_final, ys = gru_scan(cell, params, jnp.asarray(h0), jnp.asarray(xs))

    ht = torch.from_numpy(h0)
    torch_ys = []
    for t in range(T):
        ht = tcell(torch.from_numpy(xs[t]), ht)
        torch_ys.append(ht.detach().numpy())
    np.testing.assert_allclose(np.asarray(ys), np.stack(torch_ys), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_final), torch_ys[-1], atol=1e-5)
