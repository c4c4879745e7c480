"""AR(1) example model (reference ``elfi/examples/ar1.py``)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["AR1", "get_model"]


def AR1(phi, n_obs=200, batch_size=1, key=None):
    """x_i = phi x_{i-1} + w_i, w ~ N(0,1), x_0 = 0; (batch, n_obs)."""
    phi = jnp.broadcast_to(jnp.asarray(phi, jnp.float32), (batch_size,))
    w = jax.random.normal(key, (n_obs, batch_size))

    def step(x_prev, w_i):
        x = phi * x_prev + w_i
        return x, x

    _, xs = jax.lax.scan(step, jnp.zeros(batch_size), w)
    return xs.T


def get_model(n_obs=200, true_params=None, seed_obs=None):
    """AR1 inference model (reference ``ar1.py:41-75``)."""
    if true_params is None:
        true_params = [.9]
    sim_fn = partial(AR1, n_obs=n_obs)
    y = np.asarray(sim_fn(jnp.asarray([true_params[0]], jnp.float32),
                          batch_size=1, key=jax.random.key(seed_obs or 0)))[0]
    m = elfi.Model(name="ar1")
    elfi.Prior("uniform", -1, 2, model=m, name="phi")
    elfi.Simulator(sim_fn, m["phi"], observed=y, model=m, name="AR1")
    elfi.Distance("euclidean", m["AR1"], model=m, name="d")
    return m
