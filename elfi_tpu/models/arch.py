"""ARCH(1) regression model (reference ``elfi/examples/arch.py``)."""

from __future__ import annotations

from functools import partial
from itertools import combinations

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["arch", "get_model", "sample_mean", "sample_variance",
           "autocorr", "pairwise_autocorr"]


def arch(t1, t2, n_obs=100, batch_size=1, key=None):
    """x_i = t1 x_{i-1} + e_i with e_i = w_i sqrt(0.2 + t2 e_{i-1}^2)
    (Engle 1982); (batch, n_obs) via one scan."""
    t1 = jnp.broadcast_to(jnp.asarray(t1, jnp.float32), (batch_size,))
    t2 = jnp.broadcast_to(jnp.asarray(t2, jnp.float32), (batch_size,))
    k0, k1 = jax.random.split(key)
    e0 = jax.random.normal(k0, (batch_size,))
    xi = jax.random.normal(k1, (n_obs, batch_size))

    def step(carry, xi_i):
        y_prev, e_prev = carry
        e = xi_i * jnp.sqrt(0.2 + t2 * e_prev ** 2)
        y = t1 * y_prev + e
        return (y, e), y

    _, ys = jax.lax.scan(step, (jnp.zeros(batch_size), e0), xi)
    return ys.T


def sample_mean(x):
    return jnp.mean(x, axis=1)


def sample_variance(x):
    return jnp.var(x, axis=1, ddof=1)


def autocorr(x, lag=1):
    n = x.shape[1]
    mu = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.std(x, axis=1, ddof=1, keepdims=True)
    z = (x - mu) / std
    return jnp.sum(z[:, lag:] * z[:, :-lag], axis=1) / (n - lag)


def pairwise_autocorr(x, lag_i=1, lag_j=1):
    return autocorr(x, lag_i) * autocorr(x, lag_j)


def get_model(n_obs=100, true_params=None, seed_obs=None, n_lags=5):
    """ARCH(1) inference model with mean/variance/autocorrelation summaries
    (reference ``arch.py:12-60``)."""
    if true_params is None:
        true_params = [0.3, 0.7]
    m = elfi.Model(name="arch")
    t1 = elfi.Prior("uniform", -1, 2, model=m, name="t1")
    t2 = elfi.Prior("uniform", 0, 1, model=m, name="t2")
    sim_fn = partial(arch, n_obs=n_obs)
    y_obs = np.asarray(sim_fn(*[jnp.asarray([p], jnp.float32)
                                for p in true_params], batch_size=1,
                              key=jax.random.key(seed_obs or 0)))[0]
    Y = elfi.Simulator(sim_fn, t1, t2, observed=y_obs, model=m, name="Y")
    ss = [elfi.Summary(sample_mean, Y, model=m, name="MU"),
          elfi.Summary(sample_variance, Y, model=m, name="VAR")]
    for i in range(1, n_lags + 1):
        ss.append(elfi.Summary(partial(autocorr, lag=i), Y, model=m,
                               name=f"AC_{i}"))
    for i, j in combinations(range(1, n_lags + 1), 2):
        ss.append(elfi.Summary(partial(pairwise_autocorr, lag_i=i, lag_j=j),
                               Y, model=m, name=f"PW_{i}_{j}"))
    elfi.Distance("euclidean", *ss, model=m, name="d")
    return m
