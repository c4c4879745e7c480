"""M/G/1 queue model (reference ``elfi/examples/mg1.py``)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["MG1", "get_model", "log_identity", "quantiles"]


def MG1(t1, t2, t3, n_obs=50, batch_size=1, key=None):
    """Interdeparture times of an M/G/1 queue: service ~ U(t1, t2),
    interarrivals ~ Exp(t3); (batch, n_obs) via one scan."""
    t1 = jnp.broadcast_to(jnp.asarray(t1, jnp.float32), (batch_size,))
    t2 = jnp.broadcast_to(jnp.asarray(t2, jnp.float32), (batch_size,))
    t3 = jnp.broadcast_to(jnp.asarray(t3, jnp.float32), (batch_size,))
    k1, k2 = jax.random.split(key)
    W = jax.random.exponential(k1, (n_obs, batch_size)) / t3
    U = t1 + (t2 - t1) * jax.random.uniform(k2, (n_obs, batch_size))

    def step(carry, wu):
        sum_w, sum_x = carry
        w, u = wu
        sum_w = sum_w + w
        y = u + jnp.maximum(0.0, sum_w - sum_x)
        sum_x = sum_x + y
        return (sum_w, sum_x), y

    zeros = jnp.zeros(batch_size)
    _, ys = jax.lax.scan(step, (zeros, zeros), (W, U))
    return ys.T


def log_identity(x):
    return jnp.log(x)


def quantiles(x, q):
    return jnp.quantile(x, jnp.asarray(q), axis=1).T


def get_model(n_obs=50, true_params=None, seed_obs=None, n_quantiles=10):
    """M/G/1 inference model with log quantile summaries (reference
    ``mg1.py:56-116``)."""
    if true_params is None:
        true_params = [1., 5., 0.2]
    sim_fn = partial(MG1, n_obs=n_obs)
    y = np.asarray(sim_fn(*[jnp.asarray([p], jnp.float32)
                            for p in true_params], batch_size=1,
                          key=jax.random.key(seed_obs or 0)))[0]
    m = elfi.Model(name="mg1")
    elfi.Prior("uniform", 0., 10., model=m, name="t1")
    elfi.Prior("uniform", 0., 10., model=m, name="t2")
    elfi.Prior("uniform", 0., 0.5, model=m, name="t3")
    elfi.Simulator(sim_fn, m["t1"], m["t2"], m["t3"], observed=y, model=m,
                   name="MG1")
    q = np.linspace(0, 1, n_quantiles + 2)[1:-1]
    elfi.Summary(partial(quantiles, q=q), m["MG1"], model=m,
                 name="log_qtls")
    log_q = elfi.Operation(log_identity, m["log_qtls"], model=m,
                           name="log_sumstats")
    elfi.Distance("euclidean", log_q, model=m, name="d")
    return m
