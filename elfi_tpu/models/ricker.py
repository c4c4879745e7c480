"""Ricker population model (reference ``elfi/examples/ricker.py``): the
time recursion runs as a ``lax.scan`` so the whole batch fuses into one XLA
program."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["ricker", "stochastic_ricker", "get_model", "chi_squared",
           "num_zeros"]


def ricker(log_rate, stock_init=1., n_obs=50, batch_size=1, key=None):
    """Deterministic Ricker map; (batch, n_obs)."""
    log_rate = jnp.broadcast_to(jnp.asarray(log_rate, jnp.float32),
                                (batch_size,))
    stock0 = jnp.full((batch_size,), stock_init, jnp.float32)

    def step(stock, _):
        new = stock * jnp.exp(log_rate - stock)
        return new, stock

    _, stocks = jax.lax.scan(step, stock0, None, length=n_obs)
    return stocks.T


def stochastic_ricker(log_rate, std, scale, stock_init=1., n_obs=50,
                      batch_size=1, key=None):
    """Stochastic Ricker with Poisson observations (Wood 2010);
    (batch, n_obs)."""
    log_rate = jnp.broadcast_to(jnp.asarray(log_rate, jnp.float32),
                                (batch_size,))
    std = jnp.broadcast_to(jnp.asarray(std, jnp.float32), (batch_size,))
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (batch_size,))
    stock0 = jnp.full((batch_size,), stock_init, jnp.float32)
    keys = jax.random.split(key, n_obs)

    def step(stock, k):
        k1, k2 = jax.random.split(k)
        stock = stock * jnp.exp(log_rate - stock
                                + std * jax.random.normal(k1, (batch_size,)))
        obs = jax.random.poisson(k2, scale * stock, (batch_size,))
        return stock, obs

    _, obs = jax.lax.scan(step, stock0, keys)
    return obs.T.astype(jnp.float32)


def num_zeros(x):
    return jnp.sum(x == 0, axis=1)


def chi_squared(*simulated, observed):
    """Chi-squared goodness of fit over stacked summaries (reference
    ``ricker.py:148-163``)."""
    sim = jnp.column_stack([jnp.asarray(s, jnp.float32).reshape(
        jnp.asarray(s).shape[0], -1) for s in simulated])
    obs = jnp.column_stack([jnp.asarray(o, jnp.float32).reshape(1, -1)
                            for o in observed])
    return jnp.sum((sim - obs) ** 2 / obs, axis=1)


def get_model(n_obs=50, true_params=None, seed_obs=None, stochastic=True):
    """Ricker inference model (reference ``ricker.py:88-146``)."""
    m = elfi.Model(name="ricker")
    if stochastic:
        if true_params is None:
            true_params = [3.8, 0.3, 10.]
        sim_fn = partial(stochastic_ricker, n_obs=n_obs)
        y_obs = np.asarray(sim_fn(*[jnp.asarray([p], jnp.float32)
                                    for p in true_params], batch_size=1,
                                  key=jax.random.key(seed_obs or 0)))[0]
        elfi.Prior("expon", np.e, 2, model=m, name="t1")
        elfi.Prior("truncnorm", 0, 5, model=m, name="t2")
        elfi.Prior("uniform", 0, 100, model=m, name="t3")
        elfi.Simulator(sim_fn, m["t1"], m["t2"], m["t3"], observed=y_obs,
                       model=m, name="Ricker")
        s1 = elfi.Summary(lambda x: jnp.mean(x, axis=1), m["Ricker"],
                          model=m, name="Mean")
        s2 = elfi.Summary(lambda x: jnp.var(x, axis=1), m["Ricker"],
                          model=m, name="Var")
        s3 = elfi.Summary(num_zeros, m["Ricker"], model=m, name="n0")
        elfi.Discrepancy(chi_squared, s1, s2, s3, model=m, name="d")
    else:
        if true_params is None:
            true_params = [3.8]
        sim_fn = partial(ricker, n_obs=n_obs)
        y_obs = np.asarray(sim_fn(jnp.asarray([true_params[0]], jnp.float32),
                                  batch_size=1,
                                  key=jax.random.key(seed_obs or 0)))[0]
        elfi.Prior("expon", np.e, model=m, name="t1")
        elfi.Simulator(sim_fn, m["t1"], observed=y_obs, model=m,
                       name="Ricker")
        s1 = elfi.Summary(lambda x: jnp.mean(x, axis=1), m["Ricker"],
                          model=m, name="Mean")
        elfi.Distance("euclidean", s1, model=m, name="d")
    return m
