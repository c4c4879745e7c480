"""Alpha-stable stochastic volatility model (Vankov et al. 2019,
Priddle & Drovandi 2020; reference
``elfi/examples/stochastic_volatility_model.py``)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from ..ops.distributions import levy_stable

__all__ = ["shock_term", "log_vol", "alpha_stochastic_volatility_model",
           "get_model", "kurt", "skew"]


def log_vol(mu, phi, sigma, n_obs, batch_size=1, key=None, prev_x=None):
    """AR(1) log-volatilities in mean/difference form; (batch, n_obs)."""
    mu = jnp.broadcast_to(jnp.asarray(mu, jnp.float32), (batch_size,))
    phi = jnp.broadcast_to(jnp.asarray(phi, jnp.float32), (batch_size,))
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (batch_size,))
    k0, k1 = jax.random.split(key)
    if prev_x is None:
        scale0 = sigma / jnp.sqrt(1 - jnp.minimum(phi ** 2, 0.99999))
        x0 = mu + scale0 * jax.random.normal(k0, (batch_size,))
    else:
        x0 = mu + phi * (prev_x - mu) + sigma * \
            jax.random.normal(k0, (batch_size,))
    ws = jax.random.normal(k1, (n_obs - 1, batch_size))

    def step(x, w):
        x = mu + phi * (x - mu) + sigma * w
        return x, x

    _, xs = jax.lax.scan(step, x0, ws)
    return jnp.concatenate([x0[None], xs], axis=0).T


def shock_term(alpha, beta, kappa, eta, n_obs, batch_size=1, key=None):
    """Alpha-stable shocks (S0 parameterization); (batch, n_obs)."""
    alpha = jnp.asarray(alpha, jnp.float32).reshape(-1, 1)
    beta = jnp.asarray(beta, jnp.float32).reshape(-1, 1)
    return levy_stable.rvs(alpha, beta, eta, kappa,
                           size=(batch_size, n_obs), key=key)


def alpha_stochastic_volatility_model(alpha, beta, kappa=1., eta=0., mu=0.,
                                      phi=.95, sigma=.2, n_obs=50, x_0=None,
                                      batch_size=1, key=None):
    """Returns y_t = exp(x_t / 2) v_t; (batch, n_obs)."""
    k1, k2 = jax.random.split(key)
    x = log_vol(mu, phi, sigma, n_obs, batch_size, k1, x_0)
    v = shock_term(alpha, beta, kappa, eta, n_obs, batch_size, k2)
    return jnp.exp(0.5 * x) * v


def kurt(x):
    """Robust kurtosis from quantiles; (batch,)."""
    qs = jnp.quantile(x, jnp.asarray([0.05, 0.25, 0.75, 0.95]), axis=1)
    return (qs[3] - qs[0]) / (qs[2] - qs[1])


def skew(x):
    """Robust skewness from quantiles; (batch,)."""
    qs = jnp.quantile(x, jnp.asarray([0.05, 0.50, 0.95]), axis=1)
    return ((qs[2] - qs[1]) - (qs[1] - qs[0])) / (qs[2] - qs[0])


def get_model(n_obs=50, true_params=None, seed_obs=None):
    """SVM inference model for (alpha, beta) (reference
    ``stochastic_volatility_model.py:173-217``)."""
    if true_params is None:
        true_params = [1.2, 0.5]
    fixed = {"kappa": 1, "eta": 0, "mu": 0, "phi": 0.95, "sigma": 0.2}
    sim = partial(alpha_stochastic_volatility_model, n_obs=n_obs)
    y_obs = np.asarray(sim(jnp.asarray([true_params[0]], jnp.float32),
                           jnp.asarray([true_params[1]], jnp.float32),
                           **fixed, batch_size=1,
                           key=jax.random.key(seed_obs or 0)))[0]
    m = elfi.Model(name="a_svm")
    elfi.Prior("uniform", 0.5, 1.5, model=m, name="alpha")
    elfi.Prior("uniform", -1, 2, model=m, name="beta")
    constants = [elfi.Constant(v, model=m, name=k_)
                 for k_, v in fixed.items()]
    elfi.Simulator(sim, m["alpha"], m["beta"], *constants, observed=y_obs,
                   model=m, name="a_svm")
    elfi.Summary(kurt, m["a_svm"], model=m, name="kurt")
    elfi.Summary(skew, m["a_svm"], model=m, name="skew")
    elfi.Distance("euclidean", m["kurt"], m["skew"], model=m, name="d")
    return m
