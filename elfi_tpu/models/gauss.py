"""Gaussian noise example models (reference ``elfi/examples/gauss.py``)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["gauss", "gauss_nd_mean", "get_model", "ss_mean", "ss_var",
           "euclidean_multidim"]


def gauss(mu, sigma, n_obs=50, batch_size=1, key=None):
    """1-D Gaussian observations; (batch, n_obs)."""
    mu = jnp.asarray(mu).reshape(-1, 1)
    sigma = jnp.asarray(sigma).reshape(-1, 1)
    return mu + sigma * jax.random.normal(key, (batch_size, n_obs))


def gauss_nd_mean(*mu, cov_matrix, n_obs=15, batch_size=1, key=None):
    """n-D Gaussian with unknown mean; (batch, n_obs, n_dim)."""
    n_dim = len(mu)
    mus = jnp.stack([jnp.broadcast_to(jnp.asarray(m, jnp.float32),
                                      (batch_size,)) for m in mu], axis=1)
    L = jnp.linalg.cholesky(jnp.asarray(cov_matrix, jnp.float32))
    z = jax.random.normal(key, (batch_size, n_obs, n_dim))
    return mus[:, None, :] + z @ L.T


def ss_mean(y):
    return jnp.mean(y, axis=1)


def ss_var(y):
    return jnp.var(y, axis=1)


def euclidean_multidim(*simulated, observed):
    """Euclidean distance merging data dimensions (reference
    ``gauss.py:176-198``)."""
    d2 = sum(jnp.sum((jnp.asarray(s) - jnp.asarray(o)) ** 2,
                     axis=tuple(range(1, jnp.asarray(s).ndim)))
             for s, o in zip(simulated, observed))
    return jnp.sqrt(d2)


def get_model(n_obs=50, true_params=None, seed_obs=None, nd_mean=False,
              cov_matrix=None):
    """Gaussian noise model, 1-D (mu, sigma) or n-D mean (reference
    ``gauss.py:76-140``)."""
    if true_params is None:
        true_params = [4, 4] if nd_mean else [4, .4]

    if nd_mean:
        fn = partial(gauss_nd_mean, cov_matrix=cov_matrix, n_obs=n_obs)
    else:
        fn = partial(gauss, n_obs=n_obs)
    y_obs = np.asarray(fn(*[jnp.asarray([p], jnp.float32)
                            for p in true_params],
                          batch_size=1,
                          key=jax.random.key(seed_obs or 0)))[0]

    m = elfi.Model(name="gauss")
    eps_prior = 5
    priors = []
    if nd_mean:
        for i, tp in enumerate(true_params):
            priors.append(elfi.Prior("uniform", tp - eps_prior,
                                     2 * eps_prior, model=m,
                                     name=f"mu_{i}"))
    else:
        priors.append(elfi.Prior("uniform", true_params[0] - eps_prior,
                                 2 * eps_prior, model=m, name="mu"))
        priors.append(elfi.Prior(
            "truncnorm", max(.01, true_params[1] - eps_prior),
            2 * eps_prior, model=m, name="sigma"))
    elfi.Simulator(fn, *priors, observed=y_obs, model=m, name="gauss")
    s1 = elfi.Summary(ss_mean, m["gauss"], model=m, name="ss_mean")
    s2 = elfi.Summary(ss_var, m["gauss"], model=m, name="ss_var")
    if nd_mean:
        elfi.Discrepancy(euclidean_multidim, s1, s2, model=m, name="d")
    else:
        elfi.Distance("euclidean", s1, s2, model=m, name="d")
    return m
