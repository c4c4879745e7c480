"""Bivariate g-and-k quantile distribution model
(reference ``elfi/examples/bignk.py``)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from .gnk import euclidean_multiss, ss_robust

__all__ = ["BiGNK", "get_model"]

EPS = np.finfo(float).eps


def BiGNK(A1, A2, B1, B2, g1, g2, k1, k2, rho, c=.8, n_obs=150,
          batch_size=1, key=None):
    """Sample the bivariate g-and-k distribution; (batch, n_obs, 2).

    Correlated standard normal pairs per batch member (correlation rho)
    are pushed through the per-dimension quantile function.
    """
    def col(v):
        return jnp.broadcast_to(jnp.asarray(v, jnp.float32),
                                (batch_size,))[:, None]

    A = jnp.stack([col(A1), col(A2)], axis=-1)   # (batch, 1, 2)
    B = jnp.stack([col(B1), col(B2)], axis=-1)
    g = jnp.stack([col(g1), col(g2)], axis=-1)
    k = jnp.stack([col(k1), col(k2)], axis=-1)
    rho = col(rho)[:, :, None]                    # (batch, 1, 1)

    # correlated normals via the 2x2 Cholesky of [[1, rho], [rho, 1]]
    z1 = jax.random.normal(key, (batch_size, n_obs, 1))
    z2 = jax.random.normal(jax.random.fold_in(key, 1),
                           (batch_size, n_obs, 1))
    z = jnp.concatenate([z1, rho * z1 + jnp.sqrt(1 - rho ** 2) * z2],
                        axis=-1)                  # (batch, n_obs, 2)

    gz = g * z
    term_exp = (1 - jnp.exp(-gz)) / (1 + jnp.exp(-gz))
    y = A + B * (1 + c * term_exp) * (1 + z ** 2) ** k * z
    return y


def get_model(n_obs=150, true_params=None, seed=None, seed_obs=None):
    """Bivariate g-and-k inference model (reference ``bignk.py:111-159``)."""
    if true_params is None:
        true_params = [3, 4, 1, 0.5, 1, 2, .5, .4, 0.6]
    m = elfi.Model(name="bignk")
    priors = []
    priors.append(elfi.Prior("uniform", 0, 5, model=m, name="a1"))
    priors.append(elfi.Prior("uniform", 0, 5, model=m, name="a2"))
    priors.append(elfi.Prior("uniform", 0, 5, model=m, name="b1"))
    priors.append(elfi.Prior("uniform", 0, 5, model=m, name="b2"))
    priors.append(elfi.Prior("uniform", -5, 10, model=m, name="g1"))
    priors.append(elfi.Prior("uniform", -5, 10, model=m, name="g2"))
    priors.append(elfi.Prior("uniform", -.5, 5.5, model=m, name="k1"))
    priors.append(elfi.Prior("uniform", -.5, 5.5, model=m, name="k2"))
    priors.append(elfi.Prior("uniform", -1 + EPS, 2 - 2 * EPS, model=m,
                             name="rho"))
    fn = partial(BiGNK, n_obs=n_obs)
    y_obs = np.asarray(fn(*[jnp.asarray([p], jnp.float32)
                            for p in true_params], batch_size=1,
                          key=jax.random.key(seed_obs or seed or 0)))[0]
    elfi.Simulator(fn, *priors, observed=y_obs, model=m, name="BiGNK")
    ss = elfi.Summary(ss_robust, m["BiGNK"], model=m, name="ss_robust")
    elfi.Discrepancy(euclidean_multiss, ss, model=m, name="d")
    return m
