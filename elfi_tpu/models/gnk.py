"""Univariate g-and-k quantile distribution model
(reference ``elfi/examples/gnk.py``)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["GNK", "get_model", "ss_order", "ss_robust", "ss_octile",
           "ss_octile_sq", "euclidean_multiss"]


def GNK(A, B, g, k, c=0.8, n_obs=50, batch_size=1, key=None):
    """Sample the g-and-k distribution by evaluating its quantile function
    at standard normal draws; (batch, n_obs, 1)."""
    A = jnp.asarray(A).reshape(-1, 1)
    B = jnp.asarray(B).reshape(-1, 1)
    g = jnp.asarray(g).reshape(-1, 1)
    k = jnp.asarray(k).reshape(-1, 1)
    z = jax.random.normal(key, (batch_size, n_obs))
    y = A + B * (1 + c * ((1 - jnp.exp(-g * z)) / (1 + jnp.exp(-g * z)))) \
        * (1 + z ** 2) ** k * z
    return y[:, :, None]


def euclidean_multiss(*simulated, observed):
    """Euclidean distance merging summary dims (reference
    ``gnk.py:116-142``)."""
    d2 = 0.0
    for s, o in zip(simulated, observed):
        s = jnp.asarray(s)
        d2 = d2 + jnp.sum((s - jnp.asarray(o)) ** 2,
                          axis=tuple(range(1, s.ndim)))
    return jnp.sqrt(d2)


def ss_order(y):
    """Order statistics summary (Allingham et al. 2009)."""
    return jnp.sort(y, axis=1)


def _percentiles(y, qs):
    return jnp.percentile(y, jnp.asarray(qs), axis=1)


def _ss_B(y):
    L1, L3 = _percentiles(y, [25., 75.])
    return jnp.where(L3 - L1 == 0, jnp.finfo(jnp.float32).eps, L3 - L1)


def ss_robust(y):
    """Robust 4-stat summary (Drovandi & Pettitt 2011); shape
    (batch, 4, dim)."""
    L1, L2, L3 = _percentiles(y, [25., 50., 75.])
    E1, E3, E5, E7 = _percentiles(y, [12.5, 37.5, 62.5, 87.5])
    B = _ss_B(y)
    ss_A = L2
    ss_g = (L3 + L1 - 2 * L2) / B
    ss_k = (E7 - E5 + E3 - E1) / B
    return jnp.stack([ss_A, B, ss_g, ss_k], axis=1).reshape(
        y.shape[0], 4, -1)


def ss_octile(y):
    """Octile summary; shape (batch, 7, dim)."""
    octiles = jnp.linspace(12.5, 87.5, 7)
    E = _percentiles(y, octiles)  # (7, batch, dim)
    return jnp.moveaxis(E, 0, 1).reshape(y.shape[0], 7, -1)


def ss_octile_sq(y):
    """Octiles + their squares (14 features): a polynomial feature map in
    the LFIRE-paper spirit (its gaussian toy uses powers 0..9) for
    classifier-based ratio estimation — the linear-logistic log-ratio is
    then quadratic in the octiles.  A 2026-08-20 probe showed the plain
    octile log-ratio at the observed features is monotone in B and flat
    in k (saturating classifier), while this map at least sharpens A."""
    o = ss_octile(y).reshape(y.shape[0], -1)
    return jnp.concatenate([o, o * o], axis=1)


def get_model(n_obs=50, true_params=None, seed=None, seed_obs=None):
    """g-and-k inference model (reference ``gnk.py:72-114``)."""
    if true_params is None:
        true_params = [3, 1, 2, .5]
    m = elfi.Model(name="gnk")
    priors = [elfi.Prior("uniform", 0, 10, model=m, name=n)
              for n in ["A", "B", "g", "k"]]
    fn = partial(GNK, n_obs=n_obs)
    y_obs = np.asarray(fn(*[jnp.asarray([p], jnp.float32)
                            for p in true_params], batch_size=1,
                          key=jax.random.key(seed_obs or seed or 0)))[0]
    elfi.Simulator(fn, *priors, observed=y_obs, model=m, name="GNK")
    ss = elfi.Summary(ss_order, m["GNK"], model=m, name="ss_order")
    elfi.Discrepancy(euclidean_multiss, ss, model=m, name="d")
    return m
