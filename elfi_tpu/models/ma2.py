"""Moving-average(2) example model — the canonical ABC benchmark
(reference ``elfi/examples/ma2.py``), written as pure JAX so the whole
prior -> simulator -> summaries -> distance graph fuses into one XLA
program.  The simulator is a single white-noise draw plus two shifted
scaled adds — bandwidth-bound on TPU, which is exactly what the fused
rejection path exploits."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["MA2", "autocov", "get_model", "CustomPrior1", "CustomPrior2"]


def MA2(t1, t2, n_obs=100, batch_size=1, key=None):
    r"""x_i = w_i + t1 w_{i-1} + t2 w_{i-2}, w ~ N(0,1) i.i.d.

    Batched: ``t1``/``t2`` are (batch,) arrays; returns (batch, n_obs).
    """
    t1 = jnp.asarray(t1).reshape(-1, 1)
    t2 = jnp.asarray(t2).reshape(-1, 1)
    w = jax.random.normal(key, (batch_size, n_obs + 2))
    return w[:, 2:] + t1 * w[:, 1:-1] + t2 * w[:, :-2]


def autocov(x, lag=1):
    """Autocovariance at ``lag`` assuming zero-mean stationarity; rows are
    realizations (reference ``ma2.py:41-60``)."""
    x = jnp.atleast_2d(x)
    return jnp.mean(x[:, lag:] * x[:, :-lag], axis=1)


class CustomPrior1(elfi.Distribution):
    """Triangular prior for t1 on [-b, b] (Marin et al. 2012)."""

    @classmethod
    def rvs(cls, b, size=1, key=None):
        u = jax.random.uniform(key, (size,))
        return jnp.where(u < 0.5,
                         jnp.sqrt(2. * u) * b - b,
                         -jnp.sqrt(2. * (1. - u)) * b + b)

    @classmethod
    def pdf(cls, x, b):
        p = 1. / b - jnp.abs(x) / (b * b)
        return jnp.where(p < 0., 0., p)


class CustomPrior2(elfi.Distribution):
    """Prior for t2 | t1 on a triangle (Marin et al. 2012)."""

    @classmethod
    def rvs(cls, t1, a, size=1, key=None):
        locs = jnp.maximum(-a - t1, -a + t1)
        scales = a - locs
        u = jax.random.uniform(key, jnp.broadcast_shapes((size,),
                                                         jnp.shape(t1)))
        return locs + scales * u

    @classmethod
    def pdf(cls, x, t1, a):
        locs = jnp.maximum(-a - t1, -a + t1)
        scales = a - locs
        return ((x >= locs) * (x <= locs + scales)
                * 1.0 / jnp.where(scales > 0, scales, 1))


def get_model(n_obs=100, true_params=None, seed_obs=None):
    """Complete MA2 inference model (reference ``ma2.py:63-94``)."""
    if true_params is None:
        true_params = [.6, .2]
    y = np.asarray(MA2(jnp.asarray([true_params[0]]),
                       jnp.asarray([true_params[1]]), n_obs=n_obs,
                       batch_size=1,
                       key=jax.random.key(seed_obs or 0)))[0]
    sim_fn = partial(MA2, n_obs=n_obs)

    m = elfi.Model(name="MA2_model")
    elfi.Prior(CustomPrior1, 2, model=m, name="t1")
    elfi.Prior(CustomPrior2, m["t1"], 1, model=m, name="t2")
    elfi.Simulator(sim_fn, m["t1"], m["t2"], observed=y, model=m, name="MA2")
    elfi.Summary(autocov, m["MA2"], model=m, name="S1")
    elfi.Summary(partial(autocov, lag=2), m["MA2"], model=m, name="S2")
    elfi.Distance("euclidean", m["S1"], m["S2"], model=m, name="d")
    return m
