"""Fowler's toads movement model (Marchand et al. 2017; reference
``elfi/examples/toad.py``) — the canonical BSL demo.

Layout divergence (documented): this framework is batch-first, so the
simulator returns ``(batch, n_days, n_toads)`` instead of the reference's
``(n_days, n_toads, batch)``; the summaries are adapted accordingly."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from ..ops.distributions import levy_stable

__all__ = ["toad", "compute_summaries", "obs_mat_to_deltax", "get_model"]


def toad(alpha, gamma, p0, n_toads=66, n_days=63, batch_size=1, key=None):
    """Levy-flight foraging with probabilistic return to previous refuges;
    (batch, n_days, n_toads).

    Each day a toad either returns to a uniformly chosen previous site
    (prob p0) or takes an alpha-stable step; the day recursion is a scan
    carrying the full site history (needed for the random-refuge gather).
    """
    alpha = jnp.asarray(alpha, jnp.float32).reshape(-1, 1)
    gamma = jnp.asarray(gamma, jnp.float32).reshape(-1, 1)
    p0 = jnp.asarray(p0, jnp.float32).reshape(-1, 1)

    X0 = jnp.zeros((batch_size, n_days, n_toads))
    keys = jax.random.split(key, n_days)

    def day(carry, inp):
        X, i = carry
        k = inp
        k1, k2, k3 = jax.random.split(k, 3)
        ret = jax.random.uniform(k1, (batch_size, n_toads)) < p0
        step = levy_stable.rvs(alpha, 0.0, 0.0, gamma,
                               size=(batch_size, n_toads), key=k2)
        # previous day position
        prev = jnp.squeeze(jnp.take_along_axis(
            X, jnp.broadcast_to(jnp.maximum(i - 1, 0)[None, None, None],
                                (batch_size, 1, n_toads)).astype(jnp.int32),
            axis=1), 1)
        moved = prev + step
        # uniformly chosen previous refuge day in [0, i)
        ref_day = jax.random.randint(k3, (batch_size, n_toads), 0,
                                     jnp.maximum(i, 1))
        refuge = jnp.squeeze(jnp.take_along_axis(
            X, ref_day[:, None, :], axis=1), 1)
        x_new = jnp.where(ret, refuge, moved)
        X = jax.lax.dynamic_update_slice_in_dim(
            X, x_new[:, None, :], i, axis=1)
        return (X, i + 1), None

    (X, _), _ = jax.lax.scan(day, (X0, jnp.int32(1)), keys[1:])
    return X


def obs_mat_to_deltax(X, lag):
    """Displacements over ``lag`` days; (batch, n_toads*(n_days-lag))."""
    d = X[:, lag:, :] - X[:, :-lag, :]
    return d.reshape(d.shape[0], -1)


def compute_summaries(X, lag, p=np.linspace(0, 1, 11), thd=10):
    """Per-lag displacement summaries: returned-count, median and log
    quantile-differences of non-returned displacements; (batch, len(p)+1)
    (reference ``toad.py:compute_summaries``)."""
    disp = obs_mat_to_deltax(X, lag)
    abs_disp = jnp.abs(disp)
    ret = abs_disp < thd
    num_ret = jnp.sum(ret, axis=1)
    masked = jnp.where(ret, jnp.nan, abs_disp)
    noret_median = jnp.nanmedian(masked, axis=1)
    qs = jnp.nanquantile(masked, jnp.asarray(p), axis=1)  # (len(p), batch)
    logdiff = jnp.log(jnp.maximum(jnp.diff(qs, axis=0), jnp.exp(-20.0)))
    ssx = jnp.concatenate([num_ret[None, :].astype(jnp.float32),
                           noret_median[None, :], logdiff], axis=0)
    return jnp.nan_to_num(ssx, nan=jnp.inf).T


def get_model(true_params=None, seed_obs=None, n_toads=66, n_days=63):
    """Toad movement inference model (reference ``toad.py:get_model``)."""
    if true_params is None:
        true_params = [1.7, 35.0, 0.6]
    m = elfi.Model(name="toad")
    sim_fn = partial(toad, n_toads=n_toads, n_days=n_days)
    y = np.asarray(sim_fn(*[jnp.asarray([pv], jnp.float32)
                            for pv in true_params], batch_size=1,
                          key=jax.random.key(seed_obs or 0)))[0]
    elfi.Prior("uniform", 1, 1, model=m, name="alpha")
    elfi.Prior("uniform", 0, 100, model=m, name="gamma")
    elfi.Prior("uniform", 0, 0.9, model=m, name="p0")
    elfi.Simulator(sim_fn, m["alpha"], m["gamma"], m["p0"], observed=y,
                   model=m, name="toad")
    ss = [elfi.Summary(partial(compute_summaries, lag=lag), m["toad"],
                       model=m, name=f"S{lag}") for lag in (1, 2, 4, 8)]
    elfi.Distance("euclidean", *ss, model=m, name="d")
    return m
