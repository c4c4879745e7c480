"""Stochastic Lotka-Volterra model via the Gillespie direct method
(reference ``elfi/examples/lotka_volterra.py``).

TPU-native design: instead of recording an unbounded event trajectory and
interpolating afterwards (the reference grows numpy arrays inside a Python
loop), each batch member runs a bounded ``lax.while_loop`` that carries
only the current (time, stock) pair and fills the n_obs observation slots
on the fly as the simulated time crosses each output grid point; the whole
batch is vmapped."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from ..ops.distributions import Distribution

__all__ = ["lotka_volterra", "get_model", "ExpUniform", "stock_mean",
           "stock_log_variance", "stock_autocorr", "stock_crosscorr"]

_MAX_EVENTS = 30000


def _gillespie_single(key, r1, r2, r3, prey0, pred0, sigma, n_obs,
                      time_end):
    times_out = jnp.linspace(0.0, time_end, n_obs)
    stock0 = jnp.array([jnp.floor(prey0), jnp.floor(pred0)], jnp.float32)
    stoich = jnp.array([[1, 0], [-1, 1], [0, -1], [0, 0]], jnp.float32)
    obs0 = jnp.zeros((n_obs, 2))
    obs0 = obs0.at[0].set(stock0)

    def cond(state):
        t, stock, obs, next_idx, k, steps = state
        return (t < time_end) & (steps < _MAX_EVENTS) & (next_idx < n_obs)

    def body(state):
        t, stock, obs, next_idx, k, steps = state
        k, k1, k2 = jax.random.split(k, 3)
        hazards = jnp.array([r1 * stock[0], r2 * stock[0] * stock[1],
                             r3 * stock[1]])
        total = jnp.sum(hazards)
        alive = total > 0
        dt = jnp.where(alive, jax.random.exponential(k1)
                       / jnp.maximum(total, 1e-30), time_end + 1.0)
        t_new = t + dt
        u = jax.random.uniform(k2)
        cum = jnp.cumsum(hazards / jnp.maximum(total, 1e-30))[:2]
        reaction = jnp.where(alive, jnp.sum(u >= cum), 3)
        stock_new = stock + stoich[reaction]

        # fill all observation slots whose time falls in (t, t_new]
        def fill_cond(c):
            obs_c, idx = c
            return (idx < n_obs) & (times_out[jnp.minimum(idx, n_obs - 1)]
                                    <= t_new)

        def fill_body(c):
            obs_c, idx = c
            frac = jnp.where(dt > 0,
                             (times_out[jnp.minimum(idx, n_obs - 1)] - t)
                             / dt, 0.0)
            val = stock + (stock_new - stock) * frac
            obs_c = obs_c.at[jnp.minimum(idx, n_obs - 1)].set(val)
            return obs_c, idx + 1

        obs, next_idx = jax.lax.while_loop(fill_cond, fill_body,
                                           (obs, next_idx))
        # predators extinct -> trajectory is constant; finish the grid
        dead = stock_new[1] == 0

        def finish(c):
            obs_c, idx = c

            def fcond(cc):
                return cc[1] < n_obs

            def fbody(cc):
                o, i = cc
                return o.at[jnp.minimum(i, n_obs - 1)].set(stock_new), i + 1

            return jax.lax.while_loop(fcond, fbody, c)

        obs, next_idx = jax.lax.cond(dead, finish, lambda c: c,
                                     (obs, next_idx))
        t = jnp.where(dead, time_end, t_new)
        return t, stock_new, obs, next_idx, k, steps + 1

    state = (jnp.float32(0.0), stock0, obs0, jnp.int32(1), key,
             jnp.int32(0))
    _, _, obs, _, k, _ = jax.lax.while_loop(cond, body, state)
    noise = sigma * jax.random.normal(jax.random.fold_in(k, 99),
                                      (n_obs, 2))
    return obs + noise


def lotka_volterra(r1, r2, r3, prey_init=50, predator_init=100, sigma=0.,
                   n_obs=16, time_end=30., batch_size=1, key=None):
    """(batch, n_obs, 2) prey/predator observations at an even time grid."""
    def bcast(v):
        return jnp.broadcast_to(jnp.asarray(v, jnp.float32), (batch_size,))

    keys = jax.random.split(key, batch_size)
    sim = partial(_gillespie_single, n_obs=n_obs, time_end=time_end)
    return jax.vmap(sim)(keys, bcast(r1), bcast(r2), bcast(r3),
                         bcast(prey_init), bcast(predator_init),
                         bcast(sigma))


class ExpUniform(Distribution):
    """log x ~ Uniform(a, b) (reference ``lotka_volterra.py:280-326``)."""

    @classmethod
    def rvs(cls, a, b, size=1, key=None):
        u = a + (b - a) * jax.random.uniform(
            key, jnp.broadcast_shapes((size,), jnp.shape(a), jnp.shape(b)))
        return jnp.exp(u)

    @classmethod
    def pdf(cls, x, a, b):
        x = jnp.asarray(x)
        p = jnp.where((x < jnp.exp(a)) | (x > jnp.exp(b)), 0.0, 1.0 / x)
        return p / (b - a)


def stock_mean(stock, species=0, mu=0, std=1):
    return (jnp.mean(stock[:, :, species], axis=1) - mu) / std


def stock_log_variance(stock, species=0, mu=0, std=1):
    v = jnp.var(stock[:, :, species], axis=1, ddof=1)
    return (jnp.log(v + 1) - mu) / std


def stock_autocorr(stock, species=0, lag=1, mu=0, std=1):
    x = stock[:, :, species]
    n_obs = x.shape[1]
    mx = jnp.mean(x, axis=1, keepdims=True)
    sx = jnp.std(x, axis=1, ddof=1, keepdims=True)
    z = (x - mx) / sx
    C = jnp.sum(z[:, lag:] * z[:, :-lag], axis=1) / (n_obs - 1)
    return (C - mu) / std


def stock_crosscorr(stock, mu=0, std=1):
    n_obs = stock.shape[1]
    zp = (stock[:, :, 0] - jnp.mean(stock[:, :, 0], axis=1, keepdims=True)) \
        / jnp.std(stock[:, :, 0], axis=1, keepdims=True)
    zq = (stock[:, :, 1] - jnp.mean(stock[:, :, 1], axis=1, keepdims=True)) \
        / jnp.std(stock[:, :, 1], axis=1, keepdims=True)
    C = jnp.sum(zp * zq, axis=1) / (n_obs - 1)
    return (C - mu) / std


def get_model(n_obs=50, true_params=None, observation_noise=False,
              seed_obs=None, **kwargs):
    """Lotka-Volterra inference model (reference
    ``lotka_volterra.py:154-217``)."""
    if true_params is None:
        true_params = [1.0, 0.005, 0.6, 50, 100,
                       10. if observation_noise else 0.]
    kwargs["n_obs"] = n_obs
    sim_fn = partial(lotka_volterra, **kwargs)
    y_obs = np.asarray(sim_fn(*[jnp.asarray([p], jnp.float32)
                                for p in true_params], batch_size=1,
                              key=jax.random.key(seed_obs or 0)))[0]
    m = elfi.Model(name="lotka_volterra")
    priors = [elfi.Prior(ExpUniform, -6., 2., model=m, name="r1"),
              elfi.Prior(ExpUniform, -6., 2., model=m, name="r2"),
              elfi.Prior(ExpUniform, -6., 2., model=m, name="r3"),
              elfi.Prior("norm", 50, np.sqrt(50), model=m, name="prey0"),
              elfi.Prior("norm", 100, np.sqrt(100), model=m,
                         name="predator0")]
    if observation_noise:
        priors.append(elfi.Prior(ExpUniform, np.log(0.5), np.log(50),
                                 model=m, name="sigma"))
    elfi.Simulator(sim_fn, *priors, observed=y_obs, model=m, name="LV")
    ss = [elfi.Summary(partial(stock_mean, species=0), m["LV"], model=m,
                       name="prey_mean"),
          elfi.Summary(partial(stock_mean, species=1), m["LV"], model=m,
                       name="pred_mean"),
          elfi.Summary(partial(stock_log_variance, species=0), m["LV"],
                       model=m, name="prey_log_var"),
          elfi.Summary(partial(stock_log_variance, species=1), m["LV"],
                       model=m, name="pred_log_var"),
          elfi.Summary(partial(stock_autocorr, species=0, lag=1), m["LV"],
                       model=m, name="prey_autocorr_1"),
          elfi.Summary(partial(stock_autocorr, species=1, lag=1), m["LV"],
                       model=m, name="pred_autocorr_1"),
          elfi.Summary(partial(stock_autocorr, species=0, lag=2), m["LV"],
                       model=m, name="prey_autocorr_2"),
          elfi.Summary(partial(stock_autocorr, species=1, lag=2), m["LV"],
                       model=m, name="pred_autocorr_2"),
          elfi.Summary(stock_crosscorr, m["LV"], model=m,
                       name="crosscorr")]
    elfi.Distance("euclidean", *ss, model=m, name="d")
    return m
