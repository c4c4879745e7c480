"""Stochastic Lorenz-96 model with parametrised closure (Wilks 2005,
Hakkarainen et al. 2012; reference ``elfi/examples/lorenz.py``).

The RK4 time stepping runs as a ``lax.scan``: the full (batch, timestep,
site) trajectory is one fused XLA program."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["forecast_lorenz", "get_model", "mean", "var", "cov", "xcov",
           "autocov"]

# default initial state of Hakkarainen et al. (2012), 40 sites
_DEFAULT_INITIAL_STATE = np.array([
    2.40711741e-01, 4.75597337e+00, 1.19145654e+01, 1.31324866e+00,
    2.82675744e+00, 3.96016971e+00, 2.10479504e+00, 5.47742826e+00,
    5.42519447e+00, -1.45166074e+00, 2.01991521e+00, 3.93873313e+00,
    8.22837848e+00, 4.89401702e+00, -5.66278973e+00, 1.58617220e+00,
    -1.23849251e+00, -6.04649288e-01, 6.04132264e+00, 7.47588536e+00,
    1.82761402e+00, 3.19209639e+00, -7.58539653e-02, -6.00928508e-03,
    4.52902964e-01, 3.22063602e+00, 7.18613523e+00, 2.39210634e+00,
    -2.65743666e+00, 2.32046235e-01, 1.28079141e+00, 4.23344286e+00,
    6.94213238e+00, -1.15939497e+00, -5.23037351e-01, 1.54618811e+00,
    1.77863869e+00, 3.30139201e+00, 7.47769309e+00, -3.91312909e-01])


def _lorenz_ode(y, eta, theta1, theta2, f):
    """Lorenz-96 advection with linear closure g = theta1 + theta2 * y;
    periodic neighbours via jnp.roll (cleaner than index slicing)."""
    adv = -jnp.roll(y, 2, axis=1) * jnp.roll(y, 1, axis=1) \
        + jnp.roll(y, 1, axis=1) * jnp.roll(y, -1, axis=1)
    g = theta1 + y * theta2
    return adv - y + f - g + eta


def _rk4(y, time_step, eta, theta1, theta2, f):
    ode = partial(_lorenz_ode, eta=eta, theta1=theta1, theta2=theta2, f=f)
    k1 = time_step * ode(y)
    k2 = time_step * ode(y + k1 / 2)
    k3 = time_step * ode(y + k2 / 2)
    k4 = time_step * ode(y + k3)
    return y + (k1 + 2 * k2 + 2 * k3 + k4) / 6


def forecast_lorenz(theta1=None, theta2=None, f=10., phi=0.984, n_obs=40,
                    n_timestep=160, batch_size=1, initial_state=None,
                    key=None, total_duration=4):
    """Simulate the stochastic Lorenz-96 trajectory;
    (batch, n_timestep, n_obs)."""
    if initial_state is None:
        initial_state = _DEFAULT_INITIAL_STATE[:n_obs]
    y0 = jnp.broadcast_to(jnp.asarray(initial_state, jnp.float32),
                          (batch_size, n_obs))
    theta1 = jnp.asarray(theta1, jnp.float32).reshape(-1, 1)
    theta2 = jnp.asarray(theta2, jnp.float32).reshape(-1, 1)
    time_step = total_duration / n_timestep
    es = jax.random.normal(key, (n_timestep - 1, batch_size, n_obs))

    def step(carry, e):
        y, eta = carry
        eta = phi * eta + e * jnp.sqrt(1 - phi ** 2)
        y = _rk4(y, time_step, eta, theta1, theta2, f)
        return (y, eta), y

    (_, _), ys = jax.lax.scan(step, (y0, jnp.zeros_like(y0)), es)
    return jnp.concatenate([y0[:, None, :], jnp.swapaxes(ys, 0, 1)], axis=1)


def mean(x):
    return jnp.mean(x, axis=(1, 2))


def var(x):
    return jnp.mean(jnp.var(x, axis=1), axis=1)


def cov(x):
    x_next = jnp.roll(x, -1, axis=2)
    return jnp.mean(jnp.mean(
        (x - jnp.mean(x, keepdims=True, axis=1))
        * (x_next - jnp.mean(x_next, keepdims=True, axis=1)), axis=1),
        axis=1)


def xcov(x, prev=True):
    x_lag = jnp.roll(x, 1 if prev else -1, axis=2)
    return jnp.mean(
        (x[:, :-1, :] - jnp.mean(x[:, :-1, :], keepdims=True, axis=1))
        * (x_lag[:, 1:, :] - jnp.mean(x_lag[:, 1:, :], keepdims=True,
                                      axis=1)), axis=(1, 2))


def autocov(x):
    return jnp.mean(
        (x[:, :-1, :] - jnp.mean(x[:, :-1, :], keepdims=True, axis=1))
        * (x[:, 1:, :] - jnp.mean(x[:, 1:, :], keepdims=True, axis=1)),
        axis=(1, 2))


def get_model(true_params=None, seed_obs=None, initial_state=None, n_obs=40,
              f=10., phi=0.984, total_duration=4, n_timestep=160):
    """Lorenz-96 closure-parameter inference model (reference
    ``lorenz.py:156-220``)."""
    simulator = partial(forecast_lorenz, initial_state=initial_state, f=f,
                        n_obs=n_obs, phi=phi, total_duration=total_duration,
                        n_timestep=n_timestep)
    if not true_params:
        true_params = [2.0, 0.1]
    m = elfi.Model(name="lorenz")
    y_obs = np.asarray(simulator(
        jnp.asarray([true_params[0]], jnp.float32),
        jnp.asarray([true_params[1]], jnp.float32), batch_size=1,
        key=jax.random.key(seed_obs or 0)))[0]
    elfi.Prior("uniform", 0.5, 3., model=m, name="theta1")
    elfi.Prior("uniform", 0, 0.3, model=m, name="theta2")
    elfi.Simulator(simulator, m["theta1"], m["theta2"], observed=y_obs,
                   model=m, name="Lorenz")
    ss = [elfi.Summary(mean, m["Lorenz"], model=m, name="Mean"),
          elfi.Summary(var, m["Lorenz"], model=m, name="Var"),
          elfi.Summary(autocov, m["Lorenz"], model=m, name="Autocov"),
          elfi.Summary(cov, m["Lorenz"], model=m, name="Cov"),
          elfi.Summary(partial(xcov, prev=True), m["Lorenz"], model=m,
                       name="CrosscovPrev"),
          elfi.Summary(partial(xcov, prev=False), m["Lorenz"], model=m,
                       name="CrosscovNext")]
    elfi.Distance("euclidean", *ss, model=m, name="d")
    return m
