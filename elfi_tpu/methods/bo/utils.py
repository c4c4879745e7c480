"""Optimization helpers for Bayesian optimization (reference
``elfi/methods/bo/utils.py``).

In addition to the reference's host-side scipy multistart
(:func:`minimize`), this module provides :func:`minimize_traced`: ALL
restarts of a bounded Adam descent run as ONE jitted device program.  On a
remote-attached TPU every host<->device transfer costs tens of
milliseconds, so the acquisition optimizers, GP hyperparameter fits and
posterior-threshold searches all use this path — one dispatch and one
scalar transfer per optimization instead of hundreds."""

from __future__ import annotations

import numpy as np
import scipy.optimize
from scipy.optimize import differential_evolution

import jax
import jax.numpy as jnp

__all__ = ["stochastic_optimization", "minimize", "minimize_traced",
           "adam_minimize", "CostFunction"]


def adam_minimize(obj, x0, steps, lr, lo, hi):
    """Traceable bounded Adam descent tracking the best iterate;
    ``obj(theta) -> scalar`` must be traceable."""
    # one objective evaluation per step: value_and_grad shares the primal
    # between best-tracking and the gradient (the objectives here are GP
    # predicts / marginal likelihoods — a triangular solve or Cholesky
    # each, so halving evaluations matters inside the fused BO loops)
    value_and_grad = jax.value_and_grad(obj)
    # best-iterate tracking starts from x0, so an out-of-bounds start
    # (e.g. a perturbed hyperparameter restart below the log-noise floor)
    # could otherwise be RETURNED by a "bounded" minimizer
    x0 = jnp.clip(x0, lo, hi)

    def body(i, carry):
        x, m, v, best_x, best_f = carry
        f, g = value_and_grad(x)
        better = f < best_f
        best_x = jnp.where(better, x, best_x)
        best_f = jnp.where(better, f, best_f)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1 - 0.9 ** (i + 1.0))
        vh = v / (1 - 0.999 ** (i + 1.0))
        step_lr = lr * 0.5 ** (3.0 * i / steps)
        x = jnp.clip(x - step_lr * mh / (jnp.sqrt(vh) + 1e-8), lo, hi)
        return x, m, v, best_x, best_f

    x, _, _, best_x, best_f = jax.lax.fori_loop(
        0, steps, body, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), x0,
                         obj(x0)))
    f = obj(x)
    better = f < best_f
    return jnp.where(better, x, best_x), jnp.where(better, f, best_f)


_TRACED_CACHE = {}


def minimize_traced(fn, bounds, args=(), n_starts=10, steps=150, lr=None,
                    key=None, extra_starts=None):
    """Multi-start bounded minimization fully on device.

    ``fn(theta, *args) -> scalar`` must be a STABLE traceable function
    (module-level, not a per-call closure) so the compiled program is
    reused across calls; per-call data goes through ``args``.
    Returns (x_min (d,), f_min) as numpy.
    """
    bounds = np.asarray(bounds, np.float32)
    d = bounds.shape[0]
    lr = lr or float(np.max(bounds[:, 1] - bounds[:, 0]) / 10.0)
    n_extra = 0 if extra_starts is None else int(np.atleast_2d(
        extra_starts).shape[0])
    cache_key = (fn, d, n_starts, n_extra, steps)
    if cache_key not in _TRACED_CACHE:
        def run(key_, lo, hi, lr_, extra, *args_):
            starts = lo + (hi - lo) * jax.random.uniform(
                key_, (n_starts, d))
            if n_extra:
                starts = jnp.concatenate(
                    [starts, jnp.clip(extra, lo, hi)], axis=0)

            def one(x0):
                return adam_minimize(lambda t: fn(t, *args_), x0, steps,
                                     lr_, lo, hi)

            xs, fs = jax.vmap(one)(starts)
            fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
            i = jnp.argmin(fs)
            return xs[i], fs[i]

        _TRACED_CACHE[cache_key] = jax.jit(run)

    if key is None:
        key = jax.random.key(np.random.randint(2**31))
    extra = jnp.zeros((0, d)) if extra_starts is None else \
        jnp.atleast_2d(jnp.asarray(extra_starts, jnp.float32))
    x, f = _TRACED_CACHE[cache_key](
        key, jnp.asarray(bounds[:, 0]), jnp.asarray(bounds[:, 1]),
        jnp.float32(lr), extra, *args)
    return np.asarray(x), float(f)


def stochastic_optimization(fun, bounds, maxiter=1000, polish=True, seed=0):
    """Global minimum of ``fun`` by differential evolution (reference
    ``bo/utils.py:9-37``)."""

    def fun_1d(x):
        return np.asarray(fun(x)).ravel()

    result = differential_evolution(func=fun_1d, bounds=bounds,
                                    maxiter=maxiter, polish=polish,
                                    init="latinhypercube", seed=seed)
    return result.x, result.fun


def minimize(fun, bounds, method="L-BFGS-B", constraints=None, grad=None,
             prior=None, n_start_points=10, maxiter=1000, random_state=None,
             key=None):
    """Multi-start bounded minimization (reference ``bo/utils.py:40-111``).

    Start points are drawn from ``prior`` (clipped to bounds) or uniformly.
    ``fun``/``grad`` are host callables — in this framework they usually wrap
    jitted device programs, so each optimizer step is one device call.
    """
    ndim = len(bounds)
    start_points = np.empty((n_start_points, ndim))
    if prior is None:
        random_state = random_state or np.random
        for i in range(ndim):
            start_points[:, i] = random_state.uniform(*bounds[i],
                                                      n_start_points)
    else:
        start_points = np.atleast_2d(prior.rvs(size=n_start_points, key=key)
                                     if key is not None else
                                     prior.rvs(size=n_start_points,
                                               random_state=random_state))
        if start_points.ndim == 1:
            start_points = start_points[:, None]
        for i in range(ndim):
            start_points[:, i] = np.clip(start_points[:, i], *bounds[i])

    def as_floatfun(f):
        def wrapped(x):
            return np.asarray(f(x), np.float64).ravel()
        return wrapped

    fun_w = lambda x: float(np.asarray(fun(x)).ravel()[0])  # noqa: E731
    grad_w = as_floatfun(grad) if grad is not None else None

    locs, vals = [], np.empty(n_start_points)
    for i in range(n_start_points):
        result = scipy.optimize.minimize(fun_w, start_points[i],
                                         method=method, jac=grad_w,
                                         bounds=bounds,
                                         constraints=constraints,
                                         options={"maxiter": maxiter})
        locs.append(result["x"])
        vals[i] = result["fun"]

    ind_min = int(np.argmin(vals))
    loc = locs[ind_min]
    for i in range(ndim):
        loc[i] = np.clip(loc[i], *bounds[i])
    return loc, vals[ind_min]


class CostFunction:
    """Additive acquisition cost (reference ``bo/utils.py:114-164``).

    ``traceable`` (optional): a traceable ``theta (d,) -> scalar`` version
    of the cost, enabling the device-side acquisition optimizer."""

    def __init__(self, function, gradient, scale=1, traceable=None):
        self.function = function
        self.gradient = gradient
        self.scale = scale
        self.traceable = traceable

    def evaluate(self, x):
        x = np.atleast_2d(x)
        n, _ = x.shape
        return self.scale * np.asarray(self.function(x)).reshape(n, 1)

    def evaluate_gradient(self, x):
        x = np.atleast_2d(x)
        n, input_dim = x.shape
        return self.scale * np.asarray(self.gradient(x)).reshape(n, input_dim)
