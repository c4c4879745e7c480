"""Optimization helpers for Bayesian optimization (reference
``elfi/methods/bo/utils.py``)."""

from __future__ import annotations

import numpy as np
import scipy.optimize
from scipy.optimize import differential_evolution

__all__ = ["stochastic_optimization", "minimize", "CostFunction"]


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
    """Additive acquisition cost (reference ``bo/utils.py:114-164``)."""

    def __init__(self, function, gradient, scale=1):
        self.function = function
        self.gradient = gradient
        self.scale = scale

    def evaluate(self, x):
        x = np.atleast_2d(x)
        n, _ = x.shape
        return self.scale * np.asarray(self.function(x)).reshape(n, 1)

    def evaluate_gradient(self, x):
        x = np.atleast_2d(x)
        n, input_dim = x.shape
        return self.scale * np.asarray(self.gradient(x)).reshape(n, input_dim)
