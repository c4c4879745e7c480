"""KLIEP-style density ratio estimation (reference
``elfi/methods/density_ratio_estimation.py``).

The reference evaluates its RBF bases with nested Python loops; here the
kernel matrices and the projected-gradient KLIEP iterations are vectorised
JAX (``lax.fori_loop`` on device), which is what makes the adaptive
threshold SMC's per-round fit negligible next to simulation time."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

__all__ = ["DensityRatioEstimation", "calculate_densratio_basis_sigma"]


def calculate_densratio_basis_sigma(sigma_1, sigma_2):
    """Heuristic basis scale (reference ``density_ratio_estimation.py:11-28``)."""
    return sigma_1 * sigma_2 / np.sqrt(np.abs(sigma_1 ** 2 - sigma_2 ** 2))


def _rbf_matrix(x, centers, sigma):
    """K[i, j] = exp(-||x_i - c_j||^2 / (2 sigma^2))."""
    x = jnp.atleast_2d(x)
    d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return jnp.exp(-0.5 * d2 / (sigma * sigma))


@partial(jax.jit, static_argnames=("max_iter", "conv_check_interval"))
def _kliep_solve(A, b, b_normalized, weights_x, A_self, epsilon, abs_tol,
                 max_iter, conv_check_interval):
    """Projected gradient ascent for KLIEP weights (reference
    ``density_ratio_estimation.py:183-202``), as a fixed-shape device loop."""
    n = A.shape[1]
    alpha0 = jnp.ones(n) / n
    wsum0 = A_self @ alpha0

    nonnull = jnp.any(A > 1e-64, axis=1)
    w_eff = jnp.where(nonnull, weights_x, 0.0)

    def body(state):
        i, alpha, prev, _ = state
        denom = A @ alpha
        grad = A.T @ jnp.where(nonnull, w_eff / jnp.maximum(denom, 1e-300), 0.0)
        alpha = alpha + epsilon * grad
        alpha = jnp.maximum(0.0, alpha + (1.0 - b @ alpha) * b_normalized)
        alpha = alpha / (b @ alpha)
        check = (i % conv_check_interval) == 0
        cur = A_self @ alpha
        diff = jnp.linalg.norm(cur - prev)
        done = check & (diff < abs_tol)
        prev = jnp.where(check, cur, prev)
        return i + 1, alpha, prev, done

    def cond(state):
        i, _, _, done = state
        return (i < max_iter) & (~done)

    _, alpha, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), alpha0, wsum0, jnp.bool_(False)))
    return alpha


class DensityRatioEstimation:
    """RBF-basis density ratio estimator w(x) ~ p_x(x)/p_y(x)."""

    def __init__(self, n=100, epsilon=0.1, max_iter=500, abs_tol=0.01,
                 conv_check_interval=20, fold=5, optimize=False):
        self.n = n
        self.epsilon = epsilon
        self.max_iter = max_iter
        self.abs_tol = abs_tol
        self.conv_check_interval = conv_check_interval
        self.fold = fold
        self.sigma = None
        self.optimize = optimize

    def fit(self, x, y, weights_x=None, weights_y=None, sigma=None):
        x = np.asarray(x, np.float64).reshape(len(x), -1)
        y = np.asarray(y, np.float64).reshape(len(y), -1)
        self.x = x
        if len(x) < self.n:
            raise ValueError(
                f"Number of RBFs ({self.n}) can't be larger than number of "
                f"samples ({len(x)})")
        self.theta = x[:self.n]
        weights_x = np.ones(len(x)) if weights_x is None \
            else np.asarray(weights_x, np.float64)
        weights_y = np.ones(len(y)) if weights_y is None \
            else np.asarray(weights_y, np.float64)
        self.weights_x = weights_x / weights_x.sum()
        self.weights_y = weights_y / weights_y.sum()

        if isinstance(sigma, float):
            self.sigma = sigma
            self.optimize = False
        if self.optimize:
            if not isinstance(sigma, list):
                raise ValueError("To optimize RBF scale provide a list of "
                                 "candidate scales")
            scores = [self._lcv_score(x, y, s) for s in sigma]
            self.sigma = sigma[int(np.argmax(scores))]
        if self.sigma is None:
            raise ValueError("RBF width (sigma) must be provided on the "
                             "first call")

        alpha = self._solve(x, y, self.weights_x, self.sigma)
        self._alpha = np.asarray(alpha)

    def _solve(self, x, y, weights_x, sigma):
        centers = jnp.asarray(self.theta)
        A = _rbf_matrix(jnp.asarray(x), centers, sigma)
        B = _rbf_matrix(jnp.asarray(y), centers, sigma)
        b = (self.weights_y @ np.asarray(B))
        b = jnp.asarray(b)
        b_normalized = b / (b @ b)
        A_self = _rbf_matrix(jnp.asarray(self.x), centers, sigma)
        return _kliep_solve(A, b, b_normalized, jnp.asarray(weights_x),
                            A_self, self.epsilon, self.abs_tol,
                            self.max_iter, self.conv_check_interval)

    def _lcv_score(self, x, y, sigma):
        """Likelihood cross-validation score over folds (reference
        ``density_ratio_estimation.py:157-181``)."""
        idx = np.arange(len(x))
        folds = np.array_split(idx, self.fold)
        scores = []
        for f in folds:
            keep = np.setdiff1d(idx, f)
            alpha = np.asarray(self._solve(x[keep], y,
                                           self.weights_x[keep], sigma))
            vals = np.asarray(_rbf_matrix(jnp.asarray(x[f]),
                                          jnp.asarray(self.theta),
                                          sigma)) @ alpha
            vals = np.maximum(vals, 1e-300)
            scores.append(np.average(np.log(vals), weights=self.weights_x[f]))
        return float(np.mean(scores))

    def w(self, x):
        """Estimated density ratio at x."""
        vals = np.asarray(_rbf_matrix(jnp.asarray(
            np.asarray(x, np.float64).reshape(len(np.atleast_2d(x)), -1)),
            jnp.asarray(self.theta), self.sigma)) @ self._alpha
        return vals

    def max_ratio(self):
        return float(np.max(self.w(self.x)))
