"""Ratio-estimation classifiers for BOLFIRE (reference
``elfi/methods/classifier.py``).

``LogisticRegression`` wraps scikit-learn (as the reference does);
``GPClassifier`` replaces the reference's GPy ``GPClassification`` with a
from-scratch JAX Laplace-approximation GP binary classifier (logistic link,
Newton mode finding, probit-approximated predictive probabilities)."""

from __future__ import annotations

import abc

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Classifier", "LogisticRegression", "GPClassifier"]


class Classifier(abc.ABC):
    """Ratio-estimation classifier interface."""

    @abc.abstractmethod
    def __init__(self):
        raise NotImplementedError

    @abc.abstractmethod
    def fit(self, X, y):
        raise NotImplementedError

    @abc.abstractmethod
    def predict_log_likelihood_ratio(self, X):
        raise NotImplementedError

    def predict_likelihood_ratio(self, X):
        return np.exp(self.predict_log_likelihood_ratio(X))

    @property
    @abc.abstractmethod
    def attributes(self):
        raise NotImplementedError


class LogisticRegression(Classifier):
    """L1-penalized logistic regression with feature standardisation
    (reference ``classifier.py:72-123``)."""

    def __init__(self, config=None, class_min=0):
        from sklearn.linear_model import LogisticRegression as LogReg
        from sklearn.preprocessing import StandardScaler
        self.config = config if isinstance(config, dict) else \
            {"solver": "liblinear", "l1_ratio": 1.0}
        if not isinstance(class_min, (int, float)):
            raise TypeError("class_min has to be a non-negative number")
        self.class_min = class_min
        self.model = LogReg(**self.config)
        self.scaler = StandardScaler()

    def fit(self, X, y):
        Xs = self.scaler.fit_transform(X)
        self.model.fit(Xs, y)

    def predict_log_likelihood_ratio(self, X):
        Xs = self.scaler.transform(X)
        p = np.maximum(self.model.predict_proba(Xs)[:, 1], self.class_min)
        return np.log(p / (1 - p))

    @property
    def attributes(self):
        return {"parameters": {
            "coef_": self.model.coef_.tolist(),
            "intercept_": self.model.intercept_.tolist(),
            "n_iter": self.model.n_iter_.tolist()}}


def logreg_fit_core(X, y, n_newton=25, C=1.0):
    """Traceable L2-penalized logistic regression on standardized
    features — the device equivalent of :class:`LogisticRegression`'s
    default sklearn configuration for BOLFIRE's fused fit.

    Matches the liblinear formulation ``min 0.5 v'v + C sum
    log(1+exp(-y_i v.x_i))`` with C=1 on StandardScaler-transformed
    features and the intercept REGULARIZED (liblinear appends the
    intercept as a unit feature inside the penalty).  Damped Newton on
    the (f+1)-dim system with a vectorized backtracking line search:
    H >= I makes every Newton direction a descent direction, but the
    FULL step diverges on badly-scaled real features — gnk's squared
    octiles span 11 orders of magnitude, and the undamped iteration was
    measured (2026-08-20, float64 too, so algorithmic not precision) to
    blow the log-ratio up to |z| ~ 2500 vs sklearn's 1.6, poisoning the
    BOLFIRE GP surface.  With damping the iterate matches the true
    optimum (same converged loss as scipy BFGS) and sklearn's log-ratios
    track to ~0.1 in the overlapping-classes regime
    (coefficient-parity unit test in tests/functional/test_bolfire.py).

    Returns ``(w, b, mu, sd)``: coefficients/intercept in STANDARDIZED
    space plus the feature means/scales, so the log-ratio at a query
    point x is ``((x - mu) / sd) @ w + b`` (equal to sklearn's decision
    function, i.e. ``log p/(1-p)`` with ``class_min=0``).
    """
    X = X.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu = jnp.mean(X, axis=0)
    sd = jnp.sqrt(jnp.var(X, axis=0))
    sd = jnp.where(sd > 0, sd, 1.0)          # sklearn: constant cols -> 1
    Xs = (X - mu) / sd
    n, f = X.shape
    Xt = jnp.concatenate([Xs, jnp.ones((n, 1), jnp.float32)], axis=1)
    eye = jnp.eye(f + 1, dtype=jnp.float32)
    ts = 0.5 ** jnp.arange(20, dtype=jnp.float32)    # 1, 1/2, ... 2^-19

    def body(_, v):
        z0 = Xt @ v
        m = y * z0
        g = v + C * (Xt.T @ (-y * jax.nn.sigmoid(-m)))
        W = jax.nn.sigmoid(m) * jax.nn.sigmoid(-m)
        H = eye + C * (Xt.T @ (W[:, None] * Xt))
        step = jnp.linalg.solve(H, g)
        zs = Xt @ step

        def loss_at(t):
            vt = v - t * step
            mt = y * (z0 - t * zs)
            return (0.5 * jnp.sum(vt * vt)
                    + C * jnp.sum(jnp.logaddexp(0.0, -mt)))

        l0 = loss_at(jnp.float32(0.0))
        ls = jax.vmap(loss_at)(ts)
        ok = ls < l0
        t = jnp.where(jnp.any(ok), ts[jnp.argmax(ok)], 0.0)
        return v - t * step

    v = jax.lax.fori_loop(0, n_newton, body, jnp.zeros(f + 1, jnp.float32))
    return v[:f], v[f], mu, sd


@jax.jit
def _laplace_mode(K, y01, n_newton=20):
    """Newton iterations for the Laplace-approximation latent mode
    (logistic likelihood; Rasmussen & Williams Alg. 3.1)."""
    n = K.shape[0]

    def body(_, f):
        pi = jax.nn.sigmoid(f)
        W = pi * (1 - pi)
        sW = jnp.sqrt(W)
        B = jnp.eye(n) + sW[:, None] * K * sW[None, :]
        L = jnp.linalg.cholesky(B)
        b = W * f + (y01 - pi)
        a = b - sW * jax.scipy.linalg.cho_solve(
            (L, True), sW * (K @ b))
        return K @ a

    f = jax.lax.fori_loop(0, n_newton, body, jnp.zeros(n))
    pi = jax.nn.sigmoid(f)
    W = pi * (1 - pi)
    sW = jnp.sqrt(W)
    B = jnp.eye(n) + sW[:, None] * K * sW[None, :]
    L = jnp.linalg.cholesky(B)
    return f, pi, sW, L


@jax.jit
def _laplace_predict(Kxs, Kss_diag, f, pi, sW, L, y01):
    """Predictive class-1 probability via the probit approximation."""
    mu = Kxs.T @ (y01 - pi)
    v = jax.scipy.linalg.solve_triangular(L, sW[:, None] * Kxs, lower=True)
    var = jnp.maximum(Kss_diag - jnp.sum(v * v, axis=0), 1e-10)
    # MacKay's probit approximation of the logistic-Gaussian integral
    kappa = 1.0 / jnp.sqrt(1.0 + jnp.pi * var / 8.0)
    return jax.nn.sigmoid(kappa * mu)


class GPClassifier(Classifier):
    """Laplace-approximation GP binary classifier (replaces GPy's
    ``GPClassification``, reference ``classifier.py:126-189``).

    ARD RBF kernel with median-heuristic lengthscales; labels in {-1, +1}
    or {0, 1}.
    """

    def __init__(self, kernel=None, mean_function=None, class_min=0,
                 signal_var=1.0):
        self.class_min = class_min
        self.signal_var = signal_var
        self._fit = None

    @staticmethod
    def _median_lengthscales(X):
        n = min(len(X), 300)
        sub = X[:n]
        d2 = np.abs(sub[:, None, :] - sub[None, :, :])
        med = np.median(d2[np.triu_indices(n, 1)], axis=0)
        return np.maximum(med, 1e-3)

    def _kern(self, A, B):
        ls = self._ls
        d2 = np.sum(((A[:, None, :] - B[None, :, :]) / ls) ** 2, axis=-1)
        return self.signal_var * np.exp(-0.5 * d2)

    def fit(self, X, y):
        X = np.asarray(X, np.float64)
        y01 = (np.asarray(y) > 0).astype(np.float64)
        self._ls = self._median_lengthscales(X)
        K = self._kern(X, X) + 1e-6 * np.eye(len(X))
        f, pi, sW, L = _laplace_mode(jnp.asarray(K, jnp.float32),
                                     jnp.asarray(y01, jnp.float32))
        self._fit = (X, np.asarray(y01), f, pi, sW, L)

    def predict_proba(self, X):
        Xtr, y01, f, pi, sW, L = self._fit
        Kxs = self._kern(Xtr, np.asarray(X, np.float64))
        Kss = np.full(len(X), self.signal_var)
        p1 = np.asarray(_laplace_predict(
            jnp.asarray(Kxs, jnp.float32), jnp.asarray(Kss, jnp.float32),
            f, pi, sW, L, jnp.asarray(y01, jnp.float32)))
        return np.column_stack([1 - p1, p1])

    def predict_log_likelihood_ratio(self, X):
        p = np.maximum(self.predict_proba(X)[:, 1], self.class_min)
        return np.log(p / (1 - p))

    @property
    def attributes(self):
        return {"parameters": {"lengthscales": self._ls.tolist(),
                               "signal_var": self.signal_var}}
