"""Gaussian-process regression in pure JAX.

From-scratch replacement for the reference's GPy wrapper
(``elfi/methods/bo/gpy_regression.py:15-365``): the same model family —
RBF kernel + bias term, Gamma hyperpriors with mean==variance heuristics
(``gpy_regression.py:260-280``), noise var initialised to ``max(y)^2/100``
(``:255``) — but every computation is a jitted device program:

- Training inputs live in PADDED capacity buffers (power-of-two) with an
  active-row mask, so adding one evidence point per BO iteration does NOT
  trigger an XLA recompile; padding rows are masked out of the Cholesky
  exactly (unit diagonal, zero target).
- ``predict``/``predictive_gradients`` are jitted closures over the
  factorised posterior; the gradients come from autodiff, replacing the
  reference's hand-derived cached-RBF fast path (``:127-160,206-223``) —
  under jit the cache is unnecessary.
- Hyperparameter MAP fit = multi-restart L-BFGS-B over log-params with a
  jitted value-and-grad of (marginal likelihood + Gamma log-priors).
"""

from __future__ import annotations

import numpy as np
import scipy.optimize

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = ["GPRegression"]


def _pad_cap(n):
    cap = 16
    while cap < n:
        cap *= 2
    return cap


@jax.jit
def _kernel_mats(X, mask, params):
    """Masked (K + noise I) over the padded buffer; padding rows/cols are
    identity so the Cholesky is exact for the active block."""
    sigma2, ell, bias, noise = (params["sigma2"], params["ell"],
                                params["bias"], params["noise"])
    r2 = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    K = sigma2 * jnp.exp(-0.5 * r2 / (ell * ell)) + bias
    m2 = mask[:, None] * mask[None, :]
    K = K * m2
    diag = jnp.where(mask > 0, jnp.diag(K) + noise, 1.0)
    K = K.at[jnp.diag_indices_from(K)].set(diag)
    return K


@jax.jit
def _posterior_factor(X, y, mask, params):
    K = _kernel_mats(X, mask, params)
    L = jnp.linalg.cholesky(K)
    ym = y * mask
    alpha = jax.scipy.linalg.cho_solve((L, True), ym)
    return L, alpha * mask


@jax.jit
def _neg_log_posterior(log_params, X, y, mask, prior_shapes):
    params = {k: jnp.exp(v) for k, v in
              zip(("sigma2", "ell", "bias", "noise"), log_params)}
    K = _kernel_mats(X, mask, params)
    L = jnp.linalg.cholesky(K)
    ym = y * mask
    alpha = jax.scipy.linalg.cho_solve((L, True), ym)
    n_active = jnp.sum(mask)
    mll = (-0.5 * jnp.dot(ym, alpha)
           - jnp.sum(jnp.log(jnp.diag(L)))
           - 0.5 * n_active * jnp.log(2 * jnp.pi))
    # Gamma(shape=k, scale=1) log-priors on sigma2/ell/bias in log-space
    # (with the exp-transform Jacobian), mirroring GPy's from_EV(m, m)
    logprior = 0.0
    for i, k in enumerate(prior_shapes):
        u = log_params[i]
        logprior = logprior + jnp.where(
            k > 0, k * u - jnp.exp(u) - jsp.gammaln(k), 0.0)
    return -(mll + logprior)


_neg_log_posterior_grad = jax.jit(jax.value_and_grad(_neg_log_posterior))


def gp_cross_cov(A, B, params):
    """Traceable RBF+bias cross-covariance matrix k(A, B), (n, m)."""
    r2 = (jnp.sum(A ** 2, 1)[:, None] + jnp.sum(B ** 2, 1)[None, :]
          - 2.0 * A @ B.T)
    return (params["sigma2"] * jnp.exp(-0.5 * r2 / (params["ell"] ** 2))
            + params["bias"])


@jax.jit
def _predict(x, X, mask, L, alpha, params):
    sigma2, bias, noise = params["sigma2"], params["bias"], params["noise"]
    kx = gp_cross_cov(x, X, params) * mask[None, :]
    mu = kx @ alpha
    v = jax.scipy.linalg.solve_triangular(L, kx.T, lower=True)
    var = sigma2 + bias - jnp.sum(v * v, axis=0) + noise
    return mu, jnp.maximum(var, 1e-10)


@jax.jit
def _predict_noiseless(x, X, mask, L, alpha, params):
    mu, var = _predict(x, X, mask, L, alpha, params)
    return mu, jnp.maximum(var - params["noise"], 1e-10)


def _grad_fn(noiseless):
    pred = _predict_noiseless if noiseless else _predict

    def single(xi, X, mask, L, alpha, params):
        mu, var = pred(xi[None], X, mask, L, alpha, params)
        return mu[0], var[0]

    gmu = jax.grad(lambda xi, *a: single(xi, *a)[0])
    gvar = jax.grad(lambda xi, *a: single(xi, *a)[1])

    @jax.jit
    def grads(x, X, mask, L, alpha, params):
        return (jax.vmap(gmu, in_axes=(0, None, None, None, None, None))(
                    x, X, mask, L, alpha, params),
                jax.vmap(gvar, in_axes=(0, None, None, None, None, None))(
                    x, X, mask, L, alpha, params))

    return grads


_grads_noisy = _grad_fn(False)
_grads_noiseless = _grad_fn(True)


def gp_mean_obj(theta, X, mask, L, alpha, params):
    """Stable traceable objective: GP posterior mean at a single point
    (for device-side multistart minimization)."""
    mu, _ = _predict(theta[None], X, mask, L, alpha, params)
    return mu[0]


def gp_neg_lcb_obj(theta, X, mask, L, alpha, params, beta):
    """Stable traceable LCB objective mean - sqrt(beta * var)."""
    mu, var = _predict_noiseless(theta[None], X, mask, L, alpha, params)
    return mu[0] - jnp.sqrt(beta * var[0])


def log_noise_floor(y, mask=None):
    """Lower bound for the log noise variance: 1% of the active-data
    variance.  Full maximum-likelihood GPs on small BO evidence sets love
    to collapse the noise to ~0, which turns the BOLFI posterior
    Phi((h-mu)/sigma) into cliffs that stall NUTS; the reference never hits
    this because GPy's scg stops after 50 iterations."""
    if mask is None:
        var = jnp.var(y)
    else:
        n = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(y * mask) / n
        var = jnp.sum(mask * (y - mean) ** 2) / n
    return jnp.log(jnp.maximum(0.01 * var, 1e-8))


def optimize_restarts_core(starts, X, y, mask, prior_shapes, lr,
                           steps=250):
    """All hyperparameter restarts as one vmapped Adam descent; plain
    traceable so it can be embedded in fused BO loops."""
    from .utils import adam_minimize

    lo = jnp.full(4, -12.0).at[3].set(log_noise_floor(y, mask))

    def one(u0):
        return adam_minimize(
            lambda u: _neg_log_posterior(u, X, y, mask, prior_shapes),
            u0, steps, lr, lo, jnp.full(4, 12.0))

    us, fs = jax.vmap(one)(starts)
    fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
    i = jnp.argmin(fs)
    return us[i], fs[i]


_optimize_restarts = jax.jit(optimize_restarts_core)


class GPRegression:
    """Drop-in equivalent of the reference ``GPyRegression``."""

    def __init__(self, parameter_names=None, bounds=None, optimizer="adam",
                 max_opt_iters=50, gp=None, seed=0, **gp_params):
        if parameter_names is None:
            input_dim = 1
        elif isinstance(parameter_names, (list, tuple)):
            input_dim = len(parameter_names)
        else:
            raise ValueError("parameter_names must be a list of strings")
        if bounds is None:
            bounds = [(0, 1)] * input_dim
        elif isinstance(bounds, dict):
            bounds = [bounds[n] for n in (parameter_names or bounds.keys())]
        if len(bounds) != input_dim:
            raise ValueError("len(bounds) does not match input dimension")

        self.parameter_names = parameter_names
        self.input_dim = input_dim
        self.bounds = [tuple(b) for b in bounds]
        self.optimizer = optimizer
        self.max_opt_iters = max_opt_iters
        self.gp_params = gp_params
        self.seed = seed
        self.is_sampling = False  # API parity; no cache needed under jit

        self._x = None            # (n, d) numpy
        self._y = None            # (n,) numpy
        self.params = None        # dict of floats
        self._prior_shapes = np.zeros(4)
        self._factor = None       # (X_pad, mask, L, alpha)
        self._n_restarts = int(gp_params.pop("n_restarts", 4))

    # -- data -------------------------------------------------------------------
    @property
    def n_evidence(self):
        return 0 if self._x is None else len(self._x)

    @property
    def X(self):
        return None if self._x is None else self._x.copy()

    @property
    def Y(self):
        return None if self._y is None else self._y.reshape(-1, 1).copy()

    # alias used by some reference call sites
    @property
    def x(self):
        return self.X

    @property
    def y(self):
        return self.Y

    @property
    def noise(self):
        return self.params["noise"] if self.params else None

    def __str__(self):
        if self.params is None:
            return "GPRegression(unfitted)"
        p = {k: round(float(v), 5) for k, v in self.params.items()}
        return f"GPRegression(n={self.n_evidence}, {p})"

    __repr__ = __str__

    # -- fitting --------------------------------------------------------------------
    def _init_hyperparams(self):
        """Heuristic init + Gamma(mean=var) hyperpriors (reference
        ``gpy_regression.py:243-280``)."""
        y = self._y
        bmin = min(b[0] for b in self.bounds)
        bmax = max(b[1] for b in self.bounds)
        length_scale = (bmax - bmin) / 3.0
        kernel_var = (np.max(np.abs(y)) / 3.0) ** 2
        bias_var = kernel_var / 4.0
        noise_var = self.gp_params.get("noise_var") or \
            max(np.max(y) ** 2 / 100.0, 1e-6)
        self.params = dict(sigma2=float(max(kernel_var, 1e-6)),
                           ell=float(length_scale),
                           bias=float(max(bias_var, 1e-6)),
                           noise=float(noise_var))
        # Gamma shapes for from_EV(m, m) = shape m, scale 1 (no prior on
        # noise, as in GPy's default GPRegression)
        self._prior_shapes = np.array([kernel_var, length_scale, bias_var,
                                       0.0])

    def update(self, x, y, optimize=False):
        """Append evidence; refactorise the posterior (reference
        ``gpy_regression.py:286-315``)."""
        x = np.asarray(x, np.float64).reshape(-1, self.input_dim)
        y = np.asarray(y, np.float64).reshape(-1)
        if self._x is None:
            self._x, self._y = x, y
            self._init_hyperparams()
        else:
            self._x = np.vstack([self._x, x])
            self._y = np.concatenate([self._y, y])
        if optimize:
            self.optimize()
        else:
            self._refactor()

    def _padded(self):
        n = self.n_evidence
        cap = _pad_cap(n)
        Xp = np.zeros((cap, self.input_dim))
        Xp[:n] = self._x
        yp = np.zeros(cap)
        yp[:n] = self._y
        mask = np.zeros(cap)
        mask[:n] = 1.0
        return (jnp.asarray(Xp), jnp.asarray(yp), jnp.asarray(mask))

    def _refactor(self):
        Xp, yp, mask = self._padded()
        params = {k: jnp.asarray(v, jnp.float32)
                  for k, v in self.params.items()}
        L, alpha = _posterior_factor(Xp.astype(jnp.float32),
                                     yp.astype(jnp.float32),
                                     mask.astype(jnp.float32), params)
        self._factor = (Xp.astype(jnp.float32), mask.astype(jnp.float32),
                        L, alpha, params)

    def optimize(self):
        """MAP hyperparameters by multi-restart descent over log-params
        (replaces GPy scg, ``gpy_regression.py:317-323``).

        Default 'adam': ALL restarts run as one vmapped jitted device
        program (one dispatch, one transfer).  'lbfgsb' keeps the scipy
        host path with jitted value+grad calls."""
        if self.optimizer not in ("lbfgsb", "lbfgs", "scg", "scipy"):
            return self._optimize_adam()
        Xp, yp, mask = self._padded()
        Xp = Xp.astype(jnp.float32)
        yp = yp.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        shapes = jnp.asarray(self._prior_shapes, jnp.float32)

        def obj(u):
            val, grad = _neg_log_posterior_grad(
                jnp.asarray(u, jnp.float32), Xp, yp, mask, shapes)
            val = float(val)
            grad = np.asarray(grad, np.float64)
            if not np.isfinite(val):
                return 1e10, np.zeros_like(grad)
            return val, grad

        u0 = np.log(np.asarray([self.params["sigma2"], self.params["ell"],
                                self.params["bias"], self.params["noise"]]))
        noise_floor = float(np.log(max(0.01 * np.var(self._y), 1e-8)))
        opt_bounds = [(-12, 12)] * 3 + [(noise_floor, 12)]
        rng = np.random.RandomState(self.seed + self.n_evidence)
        starts = [u0] + [u0 + rng.normal(0, 1.0, size=4)
                         for _ in range(self._n_restarts - 1)]
        best, best_val = u0, np.inf
        for s in starts:
            try:
                r = scipy.optimize.minimize(
                    obj, s, jac=True, method="L-BFGS-B", bounds=opt_bounds,
                    options={"maxiter": self.max_opt_iters})
                if np.isfinite(r.fun) and r.fun < best_val:
                    best, best_val = r.x, r.fun
            except Exception:
                continue
        self.params = dict(zip(("sigma2", "ell", "bias", "noise"),
                               np.exp(best).tolist()))
        self._refactor()

    def _optimize_adam(self):
        Xp, yp, mask = self._padded()
        u0 = np.log(np.asarray([self.params["sigma2"], self.params["ell"],
                                self.params["bias"], self.params["noise"]],
                               np.float32))
        rng = np.random.RandomState(self.seed + self.n_evidence)
        starts = np.vstack([u0] + [u0 + rng.normal(0, 1.0, 4)
                                   for _ in range(self._n_restarts - 1)])
        best, _ = _optimize_restarts(
            jnp.asarray(starts, jnp.float32), Xp.astype(jnp.float32),
            yp.astype(jnp.float32), mask.astype(jnp.float32),
            jnp.asarray(self._prior_shapes, jnp.float32), jnp.float32(0.1))
        vals = np.exp(np.asarray(best, np.float64))
        if np.all(np.isfinite(vals)):
            self.params = dict(zip(("sigma2", "ell", "bias", "noise"),
                                   vals.tolist()))
        self._refactor()

    # -- prediction -------------------------------------------------------------------
    def predict(self, x, noiseless=False):
        """(mean, var) at x, each (n, 1) (reference
        ``gpy_regression.py:98-147``)."""
        x = np.asarray(x, np.float32).reshape(-1, self.input_dim)
        if self._factor is None:
            return np.zeros((len(x), 1)), np.ones((len(x), 1))
        Xp, mask, L, alpha, params = self._factor
        fn = _predict_noiseless if noiseless else _predict
        mu, var = fn(jnp.asarray(x), Xp, mask, L, alpha, params)
        return np.asarray(mu)[:, None], np.asarray(var)[:, None]

    def predict_mean(self, x):
        return self.predict(x)[0]

    def predict_var(self, x, noiseless=False):
        return self.predict(x, noiseless=noiseless)[1]

    def predictive_gradients(self, x):
        """(dmu/dx, dvar/dx), each (n, d), via autodiff (reference
        ``gpy_regression.py:180-223``)."""
        x = np.asarray(x, np.float32).reshape(-1, self.input_dim)
        if self._factor is None:
            return (np.zeros((len(x), self.input_dim)),
                    np.zeros((len(x), self.input_dim)))
        Xp, mask, L, alpha, params = self._factor
        gmu, gvar = _grads_noisy(jnp.asarray(x), Xp, mask, L, alpha, params)
        return np.asarray(gmu), np.asarray(gvar)

    def predictive_gradient_mean(self, x):
        return self.predictive_gradients(x)[0]

    # -- device-side closures for fused samplers ---------------------------------------
    def device_predict(self, noiseless=False):
        """Return a traceable ``x (n,d) -> (mu, var)`` closing over the
        current factorisation — for embedding in jitted NUTS/acquisition."""
        if self._factor is None:
            raise ValueError("GP has no evidence yet")
        Xp, mask, L, alpha, params = self._factor
        fn = _predict_noiseless if noiseless else _predict

        def pred(x):
            return fn(x, Xp, mask, L, alpha, params)

        return pred

    def copy(self):
        import copy as _copy
        k = _copy.copy(self)
        if self._x is not None:
            k._x = self._x.copy()
            k._y = self._y.copy()
            k.params = dict(self.params)
        return k
