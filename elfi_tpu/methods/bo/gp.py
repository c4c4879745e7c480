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

Custom kernels (reference ``gpy_regression.py:60-96`` accepts a GPy kernel
object): pass ``kernel=fn`` where ``fn(A, B, params) -> (n, m)`` is a
traceable cross-covariance over positive hyperparameters named in
``kernel_params`` (initial values).  All machinery — masked Cholesky,
MAP fit, predict, autodiff gradients, device closures — is generated per
kernel by :func:`make_gp_fns` and cached; the built-in RBF+bias kernel is
just the default instance of the same machinery.
"""

from __future__ import annotations

import functools

import numpy as np
import scipy.optimize

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = ["GPRegression", "rbf_bias_kernel", "make_gp_fns"]


def _pad_cap(n):
    cap = 16
    while cap < n:
        cap *= 2
    return cap


def _mm_highest(fn):
    """Trace-time guard: every dot/matmul inside ``fn`` runs at
    precision=HIGHEST (full float32 on TPU).

    The TPU default feeds the MXU bf16 inputs (~4e-3 relative error per
    dot).  GP linear algebra amplifies that catastrophically: the
    ``kx @ Kinv @ kx`` predictive-variance quadratic form cancels ~500
    bias-dominated terms of magnitude ~|prior var| down to O(1), so a
    4e-3 relative slip exceeds the whole noise floor — measured variance
    collapse to the 1e-10 clip across most of the Ricker box (GP sd = 0
    ⇒ logpdf ~ -1e11 plateaus ⇒ frozen NUTS chains, and corrupted LCB
    exploration during the fit).  These matrices are <= cap^2 (~512^2);
    the 3-pass float32 MXU cost is irrelevant next to the latency-bound
    dispatch, so HIGHEST everywhere is pure win."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


def rbf_bias_kernel(A, B, params):
    """Traceable RBF+bias cross-covariance matrix k(A, B), (n, m).

    ``params['scales']`` (optional, NOT optimized) rescales each input
    dimension before the isotropic distance — GPRegression sets it to
    1/bounds-width per dim, which turns the kernel into ARD-by-bounds.
    An isotropic RBF over raw coordinates is the reference GPy default,
    but it fits terribly when parameter ranges differ by 10x+ (e.g.
    Ricker's t2 in (0.05, 0.8) vs t3 in (4, 16)); bounds scaling is what
    makes the Ricker BOLFI posterior stable across seeds.

    Distances are per-dimension outer differences, NOT the
    ``|a|^2+|b|^2-2ab`` matmul expansion: on TPU that matmul runs at
    bf16 precision and the near-zero r2 of BO-clustered evidence pairs
    is a catastrophic cancellation — measured 5-11%% error in the
    Cholesky/alpha of the fitted K, which collapsed the predictive
    variance to the 1e-10 clip (q > prior var) over most of the box and
    froze NUTS on logpdf ~ -1e11 plateaus.  d is tiny (n_params) in LFI,
    so d elementwise (n, m) ops beat an MXU matmul anyway."""
    scales = params.get("scales") if isinstance(params, dict) else None
    if scales is not None:
        A = A * scales
        B = B * scales
    r2 = 0.0
    for k in range(A.shape[1]):
        r2 = r2 + (A[:, k][:, None] - B[:, k][None, :]) ** 2
    return (params["sigma2"] * jnp.exp(-0.5 * r2 / (params["ell"] ** 2))
            + params["bias"])


rbf_bias_kernel.param_names = ("sigma2", "ell", "bias")

# back-compat alias (acquisitions imported this name)
gp_cross_cov = rbf_bias_kernel


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


class GPFns:
    """Jitted GP machinery for one kernel function.  Hyperparameters are a
    dict over ``param_names + ('noise',)``; log-param vectors follow that
    order with noise LAST (the optimizers pin the noise floor at index -1).
    """

    def __init__(self, kernel):
        self.kernel = kernel
        self.param_names = tuple(kernel.param_names) + ("noise",)
        self.cross_cov = kernel

        def kernel_mats(X, mask, params):
            """Masked (K + noise I) over the padded buffer; padding
            rows/cols are identity so the Cholesky is exact for the active
            block."""
            K = kernel(X, X, params)
            m2 = mask[:, None] * mask[None, :]
            K = K * m2
            diag = jnp.where(mask > 0, jnp.diag(K) + params["noise"], 1.0)
            return K.at[jnp.diag_indices_from(K)].set(diag)

        def posterior_factor(X, y, mask, params):
            K = kernel_mats(X, mask, params)
            L = jnp.linalg.cholesky(K)
            ym = y * mask
            alpha = jax.scipy.linalg.cho_solve((L, True), ym)
            return L, alpha * mask

        names = self.param_names

        def neg_log_posterior(log_params, X, y, mask, prior_shapes,
                              const_params=None):
            params = {k: jnp.exp(v) for k, v in zip(names, log_params)}
            if const_params:
                params.update(const_params)
            K = kernel_mats(X, mask, params)
            L = jnp.linalg.cholesky(K)
            ym = y * mask
            alpha = jax.scipy.linalg.cho_solve((L, True), ym)
            n_active = jnp.sum(mask)
            mll = (-0.5 * jnp.dot(ym, alpha)
                   - jnp.sum(jnp.log(jnp.diag(L)))
                   - 0.5 * n_active * jnp.log(2 * jnp.pi))
            # Gamma(shape=k, scale=1) log-priors in log-space (with the
            # exp-transform Jacobian), mirroring GPy's from_EV(m, m)
            logprior = 0.0
            for i in range(len(names)):
                u = log_params[i]
                k = prior_shapes[i]
                logprior = logprior + jnp.where(
                    k > 0, k * u - jnp.exp(u) - jsp.gammaln(k), 0.0)
            return -(mll + logprior)

        def prior_var_diag(x, params):
            return jax.vmap(
                lambda xi: kernel(xi[None], xi[None], params)[0, 0])(x)

        def predict(x, X, mask, L, alpha, params):
            kx = kernel(x, X, params) * mask[None, :]
            mu = kx @ alpha
            v = jax.scipy.linalg.solve_triangular(L, kx.T, lower=True)
            var = (prior_var_diag(x, params) - jnp.sum(v * v, axis=0)
                   + params["noise"])
            return mu, jnp.maximum(var, 1e-10)

        def predict_noiseless(x, X, mask, L, alpha, params):
            mu, var = predict(x, X, mask, L, alpha, params)
            return mu, jnp.maximum(var - params["noise"], 1e-10)

        def posterior_inverse(L, mask):
            """Masked K^-1 from the Cholesky factor — the Woodbury-style
            cached inverse (GPy caches the same thing for its fast predict
            path, reference ``gpy_regression.py:151-160``).  A triangular
            SOLVE has an O(cap)-deep sequential dependency per evaluation
            — latency death inside fused Adam/NUTS loops on TPU; with the
            inverse each predict is one parallel matvec.  The padding
            block of K is identity, so masking the inverse is exact."""
            n = L.shape[0]
            Kinv = jax.scipy.linalg.cho_solve(
                (L, True), jnp.eye(n, dtype=L.dtype))
            return Kinv * (mask[:, None] * mask[None, :])

        def predict_inv(x, X, mask, Kinv, alpha, params):
            kx = kernel(x, X, params) * mask[None, :]
            mu = kx @ alpha
            var = (prior_var_diag(x, params)
                   - jnp.sum((kx @ Kinv) * kx, axis=1) + params["noise"])
            return mu, jnp.maximum(var, 1e-10)

        def predict_noiseless_inv(x, X, mask, Kinv, alpha, params):
            mu, var = predict_inv(x, X, mask, Kinv, alpha, params)
            return mu, jnp.maximum(var - params["noise"], 1e-10)

        def neg_lcb_obj_inv(theta, X, mask, Kinv, alpha, params, beta):
            """LCB objective on the cached-inverse predict: matvec per
            evaluation instead of a sequential triangular solve."""
            mu, var = predict_noiseless_inv(theta[None], X, mask, Kinv,
                                            alpha, params)
            return mu[0] - jnp.sqrt(beta * var[0])

        def _grad_fn(pred):
            def single(xi, X, mask, L, alpha, params):
                mu, var = pred(xi[None], X, mask, L, alpha, params)
                return mu[0], var[0]

            gmu = jax.grad(lambda xi, *a: single(xi, *a)[0])
            gvar = jax.grad(lambda xi, *a: single(xi, *a)[1])

            def grads(x, X, mask, L, alpha, params):
                ax = (0, None, None, None, None, None)
                return (jax.vmap(gmu, in_axes=ax)(x, X, mask, L, alpha,
                                                  params),
                        jax.vmap(gvar, in_axes=ax)(x, X, mask, L, alpha,
                                                   params))
            return grads

        def mean_obj(theta, X, mask, L, alpha, params):
            """Stable traceable objective: GP posterior mean at a single
            point (for device-side multistart minimization)."""
            mu, _ = predict(theta[None], X, mask, L, alpha, params)
            return mu[0]

        def neg_lcb_obj(theta, X, mask, L, alpha, params, beta):
            """Stable traceable LCB objective mean - sqrt(beta * var)."""
            mu, var = predict_noiseless(theta[None], X, mask, L, alpha,
                                        params)
            return mu[0] - jnp.sqrt(beta * var[0])

        def optimize_restarts_core(starts, X, y, mask, prior_shapes, lr,
                                   steps=250, const_params=None):
            """All hyperparameter restarts as one vmapped Adam descent;
            plain traceable so it can be embedded in fused BO loops."""
            from .utils import adam_minimize

            dim = starts.shape[-1]
            lo = jnp.full(dim, -12.0).at[-1].set(log_noise_floor(y, mask))

            def one(u0):
                return adam_minimize(
                    lambda u: neg_log_posterior(u, X, y, mask, prior_shapes,
                                                const_params),
                    u0, steps, lr, lo, jnp.full(dim, 12.0))

            us, fs = jax.vmap(one)(starts)
            fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)
            i = jnp.argmin(fs)
            return us[i], fs[i]

        # rebinding the LOCAL names wraps closure callees too
        # (predict_noiseless -> predict, optimize_restarts_core ->
        # neg_log_posterior, ...): all uses trace at HIGHEST precision,
        # including raw references embedded in fused BO scans
        (kernel_mats, posterior_factor, posterior_inverse, predict,
         predict_noiseless, predict_inv, predict_noiseless_inv,
         neg_lcb_obj_inv, neg_lcb_obj, mean_obj, neg_log_posterior,
         optimize_restarts_core) = (
            _mm_highest(f) for f in
            (kernel_mats, posterior_factor, posterior_inverse, predict,
             predict_noiseless, predict_inv, predict_noiseless_inv,
             neg_lcb_obj_inv, neg_lcb_obj, mean_obj, neg_log_posterior,
             optimize_restarts_core))

        self.kernel_mats = jax.jit(kernel_mats)
        self.posterior_factor = jax.jit(posterior_factor)
        self.posterior_inverse = jax.jit(posterior_inverse)
        self.predict_inv = jax.jit(predict_inv)
        self.predict_noiseless_inv = jax.jit(predict_noiseless_inv)
        self.neg_lcb_obj_inv = neg_lcb_obj_inv
        self._posterior_inverse_raw = posterior_inverse
        self.neg_log_posterior = neg_log_posterior
        self.neg_log_posterior_grad = jax.jit(
            jax.value_and_grad(neg_log_posterior))
        self.predict = jax.jit(predict)
        self.predict_noiseless = jax.jit(predict_noiseless)
        self.grads_noisy = jax.jit(_grad_fn(predict))
        self.grads_noiseless = jax.jit(_grad_fn(predict_noiseless))
        self.mean_obj = mean_obj
        self.neg_lcb_obj = neg_lcb_obj
        self.optimize_restarts_core = optimize_restarts_core
        self.optimize_restarts = jax.jit(optimize_restarts_core)


_FNS_CACHE = {}


def make_gp_fns(kernel):
    """Build (or fetch the cached) jitted GP machinery for ``kernel``."""
    key = id(kernel)
    fns = _FNS_CACHE.get(key)
    if fns is None or fns.kernel is not kernel:
        fns = _FNS_CACHE[key] = GPFns(kernel)
    return fns


_DEFAULT_FNS = make_gp_fns(rbf_bias_kernel)

# Back-compat module-level names (fused BOLFI, acquisitions, posteriors and
# tests import these; they are the default-kernel bundle's members).
_kernel_mats = _DEFAULT_FNS.kernel_mats
_posterior_factor = _DEFAULT_FNS.posterior_factor
_neg_log_posterior = _DEFAULT_FNS.neg_log_posterior
_neg_log_posterior_grad = _DEFAULT_FNS.neg_log_posterior_grad
_predict = _DEFAULT_FNS.predict
_predict_noiseless = _DEFAULT_FNS.predict_noiseless
_grads_noisy = _DEFAULT_FNS.grads_noisy
_grads_noiseless = _DEFAULT_FNS.grads_noiseless
gp_mean_obj = _DEFAULT_FNS.mean_obj
gp_neg_lcb_obj = _DEFAULT_FNS.neg_lcb_obj
gp_neg_lcb_obj_inv = _DEFAULT_FNS.neg_lcb_obj_inv
_posterior_inverse = _DEFAULT_FNS._posterior_inverse_raw
optimize_restarts_core = _DEFAULT_FNS.optimize_restarts_core
_optimize_restarts = _DEFAULT_FNS.optimize_restarts


class GPRegression:
    """Drop-in equivalent of the reference ``GPyRegression``.

    ``kernel``/``kernel_params``/``kernel_priors`` give custom-kernel
    support (reference accepts a GPy kernel object,
    ``gpy_regression.py:60-96``): ``kernel(A, B, params)`` is a traceable
    cross-covariance, ``kernel_params`` maps its positive hyperparameter
    names to initial values (ordering = optimization ordering), and
    ``kernel_priors`` optionally maps names to Gamma(shape, scale=1)
    log-prior shapes (default: no prior).
    """

    def __init__(self, parameter_names=None, bounds=None, optimizer="adam",
                 max_opt_iters=50, gp=None, seed=0, kernel=None,
                 kernel_params=None, kernel_priors=None, **gp_params):
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

        kernel = kernel or gp_params.pop("kernel", None)
        self.custom_kernel = kernel is not None
        if self.custom_kernel:
            if kernel_params is None:
                raise ValueError(
                    "a custom kernel requires kernel_params (dict of "
                    "initial positive hyperparameter values)")
            if not hasattr(kernel, "param_names"):
                kernel.param_names = tuple(kernel_params.keys())
            self._kernel = kernel
        else:
            self._kernel = rbf_bias_kernel
        self.fns = make_gp_fns(self._kernel)
        self._kernel_params = dict(kernel_params or {})
        self._kernel_priors = dict(kernel_priors or {})

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
        self._prior_shapes = np.zeros(len(self.fns.param_names))
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
        p = {k: round(float(v), 5) for k, v in self.params.items()
             if np.ndim(v) == 0}
        return f"GPRegression(n={self.n_evidence}, {p})"

    __repr__ = __str__

    # -- fitting --------------------------------------------------------------------
    def _init_hyperparams(self):
        """Heuristic init + Gamma(mean=var) hyperpriors (reference
        ``gpy_regression.py:243-280``)."""
        y = self._y
        noise_var = self.gp_params.get("noise_var")
        if noise_var is None:
            noise_var = max(np.max(y) ** 2 / 100.0, 1e-6)
        else:
            # respect a user-specified value — `or` would swallow an
            # explicit 0 and silently substitute the ~1e4x larger
            # heuristic; floor it so log-parametrisation stays finite
            noise_var = max(float(noise_var), 1e-8)
        if self.custom_kernel:
            self.params = dict(self._kernel_params, noise=float(noise_var))
            self._prior_shapes = np.array(
                [float(self._kernel_priors.get(n, 0.0))
                 for n in self._kernel.param_names] + [0.0])
            return
        # bounds-scaled distances: each dim is normalised by its bounds
        # width, so the isotropic ell lives in unit-cube units and its
        # heuristic init is 1/3 regardless of raw parameter ranges
        widths = np.array([hi - lo for lo, hi in self.bounds], np.float32)
        scales = 1.0 / np.maximum(widths, 1e-12)
        length_scale = 1.0 / 3.0
        kernel_var = (np.max(np.abs(y)) / 3.0) ** 2
        bias_var = kernel_var / 4.0
        self.params = dict(sigma2=float(max(kernel_var, 1e-6)),
                           ell=float(length_scale),
                           bias=float(max(bias_var, 1e-6)),
                           noise=float(noise_var),
                           scales=scales)
        # Gamma shapes for from_EV(m, m) = shape m, scale 1 (no prior on
        # noise, as in GPy's default GPRegression)
        self._prior_shapes = np.array([kernel_var, length_scale, bias_var,
                                       0.0])

    def _log_param_vector(self):
        return np.log(np.asarray([self.params[k]
                                  for k in self.fns.param_names]))

    def _const_params(self):
        """Non-optimized kernel constants carried in the params dict
        (e.g. the bounds scales)."""
        return {k: jnp.asarray(v, jnp.float32)
                for k, v in (self.params or {}).items()
                if k not in self.fns.param_names}

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
        L, alpha = self.fns.posterior_factor(Xp.astype(jnp.float32),
                                             yp.astype(jnp.float32),
                                             mask.astype(jnp.float32),
                                             params)
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

        const = self._const_params()

        def obj(u):
            val, grad = self.fns.neg_log_posterior_grad(
                jnp.asarray(u, jnp.float32), Xp, yp, mask, shapes, const)
            val = float(val)
            grad = np.asarray(grad, np.float64)
            if not np.isfinite(val):
                return 1e10, np.zeros_like(grad)
            return val, grad

        u0 = self._log_param_vector()
        dim = len(u0)
        noise_floor = float(np.log(max(0.01 * np.var(self._y), 1e-8)))
        opt_bounds = [(-12, 12)] * (dim - 1) + [(noise_floor, 12)]
        rng = np.random.RandomState(self.seed + self.n_evidence)
        starts = [u0] + [u0 + rng.normal(0, 1.0, size=dim)
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
        self.params.update(zip(self.fns.param_names,
                               np.exp(best).tolist()))
        self._refactor()

    def _optimize_adam(self):
        Xp, yp, mask = self._padded()
        u0 = self._log_param_vector().astype(np.float32)
        dim = len(u0)
        rng = np.random.RandomState(self.seed + self.n_evidence)
        starts = np.vstack([u0] + [u0 + rng.normal(0, 1.0, dim)
                                   for _ in range(self._n_restarts - 1)])
        best, _ = self.fns.optimize_restarts(
            jnp.asarray(starts, jnp.float32), Xp.astype(jnp.float32),
            yp.astype(jnp.float32), mask.astype(jnp.float32),
            jnp.asarray(self._prior_shapes, jnp.float32), jnp.float32(0.1),
            const_params=self._const_params())
        vals = np.exp(np.asarray(best, np.float64))
        if np.all(np.isfinite(vals)):
            self.params.update(zip(self.fns.param_names, vals.tolist()))
        self._refactor()

    # -- prediction -------------------------------------------------------------------
    def predict(self, x, noiseless=False):
        """(mean, var) at x, each (n, 1) (reference
        ``gpy_regression.py:98-147``)."""
        x = np.asarray(x, np.float32).reshape(-1, self.input_dim)
        if self._factor is None:
            return np.zeros((len(x), 1)), np.ones((len(x), 1))
        Xp, mask, L, alpha, params = self._factor
        fn = self.fns.predict_noiseless if noiseless else self.fns.predict
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
        gmu, gvar = self.fns.grads_noisy(jnp.asarray(x), Xp, mask, L, alpha,
                                         params)
        return np.asarray(gmu), np.asarray(gvar)

    def predictive_gradient_mean(self, x):
        return self.predictive_gradients(x)[0]

    # -- device-side closures for fused samplers ---------------------------------------
    def device_predict(self, noiseless=False, use_inverse=False):
        """Return a traceable ``x (n,d) -> (mu, var)`` closing over the
        current factorisation — for embedding in jitted NUTS/acquisition.

        ``use_inverse=True`` precomputes the masked K^-1 once (one extra
        O(cap^3) MXU pass here) so every embedded evaluation is a parallel
        matvec instead of a sequential triangular solve — the right trade
        whenever the closure sits inside a long device loop (NUTS
        leapfrogs, fused Adam descents)."""
        if self._factor is None:
            raise ValueError("GP has no evidence yet")
        Xp, mask, L, alpha, params = self._factor
        if use_inverse:
            Kinv = self.fns.posterior_inverse(L, mask)
            fn = self.fns.predict_noiseless_inv if noiseless \
                else self.fns.predict_inv

            def pred(x):
                return fn(x, Xp, mask, Kinv, alpha, params)

            return pred
        fn = self.fns.predict_noiseless if noiseless else self.fns.predict

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
