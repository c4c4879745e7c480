"""Acquisition rules for Bayesian optimization (reference
``elfi/methods/bo/acquisition.py``).

All surrogate evaluations go through the jitted JAX GP
(:mod:`elfi_tpu.methods.bo.gp`); gradients come from autodiff.  The
MaxVar-family rules use a traceable Owen's-T-based skew-normal CDF
(:mod:`elfi_tpu.ops.special`) instead of scipy, so RandMaxVar can run its
NUTS chain fully on device."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...ops import special
from ...ops.distributions import truncnorm
from .utils import CostFunction, minimize, minimize_traced

__all__ = ["AcquisitionBase", "LCBSC", "MaxVar", "RandMaxVar", "ExpIntVar",
           "UniformAcquisition"]


class AcquisitionBase:
    """Base acquisition: optimize ``evaluate`` over the model bounds and add
    truncated-normal exploration noise (reference ``acquisition.py:16-191``)."""

    def __init__(self, model, prior=None, n_inits=10, max_opt_iters=1000,
                 noise_var=None, exploration_rate=10, seed=None,
                 constraints=None):
        self.model = model
        self.prior = prior
        self.n_inits = int(n_inits)
        self.max_opt_iters = int(max_opt_iters)
        self.constraints = constraints
        if noise_var is not None:
            noise_var = self._transform_noise_var(noise_var)
        self.noise_var = noise_var
        self.exploration_rate = exploration_rate
        self.random_state = np.random if seed is None \
            else np.random.RandomState(seed)
        self.seed = 0 if seed is None else seed
        self._acq_count = 0

    def _transform_noise_var(self, noise_var):
        if isinstance(noise_var, dict):
            if not set(noise_var) == set(self.model.parameter_names):
                raise ValueError("Acquisition noise dictionary should "
                                 "contain all parameters")
            return [noise_var[n] for n in self.model.parameter_names]
        if isinstance(noise_var, (int, float)):
            if noise_var < 0:
                raise ValueError("Acquisition noise should be non-negative")
            return noise_var
        raise ValueError("noise_var must be a float or a dict of floats")

    def evaluate(self, x, t=None):
        raise NotImplementedError

    def evaluate_gradient(self, x, t=None):
        raise NotImplementedError

    def acquire(self, n, t=None):
        """Optimize the acquisition and return n (noise-jittered) copies of
        the minimizer (reference ``acquisition.py:129-172``).

        When the rule exposes a traceable objective (``_traced``), ALL
        restarts run as one jitted device program (one dispatch instead of
        hundreds of host<->device transfers); otherwise falls back to the
        reference-style scipy multistart."""
        traced = self._traced(t)
        if traced is not None and self.constraints is None:
            obj, args = traced
            self._acq_count += 1
            key = jax.random.fold_in(jax.random.key(self.seed),
                                     self._acq_count)
            xhat, _ = minimize_traced(obj, self.model.bounds, args=args,
                                      n_starts=self.n_inits,
                                      steps=min(self.max_opt_iters, 200),
                                      key=key)
        else:
            def obj(x):
                return self.evaluate(x, t)

            def grad_obj(x):
                return self.evaluate_gradient(x, t)

            xhat, _ = minimize(
                obj, self.model.bounds,
                method="L-BFGS-B" if self.constraints is None else "SLSQP",
                constraints=self.constraints, grad=grad_obj,
                prior=self.prior, n_start_points=self.n_inits,
                maxiter=self.max_opt_iters,
                random_state=self.random_state)
        x = np.tile(np.asarray(xhat), (n, 1))
        return self._add_noise(x)

    def _traced(self, t):
        """Return (stable_traceable_obj, args) or None (host fallback)."""
        return None

    def _add_noise(self, x):
        """Truncated-normal jitter within bounds (reference
        ``acquisition.py:174-191``)."""
        if self.noise_var is None:
            return x
        noise_var = np.asanyarray(self.noise_var)
        if noise_var.ndim == 0:
            noise_var = np.tile(noise_var, self.model.input_dim)
        self._acq_count += 1
        key = jax.random.fold_in(jax.random.key(self.seed), self._acq_count)
        for i in range(self.model.input_dim):
            std = np.sqrt(noise_var[i])
            if std == 0:
                continue
            xi = x[:, i]
            a = (self.model.bounds[i][0] - xi) / std
            b = (self.model.bounds[i][1] - xi) / std
            ki = jax.random.fold_in(key, i)
            x[:, i] = np.asarray(truncnorm.rvs(a, b, loc=xi, scale=std,
                                               size=len(x), key=ki))
        return x


class LCBSC(AcquisitionBase):
    r"""GP Lower Confidence Bound Selection Criterion (Srinivas et al. 2010;
    reference ``acquisition.py:194-301``): mean - sqrt(beta_t * var) with
    beta_t = 2 log(t^(2d+2) pi^2 / (3 delta))."""

    def __init__(self, *args, delta=None, additive_cost=None, epsilon=0.0,
                 **kwargs):
        if delta is not None:
            if delta <= 0 or delta >= 1:
                import logging
                logging.getLogger(__name__).warning(
                    "Parameter delta should be in the interval (0,1)")
            kwargs["exploration_rate"] = 1 / delta
        super().__init__(*args, **kwargs)
        self.name = "lcbsc"
        if additive_cost is not None and not isinstance(additive_cost,
                                                        CostFunction):
            raise TypeError("Additive cost must be type CostFunction")
        self.additive_cost = additive_cost
        if not 0.0 <= epsilon < 1.0:
            raise ValueError("epsilon must be in [0, 1)")
        # eps-greedy global anchoring: with probability epsilon an
        # acquisition is a uniform prior-box draw instead of the LCB
        # minimizer.  The 2026-08-20 MA2 decomposition study
        # (scripts/bolfi_t1_bias.py, docs/measurements) showed pure-LCBSC
        # evidence placement drives the low-evidence surrogate bias;
        # uniform coverage at the same budget halves it.  0 = classic
        # LCBSC (reference semantics, bit-identical fused programs).
        self.epsilon = float(epsilon)

    def acquire(self, n, t=None):
        if self.epsilon > 0.0:
            self._acq_count += 1
            key = jax.random.fold_in(jax.random.key(self.seed),
                                     0x0E5 * 0x10000 + self._acq_count)
            if float(jax.random.uniform(key)) < self.epsilon:
                bounds = np.stack(self.model.bounds)
                x = self.random_state.uniform(
                    bounds[:, 0], bounds[:, 1],
                    size=(n, self.model.input_dim))
                return x
        return super().acquire(n, t)

    @property
    def delta(self):
        return 1 / self.exploration_rate

    def _beta(self, t):
        t += 1
        d = self.model.input_dim
        return 2 * np.log(t ** (2 * d + 2) * np.pi ** 2 / (3 * self.delta))

    def evaluate(self, x, t=None):
        mean, var = self.model.predict(x, noiseless=True)
        value = mean - np.sqrt(self._beta(t) * var)
        if self.additive_cost is not None:
            value = value + self.additive_cost.evaluate(x)
        return value

    def evaluate_gradient(self, x, t=None):
        mean, var = self.model.predict(x, noiseless=True)
        grad_mean, grad_var = self.model.predictive_gradients(x)
        value = grad_mean - 0.5 * grad_var * np.sqrt(self._beta(t) / var)
        if self.additive_cost is not None:
            value = value + self.additive_cost.evaluate_gradient(x)
        return value

    def _traced(self, t):
        factor = getattr(self.model, "_factor", None)
        if factor is None:
            return None
        Xp, mask, L, alpha, params = factor
        # cached-inverse predict: the traced acquisition runs a 150-step
        # Adam per restart; a matvec per step beats a sequential
        # triangular solve (see GPFns.posterior_inverse)
        Kinv = self.model.fns.posterior_inverse(L, mask)
        beta = jnp.float32(self._beta(t))
        neg_lcb = self.model.fns.neg_lcb_obj_inv
        if self.additive_cost is None:
            return neg_lcb, (Xp, mask, Kinv, alpha, params, beta)
        cost_tr = getattr(self.additive_cost, "traceable", None)
        if cost_tr is None:
            return None
        if getattr(self, "_combined_obj", None) is None:
            scale = self.additive_cost.scale

            def combined(theta, X, m, Ki, a, p, b):
                return neg_lcb(theta, X, m, Ki, a, p, b) \
                    + scale * cost_tr(theta)

            self._combined_obj = combined
        return self._combined_obj, (Xp, mask, Kinv, alpha, params, beta)


def _indicator_moments(eps, mean, var, noise):
    """First two posterior moments of the ABC indicator estimate
    ``p(theta) = Phi((eps - f) / sqrt(noise))`` when the GP gives
    ``f ~ N(mean, var)`` (traceable; any broadcastable shapes).

    ``E[p] = Phi(eps; mean, sqrt(noise+var))`` and ``E[p^2]`` is the CDF of
    a skew normal with shape ``sqrt(noise/(noise+2 var))`` — both via the
    Owen's-T implementation in :mod:`elfi_tpu.ops.special`, so the whole
    MaxVar family is differentiable and device-resident.  Replaces the
    reference's scipy-based host evaluation + hand-derived gradients
    (``elfi/methods/bo/acquisition.py:392-469``) with autodiff.
    """
    width = jnp.sqrt(noise + var)
    shape = jnp.sqrt(noise) * jax.lax.rsqrt(noise + 2.0 * var)
    first = special.norm_cdf(eps, loc=mean, scale=width)
    second = special.skewnorm_cdf(eps, shape, loc=mean, scale=width)
    return first, second


class MaxVar(AcquisitionBase):
    r"""Maximise the variance of the unnormalised approximate posterior
    (Jarvenpaa et al. 2019; reference ``acquisition.py:304-469``).

    The whole rule is a single traceable objective: the acquisition
    optimizer runs all restarts as one jitted device program
    (``minimize_traced``) on the log of ``prior(theta)^2 Var[p(theta)]``,
    and ``evaluate_gradient`` is ``jax.grad`` of ``evaluate`` — there is no
    hand-derived gradient to maintain."""

    def __init__(self, model, prior, quantile_eps=.01, **opts):
        super().__init__(model, prior=prior, **opts)
        self.name = "max_var"
        self.quantile_eps = quantile_eps
        self.eps = .1
        self._fns = None

    def _build_fns(self):
        """Traceable objective family, built once per instance.  Per-call
        data (GP factorisation, eps) flows through positional args so GP
        refits reuse the compiled programs.  Predictions go through the
        cached-inverse path: these objectives sit inside device Adam /
        NUTS loops where a sequential triangular solve per evaluation is
        latency-bound (see GPFns.posterior_inverse)."""
        if self._fns is not None:
            return self._fns
        prior_logpdf = self.prior.traceable_logpdf()
        predict_noiseless = self.model.fns.predict_noiseless_inv

        def log_value(theta, Xp, mask, Kinv, alpha, params, eps):
            mean, var = predict_noiseless(theta[None], Xp, mask, Kinv,
                                          alpha, params)
            first, second = _indicator_moments(eps, mean[0], var[0],
                                               params["noise"])
            var_p = jnp.maximum(second - first ** 2, 1e-32)
            return 2.0 * prior_logpdf(theta[None])[0] + jnp.log(var_p)

        def neg_log_value(theta, *args):
            return -log_value(theta, *args)

        def value_one(theta, *args):
            return jnp.exp(log_value(theta, *args))

        in_axes = (0,) + (None,) * 6
        self._fns = dict(
            neg_log=neg_log_value,
            log_value=jax.jit(jax.vmap(log_value, in_axes=in_axes)),
            value=jax.jit(jax.vmap(value_one, in_axes=in_axes)),
            grad=jax.jit(jax.vmap(jax.grad(value_one), in_axes=in_axes)),
        )
        return self._fns

    def _gp_args(self):
        if self.model._factor is None:
            raise ValueError("GP has no evidence yet")
        factor = self.model._factor
        # cache per (factorisation, eps): the constrained SLSQP path calls
        # evaluate/evaluate_gradient once per optimizer iteration per
        # start point, and recomputing the O(cap^2) cho_solve inverse
        # (a device dispatch) each time is pure waste
        cached = getattr(self, "_gp_args_cache", None)
        if cached is not None and cached[0] is factor \
                and cached[1] == self.eps:
            return cached[2]
        Xp, mask, L, alpha, params = factor
        Kinv = self.model.fns.posterior_inverse(L, mask)
        args = (Xp, mask, Kinv, alpha, params, jnp.float32(self.eps))
        self._gp_args_cache = (factor, self.eps, args)
        return args

    def _update_eps(self):
        # gp.Y is host-resident; quantile of the evidence targets
        self.eps = float(np.percentile(np.asarray(self.model.Y),
                                       self.quantile_eps * 100))

    def _traced(self, t):
        return self._build_fns()["neg_log"], self._gp_args()

    def acquire(self, n, t=None):
        self._update_eps()
        if self.constraints is None:
            obj, args = self._traced(t)
            self._acq_count += 1
            key = jax.random.fold_in(jax.random.key(self.seed),
                                     self._acq_count)
            xhat, _ = minimize_traced(obj, self.model.bounds, args=args,
                                      n_starts=self.n_inits,
                                      steps=min(self.max_opt_iters, 200),
                                      key=key)
        else:
            # constrained host path; note the sign: this rule MAXIMISES
            xhat, _ = minimize(lambda x: -self.evaluate(x, t),
                               self.model.bounds, method="SLSQP",
                               constraints=self.constraints,
                               grad=lambda x: -self.evaluate_gradient(x, t),
                               prior=self.prior,
                               n_start_points=self.n_inits,
                               maxiter=self.max_opt_iters,
                               random_state=self.random_state)
        return self._add_noise(np.tile(np.asarray(xhat), (n, 1)))

    def evaluate(self, theta_new, t=None):
        """``prior^2 Var[p]`` at each row of theta_new, (n, 1)."""
        theta = jnp.atleast_2d(jnp.asarray(theta_new, jnp.float32))
        vals = self._build_fns()["value"](theta, *self._gp_args())
        return np.asarray(vals)[:, None]

    def evaluate_gradient(self, theta_new, t=None):
        """Autodiff gradient of :meth:`evaluate`, (n, d)."""
        theta = jnp.atleast_2d(jnp.asarray(theta_new, jnp.float32))
        grads = self._build_fns()["grad"](theta, *self._gp_args())
        return np.asarray(jnp.where(jnp.isfinite(grads), grads, 0.0))


class RandMaxVar(MaxVar):
    r"""Sample the MaxVar density with device-side NUTS/metropolis
    (reference ``acquisition.py:472-626``)."""

    def __init__(self, model, prior, quantile_eps=.01, sampler="nuts",
                 n_samples=50, warmup=None, limit_faulty_init=1000,
                 init_from_prior=False, sigma_proposals=None, **opts):
        super().__init__(model, prior, quantile_eps, **opts)
        self.name = "rand_max_var"
        self.name_sampler = sampler
        self._n_samples = n_samples
        self._warmup = warmup or n_samples // 2
        self._limit_faulty_init = limit_faulty_init
        self._init_from_prior = init_from_prior
        self._sigma_proposals = sigma_proposals

    def _traceable_logpdf(self):
        """Traceable log of the MaxVar density for device NUTS."""
        fns = self._build_fns()
        args = self._gp_args()

        def logpdf(theta):
            return -fns["neg_log"](theta, *args)

        return logpdf

    def acquire(self, n, t=None):
        from .. import mcmc
        if n > self._n_samples:
            raise ValueError("The number of acquisitions has to be lower "
                             "than the number of the samples")
        gp = self.model
        self._update_eps()
        logpdf = self._traceable_logpdf()

        # draw ALL candidate initial points up front and score them in ONE
        # vectorised device call (the reference probes them one by one,
        # elfi/methods/bo/acquisition.py:551-575 — a host<->device round
        # trip per probe on this tunnel-attached TPU)
        n_try = self._limit_faulty_init
        if self._init_from_prior:
            inits = np.atleast_2d(np.asarray(
                self.prior.rvs(size=n_try, seed=self.seed)))
            for j, b in enumerate(gp.bounds):
                inits[:, j] = np.clip(inits[:, j], *b)
        else:
            bounds = np.asarray(gp.bounds)
            inits = self.random_state.uniform(
                bounds[:, 0], bounds[:, 1], size=(n_try, len(bounds)))
        logps = np.asarray(self._build_fns()["log_value"](
            jnp.asarray(inits, jnp.float32), *self._gp_args()))
        finite = np.isfinite(logps)
        if not finite.any():
            raise RuntimeError("Unable to find a suitable initial point")
        theta_init = inits[int(np.argmax(finite))]

        if self.name_sampler == "metropolis":
            from ..utils import resolve_sigmas
            sigmas = resolve_sigmas(self.model.parameter_names,
                                    self._sigma_proposals,
                                    self.model.bounds)
            samples = mcmc.metropolis(self._n_samples, theta_init,
                                      logpdf, sigmas, seed=self.seed)
        elif self.name_sampler == "nuts":
            # bounds widths as a diagonal mass matrix (see mcmc.nuts)
            bw = np.asarray([hi - lo for lo, hi in gp.bounds], np.float32)
            samples = mcmc.nuts(self._n_samples, theta_init, logpdf,
                                seed=self.seed, scales=bw)
        else:
            raise ValueError("Incompatible sampler")
        if n > 1:
            samples = samples[self._warmup:]
            return self.random_state.permutation(samples)[:n]
        return samples[-1:]


def _lookahead_state_fn(fns):
    """Per-round precompute for ExpIntVar, one device dispatch: posterior
    moments at the integration nodes, the ``K^-1 k(X, P)`` cross term
    that turns each candidate's lookahead covariance into a single
    matvec (cached-inverse path — no per-candidate triangular solve),
    and the current indicator mean Phi at every node.  Built per
    GP-kernel bundle so custom kernels flow through.  The jitted program
    lives ON the bundle (no id-keyed module dict — nothing to grow
    unbounded or go stale on id reuse)."""
    jitted = getattr(fns, "_lookahead_state", None)
    if jitted is not None:
        return jitted

    def state(Xp, mask, Kinv, alpha, params, eps, points):
        # HIGHEST matmul precision: the K^-1 cross terms cancel like the
        # GP variance quadratic form (see gp._mm_highest)
        with jax.default_matmul_precision("highest"):
            mean_p, var_p = fns.predict_noiseless_inv(points, Xp, mask,
                                                      Kinv, alpha, params)
            kxp = fns.cross_cov(Xp, points, params) * mask[:, None]
            kinv_kxp = Kinv @ kxp
        phi_p, _ = _indicator_moments(eps, mean_p, var_p, params["noise"])
        return mean_p, var_p, kinv_kxp, phi_p

    jitted = jax.jit(state)
    fns._lookahead_state = jitted
    return jitted


class ExpIntVar(MaxVar):
    r"""Expected Integrated Variance acquisition (Jarvenpaa et al. 2019;
    reference ``acquisition.py:629-821``).

    TPU-native formulation: per BO round one jitted precompute produces the
    integration-node state (:func:`_lookahead_state`); the expected-loss
    objective is then traceable — each evaluation is one triangular solve
    against the cached whitened cross term — so the acquisition optimizer
    runs all restarts as a single device program instead of the reference's
    host Cholesky per optimizer step."""

    def __init__(self, model, prior, quantile_eps=.01, integration="grid",
                 d_grid=.2, n_samples_imp=100, iter_imp=2, sampler="nuts",
                 n_samples=2000, sigma_proposals=None, **opts):
        super().__init__(model, prior, quantile_eps, **opts)
        self.name = "exp_int_var"
        self._integration = integration
        self._n_samples_imp = n_samples_imp
        self._iter_imp = iter_imp
        self._points = None          # integration nodes (host)
        self._weights = None         # omega_i * prior_i^2 (device)
        self._state = None           # (points_dev, mean_p, var_p, whitened, phi_p)
        self._loss_fns = None
        self._prior_logpdf_jit = None
        if integration == "importance":
            self.density_is = RandMaxVar(model=model, prior=prior,
                                         n_inits=self.n_inits,
                                         seed=self.seed,
                                         quantile_eps=quantile_eps,
                                         sampler=sampler,
                                         n_samples=n_samples,
                                         sigma_proposals=sigma_proposals)
        elif integration == "grid":
            axes = [np.arange(lo, hi, d_grid) for lo, hi in self.model.bounds]
            mesh = np.meshgrid(*axes, indexing="ij")
            self._points = np.stack([m.ravel() for m in mesh], axis=1)
        else:
            raise ValueError("Unknown integration method")

    def _build_loss(self):
        if self._loss_fns is not None:
            return self._loss_fns
        prior_logpdf = self.prior.traceable_logpdf()
        cross_cov = self.model.fns.cross_cov

        def loss_one(theta, Xp, mask, Kinv, alpha, params, eps,
                     points, mean_p, var_p, kinv_kxp, phi_p, weights):
            # lookahead variance reduction at every integration node from
            # one observation at theta — all matvecs on the cached K^-1
            kxt = cross_cov(theta[None], Xp, params)[0] * mask
            prior_var = cross_cov(theta[None], theta[None], params)[0, 0]
            with jax.default_matmul_precision("highest"):
                var_new = jnp.maximum(prior_var - kxt @ (Kinv @ kxt), 1e-10)
                cov = (cross_cov(theta[None], points, params)[0]
                       - kxt @ kinv_kxp)
            shrink = cov ** 2 / (params["noise"] + var_new)
            total = params["noise"] + var_p
            shape = jnp.sqrt(jnp.maximum(total - shrink, 0.0)
                             / (total + shrink))
            phi_look = special.skewnorm_cdf(eps, shape, loc=mean_p,
                                            scale=jnp.sqrt(total))
            # E[Var after] integrated: sum_i omega_i prior_i^2 (Phi - Phi_look)
            loss = jnp.sum(weights * (phi_p - phi_look))
            lp = prior_logpdf(theta[None])[0]
            return jnp.where(jnp.isfinite(lp), loss,
                             jnp.finfo(jnp.float32).max)

        self._loss_fns = dict(
            scalar=loss_one,
            batch=jax.jit(jax.vmap(loss_one, in_axes=(0,) + (None,) * 12)),
            grad=jax.jit(jax.vmap(jax.grad(loss_one),
                                  in_axes=(0,) + (None,) * 12)),
        )
        return self._loss_fns

    def _refresh_state(self, t):
        gp = self.model
        self._update_eps()
        refresh_points = self._integration == "importance" and (
            self._points is None or t is None or t % self._iter_imp == 0)
        if refresh_points:
            self._points = np.asarray(
                self.density_is.acquire(self._n_samples_imp))
        points = jnp.asarray(self._points, jnp.float32)
        args = self._gp_args()
        state = _lookahead_state_fn(self.model.fns)(*args, points)
        if refresh_points or self._weights is None:
            if self._prior_logpdf_jit is None:
                self._prior_logpdf_jit = jax.jit(
                    self.prior.traceable_logpdf())
            prior2 = jnp.exp(2.0 * self._prior_logpdf_jit(points))
            if self._integration == "importance":
                # self-normalised importance weights from the MaxVar density
                dens = self._build_fns()["value"](points, *args)
                omega = 1.0 / jnp.maximum(dens, 1e-32)
                omega = omega / jnp.sum(omega)
            else:
                omega = 1.0 / points.shape[0]
            self._weights = omega * prior2
        self._state = (points,) + tuple(state)

    def acquire(self, n, t=None):
        self._refresh_state(t)
        if self.constraints is not None:
            # constrained host path (this rule MINIMISES the loss)
            theta_min, _ = minimize(
                lambda x: self.evaluate(x, t), self.model.bounds,
                method="SLSQP", constraints=self.constraints,
                grad=lambda x: self.evaluate_gradient(x, t),
                prior=self.prior, n_start_points=self.n_inits,
                maxiter=self.max_opt_iters,
                random_state=self.random_state)
            return self._add_noise(np.tile(np.asarray(theta_min), (n, 1)))
        loss = self._build_loss()["scalar"]
        self._acq_count += 1
        key = jax.random.fold_in(jax.random.key(self.seed), self._acq_count)
        theta_min, _ = minimize_traced(
            loss, self.model.bounds,
            args=self._gp_args() + self._state + (self._weights,),
            n_starts=self.n_inits, steps=min(self.max_opt_iters, 200),
            key=key)
        return self._add_noise(np.tile(np.asarray(theta_min), (n, 1)))

    def evaluate(self, theta_new, t=None):
        """Expected integrated loss at each row of theta_new, (n,)."""
        if self._state is None:
            self._refresh_state(t)
        theta = jnp.atleast_2d(jnp.asarray(theta_new, jnp.float32))
        vals = self._build_loss()["batch"](
            theta, *(self._gp_args() + self._state + (self._weights,)))
        return np.asarray(vals)

    def evaluate_gradient(self, theta_new, t=None):
        """Autodiff gradient of the traced lookahead loss, (n, d)."""
        if self._state is None:
            self._refresh_state(t)
        theta = jnp.atleast_2d(jnp.asarray(theta_new, jnp.float32))
        grads = self._build_loss()["grad"](
            theta, *(self._gp_args() + self._state + (self._weights,)))
        return np.asarray(jnp.where(jnp.isfinite(grads), grads, 0.0))


class UniformAcquisition(AcquisitionBase):
    """Uniform random acquisition (reference ``acquisition.py:824-845``)."""

    def acquire(self, n, t=None):
        bounds = np.stack(self.model.bounds)
        return self.random_state.uniform(bounds[:, 0], bounds[:, 1],
                                         size=(n, self.model.input_dim))
