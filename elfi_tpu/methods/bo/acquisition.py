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
from .gp import gp_neg_lcb_obj
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

    def __init__(self, *args, delta=None, additive_cost=None, **kwargs):
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
        beta = jnp.float32(self._beta(t))
        if self.additive_cost is None:
            return gp_neg_lcb_obj, (Xp, mask, L, alpha, params, beta)
        cost_tr = getattr(self.additive_cost, "traceable", None)
        if cost_tr is None:
            return None
        if getattr(self, "_combined_obj", None) is None:
            scale = self.additive_cost.scale

            def combined(theta, X, m, Lf, a, p, b):
                return gp_neg_lcb_obj(theta, X, m, Lf, a, p, b) \
                    + scale * cost_tr(theta)

            self._combined_obj = combined
        return self._combined_obj, (Xp, mask, L, alpha, params, beta)


class MaxVar(AcquisitionBase):
    r"""Maximise the variance of the unnormalised approximate posterior
    (Jarvenpaa et al. 2019; reference ``acquisition.py:304-469``)."""

    def __init__(self, model, prior, quantile_eps=.01, **opts):
        super().__init__(model, prior=prior, **opts)
        self.name = "max_var"
        self.quantile_eps = quantile_eps
        self.eps = .1

    def acquire(self, n, t=None):
        self.eps = np.percentile(np.asarray(self.model.Y),
                                 self.quantile_eps * 100)

        def _neg(theta):
            return -self.evaluate(theta)

        def _neg_grad(theta):
            return -self.evaluate_gradient(theta)

        theta_max, _ = minimize(_neg, self.model.bounds, grad=_neg_grad,
                                prior=self.prior, n_start_points=self.n_inits,
                                maxiter=self.max_opt_iters,
                                random_state=self.random_state)
        return np.tile(theta_max, (n, 1))

    def evaluate(self, theta_new, t=None):
        """Var(prior^2 * p_a) via the skew-normal CDF identity (reference
        ``acquisition.py:392-421``)."""
        theta_new = np.atleast_2d(theta_new)
        mean, var = self.model.predict(theta_new, noiseless=True)
        sigma2_n = self.model.noise
        a = np.sqrt(sigma2_n) / np.sqrt(sigma2_n + 2. * var)
        scale = np.sqrt(sigma2_n + var)
        phi_skew = np.asarray(special.skewnorm_cdf(self.eps, a, loc=mean,
                                                   scale=scale))
        phi_norm = np.asarray(special.norm_cdf(self.eps, loc=mean,
                                               scale=scale))
        var_p_a = phi_skew - phi_norm ** 2
        val_prior = np.asarray(self.prior.pdf(theta_new)).reshape(-1, 1)
        return val_prior ** 2 * var_p_a

    def evaluate_gradient(self, theta_new, t=None):
        """Hand-derived gradient (reference ``acquisition.py:423-469``)."""
        theta_new = np.atleast_2d(theta_new)
        mean, var = self.model.predict(theta_new, noiseless=True)
        grad_mean, grad_var = self.model.predictive_gradients(theta_new)
        sigma2_n = self.model.noise
        scale = np.sqrt(sigma2_n + var)
        phi = lambda z: np.asarray(special.norm_cdf(z))  # noqa: E731

        a = (self.eps - mean) / scale
        b = np.sqrt(sigma2_n) / np.sqrt(sigma2_n + 2 * var)
        grad_a = (-1. / scale) * grad_mean - \
            ((self.eps - mean) / (2. * (sigma2_n + var) ** 1.5)) * grad_var
        grad_b = (-np.sqrt(sigma2_n) / (sigma2_n + 2 * var) ** 1.5) * grad_var

        _phi_a = phi(a)
        int_1 = _phi_a - _phi_a ** 2
        int_2 = np.asarray(special.norm_cdf(self.eps, loc=mean, scale=scale)) \
            - np.asarray(special.skewnorm_cdf(self.eps, b, loc=mean,
                                              scale=scale))
        grad_int_1 = (1. - 2 * _phi_a) * \
            (np.exp(-.5 * a ** 2) / np.sqrt(2. * np.pi)) * grad_a
        grad_int_2 = (1. / np.pi) * \
            ((np.exp(-.5 * (a ** 2) * (1. + b ** 2)) / (1. + b ** 2)) * grad_b
             + (np.sqrt(np.pi / 2.) * np.exp(-.5 * a ** 2)
                * (1. - 2. * phi(a * b)) * grad_a))

        term_prior = np.asarray(self.prior.pdf(theta_new)).reshape(-1, 1)
        grad_prior_log = np.asarray(self.prior.gradient_logpdf(theta_new))
        term_grad_prior = term_prior * grad_prior_log
        return 2. * term_prior * (int_1 - int_2) * term_grad_prior + \
            term_prior ** 2 * (grad_int_1 - grad_int_2)


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
        pred = self.model.device_predict(noiseless=True)
        sigma2_n = jnp.float32(self.model.noise)
        eps = jnp.float32(self.eps)
        prior_logpdf = self.prior.traceable_logpdf() \
            if hasattr(self.prior, "traceable_logpdf") else None

        def logpdf(theta):
            mean, var = pred(theta[None])
            mean, var = mean[0], var[0]
            a = jnp.sqrt(sigma2_n) / jnp.sqrt(sigma2_n + 2. * var)
            scale = jnp.sqrt(sigma2_n + var)
            phi_skew = special.skewnorm_cdf(eps, a, loc=mean, scale=scale)
            phi_norm = special.norm_cdf(eps, loc=mean, scale=scale)
            var_p_a = jnp.maximum(phi_skew - phi_norm ** 2, 1e-30)
            lp = prior_logpdf(theta[None])[0] if prior_logpdf is not None \
                else 0.0
            return 2.0 * lp + jnp.log(var_p_a)

        return logpdf

    def acquire(self, n, t=None):
        from .. import mcmc
        if n > self._n_samples:
            raise ValueError("The number of acquisitions has to be lower "
                             "than the number of the samples")
        gp = self.model
        self.eps = np.percentile(np.asarray(gp.Y), self.quantile_eps * 100)
        logpdf = self._traceable_logpdf()

        def host_logpdf(theta):
            return float(np.asarray(logpdf(jnp.asarray(theta, jnp.float32))))

        for i in range(self._limit_faulty_init + 1):
            if i == self._limit_faulty_init:
                raise RuntimeError("Unable to find a suitable initial point")
            if self._init_from_prior:
                theta_init = np.asarray(self.prior.rvs(
                    size=1, seed=self.seed + i)).ravel()
                theta_init = np.array([np.clip(theta_init[j], *b)
                                       for j, b in enumerate(gp.bounds)])
            else:
                theta_init = np.array([self.random_state.uniform(*b)
                                       for b in gp.bounds])
            if not np.isfinite(host_logpdf(theta_init)):
                continue
            if self.name_sampler == "metropolis":
                from ..utils import resolve_sigmas
                sigmas = resolve_sigmas(self.model.parameter_names,
                                        self._sigma_proposals,
                                        self.model.bounds)
                samples = mcmc.metropolis(self._n_samples, theta_init,
                                          logpdf, sigmas, seed=self.seed)
            elif self.name_sampler == "nuts":
                samples = mcmc.nuts(self._n_samples, theta_init, logpdf,
                                    seed=self.seed)
            else:
                raise ValueError("Incompatible sampler")
            if n > 1:
                samples = samples[self._warmup:]
                return self.random_state.permutation(samples)[:n]
            return samples[-1:]


class ExpIntVar(MaxVar):
    r"""Expected Integrated Variance acquisition (Jarvenpaa et al. 2019;
    reference ``acquisition.py:629-821``)."""

    def __init__(self, model, prior, quantile_eps=.01, integration="grid",
                 d_grid=.2, n_samples_imp=100, iter_imp=2, sampler="nuts",
                 n_samples=2000, sigma_proposals=None, **opts):
        super().__init__(model, prior, quantile_eps, **opts)
        self.name = "exp_int_var"
        self._integration = integration
        self._n_samples_imp = n_samples_imp
        self._iter_imp = iter_imp
        if integration == "importance":
            self.density_is = RandMaxVar(model=model, prior=prior,
                                         n_inits=self.n_inits,
                                         seed=self.seed,
                                         quantile_eps=quantile_eps,
                                         sampler=sampler,
                                         n_samples=n_samples,
                                         sigma_proposals=sigma_proposals)
        elif integration == "grid":
            grid_param = [slice(b[0], b[1], d_grid)
                          for b in self.model.bounds]
            self.points_int = np.mgrid[grid_param].reshape(
                len(self.model.bounds), -1).T
        else:
            raise ValueError("Unknown integration method")

    def acquire(self, n, t):
        gp = self.model
        self.sigma2_n = gp.noise
        self.eps = np.percentile(np.asarray(gp.Y), self.quantile_eps * 100)
        if self._integration == "importance" and t % self._iter_imp == 0:
            self.points_int = self.density_is.acquire(self._n_samples_imp)

        self.mean_int, self.var_int = gp.predict(self.points_int,
                                                 noiseless=True)
        self.priors_int = (np.asarray(self.prior.pdf(self.points_int))
                           ** 2)[np.newaxis, :]
        if self._integration == "importance" and t % self._iter_imp == 0:
            omegas_unnorm = (1 / MaxVar.evaluate(self, self.points_int)).T
            self.omegas_int = omegas_unnorm / \
                np.sum(omegas_unnorm, axis=1)[:, np.newaxis]
        elif self._integration == "grid":
            self.omegas_int = np.full(len(self.points_int),
                                      1 / len(self.points_int))

        # factorised training kernel for the lookahead covariance
        self.thetas_old = np.asarray(gp.X)
        p = gp.params
        self._kern = lambda A, B: (
            p["sigma2"] * np.exp(-0.5 * _sq_dists(A, B) / p["ell"] ** 2)
            + p["bias"])
        self.K = self._kern(self.thetas_old, self.thetas_old) + \
            self.sigma2_n * np.identity(len(self.thetas_old))
        self.k_int_old = self._kern(self.points_int, self.thetas_old).T
        self.phi_int = np.asarray(special.norm_cdf(
            self.eps, loc=self.mean_int.T,
            scale=np.sqrt(self.sigma2_n + self.var_int.T)))

        theta_min, _ = minimize(self.evaluate, gp.bounds, grad=None,
                                prior=self.prior,
                                n_start_points=self.n_inits,
                                maxiter=self.max_opt_iters,
                                random_state=self.random_state)
        return np.tile(theta_min, (n, 1))

    def evaluate(self, theta_new, t=None):
        """Expected loss term dependent on theta_new (reference
        ``acquisition.py:748-805``)."""
        import scipy.linalg as sl
        gp = self.model
        theta_new = np.atleast_2d(theta_new)
        _, var_new = gp.predict(theta_new, noiseless=True)
        k_old_new = self._kern(self.thetas_old, theta_new)
        k_int_new = self._kern(self.points_int, theta_new).T
        term_chol = sl.cho_solve(sl.cho_factor(self.K), k_old_new)
        cov_int = k_int_new - np.dot(self.k_int_old.T, term_chol).T
        delta_var_int = cov_int ** 2 / (self.sigma2_n + var_new)
        a = np.sqrt((self.sigma2_n + self.var_int.T - delta_var_int)
                    / (self.sigma2_n + self.var_int.T + delta_var_int))
        phi_skew_imp = np.asarray(special.skewnorm_cdf(
            self.eps, a, loc=self.mean_int.T,
            scale=np.sqrt(self.sigma2_n + self.var_int.T)))
        w = (self.phi_int - phi_skew_imp) / 2
        loss = 2 * np.sum(self.omegas_int * self.priors_int * w, axis=1)
        return np.where(np.asarray(self.prior.pdf(theta_new)).ravel() == 0,
                        np.finfo(float).max, loss)


class UniformAcquisition(AcquisitionBase):
    """Uniform random acquisition (reference ``acquisition.py:824-845``)."""

    def acquire(self, n, t=None):
        bounds = np.stack(self.model.bounds)
        return self.random_state.uniform(bounds[:, 0], bounds[:, 1],
                                         size=(n, self.model.input_dim))


def _sq_dists(A, B):
    A = np.atleast_2d(A)
    B = np.atleast_2d(B)
    return (np.sum(A ** 2, 1)[:, None] + np.sum(B ** 2, 1)[None, :]
            - 2 * A @ B.T)
