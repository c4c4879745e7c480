"""BSL: Bayesian Synthetic Likelihood via Metropolis-Hastings MCMC
(Price et al. 2018; reference ``elfi/methods/inference/bsl.py``).

The per-round simulation batches (many sims at the SAME theta) run as one
jitted device program through :class:`~elfi_tpu.methods.base.ModelBased`;
the per-round synthetic-likelihood estimate and the MH accept/reject happen
host-side on the (n_sim_round, d) summary matrix."""

from __future__ import annotations

import logging
from functools import partial

import numpy as np

from ...model.extensions import ModelPrior
from ..base import ModelBased
from ..results import BslSample
from ..utils import batch_to_arr2d
from .pdf_methods import gaussian_syn_likelihood
from .slice_samplers import slice_gamma_mean, slice_gamma_variance

logger = logging.getLogger(__name__)

__all__ = ["BSL"]


class BSL(ModelBased):
    """Bayesian synthetic likelihood sampler."""

    def __init__(self, model, n_sim_round, feature_names=None,
                 likelihood=None, **kwargs):
        super().__init__(model, n_sim_round, feature_names=feature_names,
                         **kwargs)
        self.random_state = np.random.RandomState(self.seed)
        self.likelihood = likelihood or gaussian_syn_likelihood
        self.is_misspec = (isinstance(likelihood, partial)
                           and "adjustment" in likelihood.keywords)
        self.param_names = None
        self.prior = None
        self.sigma_proposals = None
        self.burn_in = 0
        self.logit_transform_bound = None
        self.gamma_sampler = None
        self.gamma_sampler_state = {}

    @property
    def parameter_names(self):
        return self.param_names or self.model.parameter_names

    def sample(self, n_samples, sigma_proposals, params0=None,
               param_names=None, burn_in=0, logit_transform_bound=None,
               tau=0.5, w=1, max_iter=1000, fused=None, bar=True, **kwargs):
        """Run the MH chain for ``n_samples`` rounds (reference
        ``bsl.py:69-124``).

        ``fused=True`` (default when eligible) runs the WHOLE chain —
        proposal, per-round simulation batch, synthetic-likelihood
        estimate, MH accept — as one jitted ``lax.scan``: a remote-attached
        chip then pays one dispatch for the entire run instead of one per
        MCMC iteration.  Eligible when the estimator has a traceable form
        (standard/Warton/unbiased), there is no misspecification
        adjustment, no pool, and ``batch_size == n_sim_round``.  The fused
        chain uses counter-based device RNG for proposals/accepts, so it is
        deterministic per seed but not bit-identical to the host chain
        (which uses numpy RandomState); agreement is statistical, as in the
        reference's own tests.
        """
        from ...compile.compiler import compile_program
        from ...parallel.backends import NativeBackend, ShardedBackend
        from .pdf_methods import traceable_likelihood

        self.sigma_proposals = np.atleast_2d(sigma_proposals)
        self.param_names = param_names
        self.prior = ModelPrior(self.model,
                                parameter_names=self.parameter_names)
        self.burn_in = burn_in
        self.logit_transform_bound = None if logit_transform_bound is None \
            else np.asarray(logit_transform_bound)
        if self.is_misspec:
            self.gamma_sampler, gamma0 = self._resolve_gamma_sampler(
                tau, w, max_iter)
        else:
            gamma0 = None
        self._init_state(n_samples, params0, gamma0)

        loglik_t = None if self.is_misspec \
            else traceable_likelihood(self.likelihood)
        eligible = (loglik_t is not None and self.pool is None
                    and self.batch_size == self.n_sim_round
                    and isinstance(self.client, (NativeBackend,
                                                 ShardedBackend))
                    and not kwargs)
        prog = None
        if eligible:
            # parameter nodes must be DECLARED overrides at compile time:
            # undeclared overrides are silently ignored by the trace
            prog = compile_program(
                self.model, tuple(self.feature_names),
                override_names=tuple(sorted(self.parameter_names)))
            eligible = not prog.host
        if fused is None:
            fused = eligible
        if fused and not eligible:
            raise ValueError(
                "fused=True requires a traceable estimator (standard/"
                "Warton/unbiased), no misspecification adjustment, no "
                "pool, batch_size == n_sim_round and a device-traceable "
                "model")
        if not fused:
            return self.infer(n_samples, bar=bar, **kwargs)
        self.bar = bar
        self._run_fused(n_samples, prog, loglik_t)
        return self.extract_result()

    def _resolve_gamma_sampler(self, tau, w, max_iter):
        adjustment = self.likelihood.keywords["adjustment"]
        sampler = {"mean": slice_gamma_mean,
                   "variance": slice_gamma_variance}[adjustment]
        sampler = partial(sampler, tau=tau, w=w, max_iter=max_iter,
                          random_state=self.random_state)
        gamma0 = {"mean": 0.0, "variance": tau}[adjustment]
        return sampler, np.repeat(gamma0, self.observed.size)

    def _init_state(self, n_samples, params0=None, gamma0=None):
        super()._init_state()
        if params0 is None:
            batch = self.model.generate(1, self.parameter_names,
                                        seed=self.seed)
            params0 = batch_to_arr2d(batch, self.parameter_names)
        else:
            params0 = np.atleast_2d(params0)
            if not np.all(np.isfinite(self.prior.logpdf(params0))):
                raise ValueError(
                    f"Initial point {params0} is outside prior support")
        self.state["n_samples"] = 0
        self.num_accepted = 0
        self.state["params"] = np.zeros((n_samples,
                                         len(self.parameter_names)))
        self.state["params"][0] = params0
        self.state["logprior"] = np.zeros(n_samples)
        self.state["logprior"][0] = float(np.asarray(
            self.prior.logpdf(params0)).ravel()[0])
        self.state["logposterior"] = np.zeros(n_samples)
        if self.is_misspec:
            self.state["gamma"] = np.zeros((n_samples, self.observed.size))
            self.state["gamma"][0] = gamma0
            self.gamma_sampler_state = {"gamma": gamma0}

    def extract_result(self):
        samples_all = {p: self.state["params"][:, i]
                       for i, p in enumerate(self.parameter_names)}
        if self.is_misspec:
            samples_all["gamma"] = self.state["gamma"][:]
        acc_rate = self.num_accepted / max(
            self.state["n_samples"] - self.burn_in, 1)
        return BslSample(method_name="BSL", samples_all=samples_all,
                         acc_rate=acc_rate, burn_in=self.burn_in,
                         n_sim=self.state["n_sim"],
                         parameter_names=self.parameter_names)

    @property
    def current_params(self):
        return self.state["params"][self.state["n_samples"]]

    def _chain_repeat_prev(self, n):
        """Reject: chain row ``n`` repeats row ``n - 1``."""
        st = self.state
        st["logprior"][n] = st["logprior"][n - 1]
        st["params"][n] = st["params"][n - 1]
        st["logposterior"][n] = st["logposterior"][n - 1]

    def _refresh_gamma(self, n):
        """Slice-sample the misspecification gamma given the current chain
        position, and fold its likelihood into row ``n - 1``."""
        gamma, ll = self.gamma_sampler(self.observed,
                                       **self.gamma_sampler_state)
        self.gamma_sampler_state.update(gamma=gamma, loglik=ll)
        self.state["gamma"][n] = gamma
        self.state["logposterior"][n - 1] = ll + self.state["logprior"][n - 1]

    def _init_round(self):
        """Draw the next MH candidate.  Candidates outside the prior
        support are rejected on the spot — no simulation round is spent on
        them, the chain just repeats and the round budget shrinks by one
        (reference ``bsl.py:200-230``)."""
        st = self.state
        while st["n_samples"] < len(st["params"]):
            n = st["n_samples"]
            if self.is_misspec:
                self._refresh_gamma(n)
            candidate = self._propagate_state()
            logprior = float(np.asarray(
                self.prior.logpdf(candidate)).ravel()[0])
            if np.isfinite(logprior):
                st["logprior"][n] = logprior
                st["params"][n] = candidate
                st["n_sim_round"] = 0
                return
            self._chain_repeat_prev(n)
            st["n_samples"] += 1
            self.set_objective(self.objective["round"] - 1)

    def _estimate_loglikelihood(self):
        """Synthetic log-likelihood of the observed summaries under the
        round's simulated feature matrix (non-finite simulations estimate
        to -inf, reference ``bsl.py:241-249``)."""
        if not np.all(np.isfinite(self.simulated)):
            return -np.inf
        kwargs = {"gamma": self.gamma_sampler_state["gamma"]} \
            if self.is_misspec else {}
        return float(np.asarray(self.likelihood(
            self.simulated, self.observed, **kwargs)).ravel()[0])

    def _process_simulated(self):
        """MH accept/reject for the finished round
        (reference ``bsl.py:232-285``)."""
        st = self.state
        n = st["n_samples"]
        loglikelihood = self._estimate_loglikelihood()
        if not np.isfinite(loglikelihood):
            if n == 0:
                raise RuntimeError("Estimated likelihood not finite on "
                                   "initialisation round")
            logger.warning("Estimated likelihood not finite")
        st["logposterior"][n] = loglikelihood + st["logprior"][n]

        accept = n == 0 or (self.random_state.uniform()
                            < np.minimum(1.0, self._get_mh_ratio()))
        if accept:
            if self.is_misspec:
                # the gamma sampler conditions on the accepted round's sims
                self.gamma_sampler_state.update(
                    loglik=loglikelihood,
                    sample_mean=np.mean(self.simulated, axis=0),
                    sample_cov=np.cov(self.simulated, rowvar=False))
            self.num_accepted += int(n >= self.burn_in)
        else:
            self._chain_repeat_prev(n)
        st["n_samples"] += 1

    def _propagate_state(self):
        """Gaussian random-walk proposal, optionally in logit space
        (reference ``bsl.py:287-297``)."""
        mean = self.state["params"][self.state["n_samples"] - 1]
        if self.logit_transform_bound is not None:
            tilde = _logit_transform(mean, self.logit_transform_bound)
            draw = self.random_state.multivariate_normal(
                tilde, self.sigma_proposals)
            prop = _logit_back_transform(draw, self.logit_transform_bound)
        else:
            prop = self.random_state.multivariate_normal(
                mean, self.sigma_proposals)
        return np.atleast_2d(prop)

    def _run_fused(self, n_samples, prog, loglik_t):
        """One jitted lax.scan over the whole MH chain."""
        import jax
        import jax.numpy as jnp

        d = len(self.parameter_names)
        pnames = list(self.parameter_names)
        feats = list(self.feature_names)
        B = self.batch_size
        fn = prog.traceable(B)
        # multi-chip: shard each MH round's n_sim_round simulation batch
        # over the mesh (same pattern as the fused rejection path,
        # samplers.py) — the synthetic-likelihood mean/cov reductions then
        # lower to ICI collectives instead of replicating every sim on
        # every device
        shard = None
        from ...parallel.backends import ShardedBackend
        if isinstance(self.client, ShardedBackend):
            from jax.sharding import NamedSharding, PartitionSpec as P
            if B % self.client.n_devices:
                raise ValueError(
                    f"n_sim_round {B} not divisible by mesh size "
                    f"{self.client.n_devices}")
            batched = NamedSharding(self.client.mesh,
                                    P(self.client.axis_name))

            def shard(out):
                return {k: jax.lax.with_sharding_constraint(v, batched)
                        if (jnp.ndim(v) >= 1 and v.shape[0] == B) else v
                        for k, v in out.items()}
        observed = jnp.asarray(np.asarray(self.observed, np.float64).ravel(),
                               jnp.float32)
        Lprop = jnp.linalg.cholesky(jnp.asarray(self.sigma_proposals,
                                                jnp.float32))
        prior_logpdf = self.prior.traceable_logpdf()
        to_tilde, back, jac = _traceable_logit(self.logit_transform_bound, d)
        burn_in = self.burn_in

        def loglik_of(master_key, theta, i):
            ov = {p: jnp.broadcast_to(theta[j], (B,))
                  for j, p in enumerate(pnames)}
            out = fn(master_key, i, ov)
            if shard is not None:
                out = shard(out)
            sx = jnp.column_stack([jnp.asarray(out[f]).reshape(B, -1)
                                   for f in feats])
            ll = loglik_t(sx, observed)
            return jnp.where(jnp.all(jnp.isfinite(sx)), ll, -jnp.inf)

        def chain(seed, params0):
            master = jax.random.key(seed)
            chain_key = jax.random.fold_in(master, 0xB51)
            lp0 = prior_logpdf(params0[None, :])[0]
            post0 = loglik_of(master, params0, jnp.uint32(0)) + lp0

            def step(carry, i):
                theta, logpost = carry
                kp, ka = jax.random.split(jax.random.fold_in(chain_key, i))
                draw = to_tilde(theta) + Lprop @ jax.random.normal(kp, (d,))
                prop = back(draw)
                lp = prior_logpdf(prop[None, :])[0]
                ll = loglik_of(master, prop, i)
                post = ll + lp
                ratio = post - logpost + jac(prop) - jac(theta)
                u = jax.random.uniform(ka)
                accept = (jnp.log(u) < jnp.clip(ratio, -700, 700)) \
                    & jnp.isfinite(post)
                theta = jnp.where(accept, prop, theta)
                logpost = jnp.where(accept, post, logpost)
                counted = accept & (i >= burn_in)
                return (theta, logpost), (theta, logpost, counted)

            idx = jnp.arange(1, n_samples, dtype=jnp.uint32)
            (_, _), (thetas, posts, counted) = jax.lax.scan(
                step, (params0, post0), idx)
            thetas = jnp.concatenate([params0[None, :], thetas])
            posts = jnp.concatenate([post0[None], posts])
            return thetas, posts, jnp.sum(counted)

        lik = self.likelihood
        if isinstance(lik, partial):
            kwt = tuple(sorted(
                (k, v.tobytes() if hasattr(v, "tobytes") else v)
                for k, v in lik.keywords.items()))
            lik_tag = (lik.func.__name__, kwt)
        else:
            lik_tag = getattr(lik, "__name__", repr(lik))
        cache = prog.__dict__.setdefault("_fused_bsl", {})
        # the shard tag keys the cache because the constrained program
        # embeds the mesh: a native run must not reuse a sharded build
        shard_tag = None if shard is None else (self.client.n_devices,
                                                self.client.axis_name)
        key_ = (B, n_samples, tuple(pnames), tuple(feats),
                lik_tag, self.burn_in, shard_tag,
                self.sigma_proposals.tobytes(),
                None if self.logit_transform_bound is None
                else self.logit_transform_bound.tobytes())
        if key_ not in cache:
            cache[key_] = jax.jit(chain)
        thetas, posts, n_acc = jax.device_get(cache[key_](
            jnp.uint32(self.seed),
            jnp.asarray(self.state["params"][0], jnp.float32)))
        self.state["params"][:] = thetas
        self.state["logposterior"][:] = posts
        self.state["n_samples"] = n_samples
        self.num_accepted = int(n_acc)
        self.state["n_sim"] = n_samples * B
        self.state["n_batches"] = n_samples

    def _get_mh_ratio(self):
        n = self.state["n_samples"]
        res = self.state["logposterior"][n] - \
            self.state["logposterior"][n - 1]
        if self.logit_transform_bound is not None:
            res += _logit_jacobian(self.state["params"][n],
                                   self.logit_transform_bound) - \
                _logit_jacobian(self.state["params"][n - 1],
                                self.logit_transform_bound)
        return np.exp(np.clip(res, -700, 700))


def _traceable_logit(bound, d):
    """jnp versions of the logit transform triple (to-tilde, back,
    log-Jacobian) with the per-coordinate bound types baked in statically."""
    import jax.numpy as jnp

    if bound is None:
        return (lambda x: x), (lambda y: y), (lambda x: jnp.float32(0.0))
    a = np.asarray(bound[:, 0], np.float64)
    b = np.asarray(bound[:, 1], np.float64)
    t = _bound_types(bound)
    M0 = jnp.asarray(t == 0)
    M1 = jnp.asarray(t == 1)
    M2 = jnp.asarray(t == 2)
    a_s = jnp.asarray(np.where(np.isfinite(a), a, 0.0), jnp.float32)
    b_s = jnp.asarray(np.where(np.isfinite(b), b, 1.0), jnp.float32)
    eps = 1e-12

    def to_tilde(x):
        v0 = jnp.log(jnp.maximum(x - a_s, eps)
                     / jnp.maximum(b_s - x, eps))
        v1 = -jnp.log(jnp.maximum(b_s - x, eps))
        v2 = jnp.log(jnp.maximum(x - a_s, eps))
        return jnp.where(M0, v0, jnp.where(M1, v1, jnp.where(M2, v2, x)))

    def back(y):
        ey = jnp.exp(y)
        v0 = a_s / (1 + ey) + b_s / (1 + 1 / ey)
        v1 = b_s - 1 / ey
        v2 = a_s + ey
        return jnp.where(M0, v0, jnp.where(M1, v1, jnp.where(M2, v2, y)))

    def jac(x):
        y = to_tilde(x)
        ey = jnp.exp(y)
        j0 = jnp.log(b_s - a_s) - jnp.log(1 / ey + 2 + ey)
        j = jnp.where(M0, j0, jnp.where(M1 | M2, y, 0.0))
        return jnp.sum(j)

    return to_tilde, back, jac


def _bound_types(bound):
    """0: both finite, 1: only upper finite, 2: only lower finite, 3: none."""
    return np.isinf(bound[:, 0]) * 1 + np.isinf(bound[:, 1]) * 2


def _logit_transform(theta, bound):
    """Map params to unbounded space per-coordinate (reference
    ``bsl.py:320-357``)."""
    theta = np.asarray(theta, np.float64).ravel()
    a, b = bound[:, 0], bound[:, 1]
    t = _bound_types(bound)
    out = np.empty_like(theta)
    for i, ty in enumerate(t):
        x = theta[i]
        if ty == 0:
            out[i] = np.log((x - a[i]) / (b[i] - x))
        elif ty == 1:
            out[i] = np.log(1 / (b[i] - x))
        elif ty == 2:
            out[i] = np.log(x - a[i])
        else:
            out[i] = x
    return out


def _logit_back_transform(tilde, bound):
    tilde = np.asarray(tilde, np.float64).ravel()
    a, b = bound[:, 0], bound[:, 1]
    t = _bound_types(bound)
    out = np.empty_like(tilde)
    for i, ty in enumerate(t):
        y = tilde[i]
        ey = np.exp(y)
        if ty == 0:
            out[i] = a[i] / (1 + ey) + b[i] / (1 + 1 / ey)
        elif ty == 1:
            out[i] = b[i] - 1 / ey
        elif ty == 2:
            out[i] = a[i] + ey
        else:
            out[i] = y
    return out


def _logit_jacobian(theta, bound):
    """log |d theta / d tilde| evaluated at the transformed value of theta."""
    tilde = _logit_transform(theta, bound)
    a, b = bound[:, 0], bound[:, 1]
    t = _bound_types(bound)
    logj = np.zeros(len(tilde))
    for i, ty in enumerate(t):
        y = tilde[i]
        if ty == 0:
            ey = np.exp(y)
            logj[i] = np.log(b[i] - a[i]) - np.log(1 / ey + 2 + ey)
        elif ty in (1, 2):
            logj[i] = y
    return float(np.sum(logj))
