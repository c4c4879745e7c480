"""BOLFIRE: Bayesian Optimization and classification for Likelihood-Free
Inference by Ratio Estimation (reference
``elfi/methods/inference/bolfire.py``).

Per round: simulate ``n_training_data`` datasets at the acquired theta (one
jitted device batch), train a classifier against pre-generated marginal
data, and feed the negative log-ratio at the observed features to the JAX
GP surrogate.  Posterior sampling runs vmapped device NUTS."""

from __future__ import annotations

import logging
from typing import NamedTuple

import numpy as np

from ..model.extensions import ModelPrior
from .base import ModelBased
from .bo.acquisition import LCBSC, AcquisitionBase
from .bo.gp import GPRegression
from .bo.utils import CostFunction
from .classifier import Classifier, LogisticRegression
from .posteriors import BolfirePosterior
from .results import BolfireSample
from .utils import batch_to_arr2d, resolve_sigmas
from . import mcmc

logger = logging.getLogger(__name__)

__all__ = ["BOLFIRE"]


# -- fused BOLFIRE fit -----------------------------------------------------------
#
# Mirrors BOLFI's segmented fused BO loop (bolfi.py:_fused_bo_programs) with
# the scalar "simulate the discrepancy at theta" replaced by a full
# classifier round: simulate ``n_training_data`` feature rows at theta,
# fit the device logistic regression against the (jit-arg) marginal rows,
# and feed the negative log-ratio at the observed features to the GP.
# Theta selection and GP init/refit are the SAME memoized programs BOLFI
# uses (_make_theta_selector / _make_gp_loop_fns), so the acquisition
# trajectory machinery is validated once.  The marginal and observed
# feature arrays flow through jit ARGUMENTS, not closures, so one compiled
# program set serves every instance sharing a model + configuration
# (warmup/measure, Testbench replication).

class _FusedBolfireSpec(NamedTuple):
    """Static (hashable) configuration of one fused BOLFIRE fit."""
    cap: int
    d: int
    n_init: int
    n_restarts: int
    n_inits_acq: int
    rng_off: int
    pnames: tuple
    feat_names: tuple
    lo: tuple
    hi: tuple
    noise_std: tuple | None
    gp_scales: tuple
    epsilon: float
    n_train: int


_FUSED_BOLFIRE_PROGRAMS = {}
_FUSED_BOLFIRE_PROGRAMS_CAP = 8
_LOGREG_NEWTON = 25

_PRIOR_COST_FNS = {}


def _prior_cost_fn(prior):
    """Memoized traceable ``theta (d,) -> -log prior(theta)`` for the
    fused acquisition objective of non-uniform-box priors.

    Keyed on the model revision + parameter names so instances sharing a
    model share ONE selector program (a fresh closure per instance would
    defeat `_make_theta_selector`'s memo).  Sanitized exactly like the
    host path's ``ModelPrior.gradient_logpdf``: value clamped to a large
    finite constant and gradient ZEROED outside the support (a -inf log
    prior produces nan gradients that would freeze the Adam descent —
    the same failure mode the NUTS leapfrog sanitization exists for)."""
    key = (prior.model.revision, tuple(prior.parameter_names))
    fn = _PRIOR_COST_FNS.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    lp = prior.traceable_logpdf()

    def raw(theta):
        return -lp(theta[None])[0]

    @jax.custom_vjp
    def cost(theta):
        c = raw(theta)
        return jnp.where(jnp.isfinite(c), c, jnp.float32(1e30))

    def fwd(theta):
        c, vjp = jax.vjp(raw, theta)
        return jnp.where(jnp.isfinite(c), c, jnp.float32(1e30)), vjp

    def bwd(vjp, ct):
        (g,) = vjp(ct)
        return (jnp.where(jnp.isfinite(g), g, 0.0),)

    cost.defvjp(fwd, bwd)
    if len(_PRIOR_COST_FNS) >= 16:
        _PRIOR_COST_FNS.pop(next(iter(_PRIOR_COST_FNS)))
    _PRIOR_COST_FNS[key] = cost
    return cost


def _fused_bolfire_programs(spec, feat_fn, prior_fn=None, cost_fn=None):
    """``(init_jit, segment_jit, refit_jit)`` for one fused BOLFIRE
    config.

    init: initial thetas (uniform box draws when ``prior_fn`` is None,
    else one prior-program batch) -> vmapped classifier rounds ->
    GP MAP fit.  segment: one refit-to-refit window of LCBSC
    acquisitions (objective + ``cost_fn`` when given — the additive
    ``-log prior`` of non-box priors), each with an in-scan classifier
    round.  refit: shared warm-started GP hyperparameter refit.
    Per-round classifier coefficients come back as scan outputs for
    ``classifier_attributes`` parity."""
    memo_key = (spec, feat_fn, prior_fn, cost_fn)
    progs = _FUSED_BOLFIRE_PROGRAMS.get(memo_key)
    if progs is not None:
        return progs

    import jax
    import jax.numpy as jnp
    from .bolfi import _make_gp_loop_fns, _make_theta_selector
    from .classifier import logreg_fit_core

    cap, d, n_init, n_train = spec.cap, spec.d, spec.n_init, spec.n_train
    pnames, feat_names = spec.pnames, spec.feat_names
    lo = jnp.asarray(np.asarray(spec.lo, np.float32))
    hi = jnp.asarray(np.asarray(spec.hi, np.float32))

    _, u_to_params, init_gp_fit, refit_run = _make_gp_loop_fns(
        (cap, n_init, spec.n_restarts, spec.rng_off, spec.gp_scales))
    select = _make_theta_selector(
        (cap, d, spec.n_inits_acq, spec.rng_off, spec.lo, spec.hi,
         spec.noise_std, float(spec.epsilon)), cost_fn)

    def features_at(master, idx, theta):
        ov = {p: jnp.broadcast_to(theta[j], (n_train,))
              for j, p in enumerate(pnames)}
        out = feat_fn(master, idx, ov)
        return jnp.concatenate(
            [out[nm].reshape(n_train, -1) for nm in feat_names],
            axis=1).astype(jnp.float32)

    def neg_log_ratio(feats, marginal, obs):
        # one classifier round: likelihood rows (+1) vs marginal rows
        # (-1), log-ratio at the observed features (reference
        # ``bolfire.py:126-144,371-391``; device logreg replaces sklearn)
        X = jnp.concatenate([feats, marginal.astype(jnp.float32)], axis=0)
        y = jnp.concatenate([jnp.ones(n_train, jnp.float32),
                             -jnp.ones(marginal.shape[0], jnp.float32)])
        w, b, mu, sd = logreg_fit_core(X, y, n_newton=_LOGREG_NEWTON)
        z = ((obs.astype(jnp.float32) - mu) / sd) @ w + b
        return -z[0], w, b

    def init_run(master, marginal, obs):
        # initial evidence thetas: uniform draws over the prior box
        # (prior_fn None — eligibility guarantees prior == box), else
        # one prior-program batch (any traceable joint prior).  Feature
        # rounds use batch index i, acquisitions continue at n_init + t.
        if prior_fn is None:
            kinit = jax.random.fold_in(master, 0x1B01F1)
            theta0 = lo + (hi - lo) * jax.random.uniform(kinit,
                                                         (n_init, d))
        else:
            out0 = prior_fn(master, jnp.uint32(0), {})
            theta0 = jnp.stack([out0[p].reshape(-1) for p in pnames],
                               axis=1).astype(jnp.float32)

        def one(i, th):
            feats = features_at(master, i.astype(jnp.uint32), th)
            return neg_log_ratio(feats, marginal, obs)

        y0, ws, bs = jax.vmap(one)(jnp.arange(n_init), theta0)
        Xp, yp, u0, shapes = init_gp_fit(master, theta0, y0)
        return Xp, yp, u0, shapes, ws, bs

    def segment_run(master, Xc, yc, u, n, ts, betas_seg, marginal, obs):
        rkey = jax.random.fold_in(master, 0x5EED)
        params = u_to_params(u)

        def step(carry, inp):
            Xc, yc, n = carry
            t, beta = inp
            theta = select(rkey, Xc, yc, n, params, t, beta)
            feats = features_at(master, (n_init + t).astype(jnp.uint32),
                                theta)
            y_new, w, b = neg_log_ratio(feats, marginal, obs)
            Xc = Xc.at[n].set(theta)
            yc = yc.at[n].set(y_new)
            return (Xc, yc, n + 1), (w, b)

        (Xc, yc, n), (ws, bs) = jax.lax.scan(step, (Xc, yc, n),
                                             (ts, betas_seg))
        return Xc, yc, n, ws, bs

    progs = (jax.jit(init_run), jax.jit(segment_run), jax.jit(refit_run))
    if len(_FUSED_BOLFIRE_PROGRAMS) >= _FUSED_BOLFIRE_PROGRAMS_CAP:
        _FUSED_BOLFIRE_PROGRAMS.pop(next(iter(_FUSED_BOLFIRE_PROGRAMS)))
    _FUSED_BOLFIRE_PROGRAMS[memo_key] = progs
    return progs


class BOLFIRE(ModelBased):
    """BOLFIRE method."""

    def __init__(self, model, n_training_data, feature_names=None,
                 marginal=None, seed_marginal=None, classifier=None,
                 bounds=None, n_initial_evidence=0, acq_noise_var=0,
                 exploration_rate=10, update_interval=1, target_model=None,
                 acquisition_method=None, **kwargs):
        super().__init__(model, n_training_data,
                         feature_names=feature_names, **kwargs)
        self._random_state = np.random.RandomState(self.seed)
        self.marginal = self._resolve_marginal(marginal, seed_marginal)
        self.classifier = self._resolve_classifier(classifier)
        self.bounds = bounds
        self.acq_noise_var = acq_noise_var
        self.exploration_rate = exploration_rate
        self.update_interval = update_interval
        self.target_model = self._resolve_target_model(target_model)
        self.prior = ModelPrior(self.model,
                                parameter_names=self.parameter_names)
        self.n_initial_evidence = self._resolve_n_initial_evidence(
            n_initial_evidence)
        self.acquisition_method = self._resolve_acquisition_method(
            acquisition_method)
        self.state["n_evidence"] = 0
        self.state["last_GP_update"] = self.n_initial_evidence
        self.classifier_attributes = []
        self._init_round()

    @property
    def parameter_names(self):
        return self.target_model.parameter_names

    @property
    def n_evidence(self):
        return self.state["n_evidence"]

    def extract_result(self):
        return BolfirePosterior(self.parameter_names, self.target_model,
                                self.prior, self.classifier_attributes,
                                seed=self.seed)

    def predict_log_ratio(self, X, y, X_obs):
        """Train the classifier and evaluate log L/marginal at the observed
        features (reference ``bolfire.py:126-144``)."""
        self.classifier.fit(X, y)
        return self.classifier.predict_log_likelihood_ratio(X_obs)

    def fit(self, n_evidence, bar=True, fused=None):
        """Fit the surrogate.  ``fused=None`` auto-selects the fused
        device loop when eligible (:meth:`_fused_eligible`); ``False``
        forces the host round loop (sklearn classifier + incremental GP
        updates), ``True`` asserts eligibility."""
        logger.info("BOLFIRE: Fitting the surrogate model...")
        if not (isinstance(n_evidence, int) and n_evidence > 0):
            raise TypeError("n_evidence must be a positive integer")
        if n_evidence < self.n_evidence:
            logger.warning("Requesting less evidence than already exists")
        if fused is None:
            fused = self._fused_eligible()
        elif fused and not self._fused_eligible():
            raise ValueError("fused=True but this configuration is not "
                             "eligible for the fused BOLFIRE fit")
        if fused:
            self._fused_fit(n_evidence)
            return self.extract_result()
        return self.infer(n_evidence, bar=bar)

    def sample(self, n_samples, warmup=None, n_chains=4, initials=None,
               algorithm="nuts", sigma_proposals=None, n_evidence=None,
               bar=True, **kwargs):
        """Sample the BOLFIRE posterior with vmapped device chains."""
        if self.state["n_batches"] == 0:
            self.fit(n_evidence, bar=bar)
        if algorithm not in ("nuts", "metropolis"):
            raise ValueError("The given algorithm is not supported")
        posterior = self.extract_result()
        warmup = warmup or n_samples // 2

        if initials is not None:
            initials = np.asarray(initials)
            if initials.shape != (n_chains, self.target_model.input_dim):
                raise ValueError(
                    "The shape of initials must be (n_chains, n_params)")
        else:
            # rank evidence points by POSTERIOR logpdf (not GP-mean order):
            # with sharp surrogates the smallest-mean points can sit at
            # -inf prior support or deep posterior valleys
            candidates = np.asarray(self.target_model.X)
            lps = posterior.logpdf(candidates)
            ok = np.isfinite(lps)
            candidates, lps = candidates[ok], lps[ok]
            if len(candidates) < n_chains:
                raise ValueError("sample: cannot find enough acceptable "
                                 "initialization points")
            initials = candidates[np.argsort(-lps)][:n_chains]

        # fit data flows through target_args (NOT a closure) so the
        # compiled sampler program is reused across fits/instances
        target, target_args = posterior.traceable_logpdf_args()
        if algorithm == "nuts":
            # bounds widths as a diagonal mass matrix (see mcmc.nuts_chains)
            widths = np.asarray([hi - lo for lo, hi in
                                 self.target_model.bounds], np.float32)
            chains = mcmc.nuts_chains(n_samples, initials, target,
                                      n_adapt=warmup, seed=self.seed,
                                      mesh=getattr(self.client, "mesh",
                                                   None),
                                      target_args=target_args,
                                      scales=kwargs.pop("scales", widths),
                                      **kwargs)
        else:
            sigmas = resolve_sigmas(self.parameter_names, sigma_proposals,
                                    self.target_model.bounds)
            chains = mcmc.metropolis_chains(n_samples, initials, target,
                                            sigmas, warmup=0,
                                            seed=self.seed,
                                            target_args=target_args,
                                            **kwargs)
        logger.info("%d chains of %d iterations acquired", n_chains,
                    n_samples)
        return BolfireSample(method_name="BOLFIRE", chains=chains,
                             parameter_names=self.parameter_names,
                             warmup=warmup, n_sim=self.state["n_sim"],
                             seed=self.seed)

    # -- internals ---------------------------------------------------------------
    def _resolve_marginal(self, marginal, seed_marginal=None):
        if marginal is None:
            if seed_marginal is None:
                # derive from the method seed: an unseeded marginal made
                # BOLFIRE the ONLY method that was nondeterministic per
                # seed (measured 2026-08-20: same-seed gnk bench runs
                # landed A anywhere in 3.1-4.9 purely from marginal
                # resampling — the per-seed determinism invariant every
                # other method keeps).  A SEPARATE offset stream leaves
                # self._random_state's draw sequence (initial evidence
                # thetas) exactly as before
                seed_marginal = int(np.random.RandomState(
                    (self.seed + 0x9E3779B9) % 2**32).randint(2**31))
            batch = self.model.generate(self.n_sim_round,
                                        outputs=self.feature_names,
                                        seed=seed_marginal)
            marginal = batch_to_arr2d(batch, self.feature_names)
            logger.info("New marginal data (%d x %d) generated",
                        *marginal.shape)
            return marginal
        marginal = np.asarray(marginal)
        if marginal.ndim == 2:
            return marginal
        raise TypeError("marginal must be a 2d numpy array")

    def _resolve_classifier(self, classifier):
        if classifier is None:
            return LogisticRegression()
        if isinstance(classifier, Classifier):
            return classifier
        raise ValueError("classifier must be an instance of Classifier")

    def _resolve_n_initial_evidence(self, n):
        if isinstance(n, int) and n >= 0:
            return n
        raise ValueError("n_initial_evidence must be a non-negative integer")

    def _resolve_target_model(self, target_model):
        if target_model is None:
            return GPRegression(self.model.parameter_names, self.bounds)
        if isinstance(target_model, GPRegression):
            return target_model
        raise TypeError("target_model must be a GPRegression")

    def _resolve_acquisition_method(self, acquisition_method):
        self._default_acquisition = acquisition_method is None
        if acquisition_method is None:
            # additive -log prior cost (reference ``bolfire.py:333-346``);
            # the traceable form enables the device-side acquisition path
            prior_tr = self.prior.traceable_logpdf()
            cost = CostFunction(self.prior.logpdf,
                                self.prior.gradient_logpdf, scale=-1,
                                traceable=lambda theta: prior_tr(
                                    theta[None])[0])
            return LCBSC(model=self.target_model, prior=self.prior,
                         noise_var=self.acq_noise_var,
                         exploration_rate=self.exploration_rate,
                         seed=self.seed, additive_cost=cost)
        if isinstance(acquisition_method, AcquisitionBase):
            return acquisition_method
        raise TypeError("acquisition_method must be an AcquisitionBase")

    @property
    def current_params(self):
        return self._current_params

    def _init_round(self):
        super()._init_round()
        if self.n_evidence < self.n_initial_evidence:
            self._current_params = self.prior.rvs(
                1, seed=int(self._random_state.randint(2**31)))
        else:
            t = self.n_evidence - self.n_initial_evidence
            self._current_params = self.acquisition_method.acquire(1, t)

    def _fused_eligible(self):
        """Whether :meth:`_fused_fit` can replace the host round loop.

        Beyond BOLFI's conditions (native client, default LCBSC, default
        GP kernel, fresh state), the fused path requires (a) the DEFAULT
        sklearn-configured :class:`LogisticRegression` (the device logreg
        solves the same standardized L2 primal), (b) one batch per round
        (``batch_size == n_training_data``), and (c) a DEVICE-traceable
        prior: either a uniform box equal to the optimization bounds
        (the validated fast path — the additive ``-log prior``
        acquisition cost is constant over the clipped search box and is
        dropped), or any joint prior whose rvs/logpdf subgraphs trace
        (non-box priors add the sanitized ``-log prior`` cost to the
        fused LCB objective and draw initial evidence from the prior
        program, mirroring the host path)."""
        from ..compile.compiler import compile_program
        from ..parallel.backends import NativeBackend
        from .bo.acquisition import LCBSC

        clf = self.classifier
        if not (self.pool is None
                and self.batch_size == self.n_sim_round
                and isinstance(self.client, NativeBackend)
                and type(self.acquisition_method) is LCBSC
                and self.acquisition_method.constraints is None
                and self._default_acquisition
                and type(clf) is LogisticRegression
                and clf.class_min == 0
                and clf.config == {"solver": "liblinear", "l1_ratio": 1.0}
                and not getattr(self.target_model, "custom_kernel", False)
                and self.state["n_evidence"] == 0
                and self.n_initial_evidence > 0):
            return False
        if self._fused_box() is None:
            try:
                self.prior.traceable_logpdf()
            except ValueError:        # host-path (scipy-adapter) priors
                return False
            prior_prog = compile_program(self.model,
                                         tuple(self.parameter_names))
            if prior_prog.host:
                return False
        prog = compile_program(self.model, tuple(self.feature_names),
                               override_names=tuple(self.parameter_names))
        return not prog.host

    def _fused_box(self):
        """The prior box when it is uniform AND equal to the bounds
        (the cost-free fused fast path), else ``None``."""
        box = self.prior.box()
        if box is None:
            return None
        bounds = np.asarray(self.target_model.bounds, np.float64)
        if not (np.allclose(box[0], bounds[:, 0])
                and np.allclose(box[1], bounds[:, 1])):
            return None
        return box

    def _fused_fit(self, n_evidence):
        """Segmented fused BOLFIRE fit (see `_fused_bolfire_programs`);
        statistical parity with the host loop (device RNG streams and the
        device logreg replace the host RandomState + sklearn — same
        estimators, different draws), validated by the same accuracy
        gates as the host path."""
        import jax
        import jax.numpy as jnp
        from ..compile.compiler import compile_program
        from .bo.gp import _pad_cap
        from .bolfi import _install_fused_gp

        gp = self.target_model
        acq = self.acquisition_method
        d = gp.input_dim
        n_init = self.n_initial_evidence
        n_total = int(n_evidence)
        n_acq = n_total - n_init
        cap = _pad_cap(n_total)
        bounds = np.asarray(gp.bounds, np.float32)
        noise_var = acq.noise_var
        if noise_var is not None:
            noise_std = tuple(np.asarray(jnp.sqrt(jnp.broadcast_to(
                jnp.asarray(noise_var, jnp.float32), (d,)))).tolist())
        else:
            noise_std = None
        betas = jnp.asarray([acq._beta(t) for t in range(max(n_acq, 1))],
                            jnp.float32)
        # refit schedule: mirrors _should_optimize (n_init threshold +
        # update_interval cadence), segmented exactly like BOLFI's
        refit = np.zeros(max(n_acq, 1), bool)
        last = n_init
        for t in range(n_acq):
            cur = n_init + t + 1
            if cur >= n_init and cur >= last + self.update_interval:
                refit[t] = True
                last = cur
        segments, start = [], 0
        for t in range(n_acq):
            if refit[t]:
                segments.append((start, t + 1 - start, True))
                start = t + 1
        if start < n_acq:
            segments.append((start, n_acq - start, False))

        prog = compile_program(self.model, tuple(self.feature_names),
                               override_names=tuple(self.parameter_names))
        feat_fn = prog.traceable(batch_size=self.n_sim_round)
        gp_scales = np.asarray(
            1.0 / np.maximum(bounds[:, 1] - bounds[:, 0], 1e-12),
            np.float32)
        spec = _FusedBolfireSpec(
            cap=cap, d=d, n_init=n_init, n_restarts=gp._n_restarts,
            n_inits_acq=acq.n_inits, rng_off=max(n_acq, 1000),
            pnames=tuple(self.parameter_names),
            feat_names=tuple(self.feature_names),
            lo=tuple(bounds[:, 0].tolist()),
            hi=tuple(bounds[:, 1].tolist()),
            noise_std=noise_std, gp_scales=tuple(gp_scales.tolist()),
            epsilon=float(getattr(acq, "epsilon", 0.0)),
            n_train=self.n_sim_round)

        if self._fused_box() is not None:
            prior_fn = cost_fn = None      # validated cost-free box path
        else:
            prior_prog = compile_program(self.model,
                                         tuple(self.parameter_names))
            prior_fn = prior_prog.traceable(batch_size=n_init)
            cost_fn = _prior_cost_fn(self.prior)
        init_jit, segment_jit, refit_jit = _fused_bolfire_programs(
            spec, feat_fn, prior_fn, cost_fn)
        master = jax.random.key(self.seed)
        marginal_dev = jnp.asarray(self.marginal, jnp.float32)
        obs_dev = jnp.asarray(self.observed, jnp.float32)
        Xc, yc, u, shapes, ws0, bs0 = init_jit(master, marginal_dev,
                                               obs_dev)
        n = jnp.int32(n_init)
        all_w, all_b = [np.asarray(ws0)], [np.asarray(bs0)]
        for seg_start, seg_len, do_refit in segments:
            ts = jnp.arange(seg_start, seg_start + seg_len,
                            dtype=jnp.int32)
            Xc, yc, n, ws, bs = segment_jit(
                master, Xc, yc, u, n, ts,
                betas[seg_start:seg_start + seg_len], marginal_dev,
                obs_dev)
            all_w.append(np.asarray(ws))
            all_b.append(np.asarray(bs))
            if do_refit:
                u = refit_jit(master, Xc, yc, u, shapes, n,
                              jnp.int32(seg_start + seg_len - 1))
        Xf, yf, uf = jax.device_get((Xc, yc, u))
        _install_fused_gp(gp, Xf, yf, uf, n_total, n_init, gp_scales)
        W = np.concatenate(all_w)
        B = np.concatenate(all_b)
        self.classifier_attributes = [
            {"parameters": {"coef_": [W[i].tolist()],
                            "intercept_": [float(B[i])],
                            "n_iter": [_LOGREG_NEWTON]}}
            for i in range(n_total)]
        self.state["n_evidence"] = n_total
        self.state["n_batches"] = n_total
        self.state["n_sim"] = n_total * self.n_sim_round
        self.state["last_GP_update"] = n_total
        self.state["round"] = n_total
        self.state["n_sim_round"] = 0
        self.objective["round"] = n_total
        self.objective["n_batches"] = n_total

    def _process_simulated(self):
        """Classifier fit -> negative log-ratio -> GP update (reference
        ``bolfire.py:371-391``)."""
        X, y = self._generate_training_data(self.simulated, self.marginal)
        neg_log_ratio = -1 * self.predict_log_ratio(X, y, self.observed)
        self.classifier_attributes.append(self.classifier.attributes)
        self.state["n_evidence"] += 1
        optimize = self._should_optimize()
        self.target_model.update(self._current_params, neg_log_ratio,
                                 optimize)
        if optimize:
            self.state["last_GP_update"] = self.target_model.n_evidence

    @staticmethod
    def _generate_training_data(likelihood, marginal):
        X = np.vstack((likelihood, marginal))
        y = np.concatenate((np.ones(len(likelihood)),
                            -1 * np.ones(len(marginal))))
        return X, y

    def _should_optimize(self):
        current = self.target_model.n_evidence + 1
        next_update = self.state["last_GP_update"] + self.update_interval
        return current >= self.n_initial_evidence and current >= next_update
