"""BayesianOptimization and BOLFI (reference
``elfi/methods/inference/bolfi.py``).

TPU-native differences: the surrogate is the JAX GP
(:mod:`elfi_tpu.methods.bo.gp`) whose predict/gradient programs are jitted;
posterior sampling runs ALL chains vmapped on one chip through the
traceable BOLFI target (the reference farms one Python NUTS chain per
client worker, ``bolfi.py:541-580``)."""

from __future__ import annotations

import logging
from typing import NamedTuple

import numpy as np

import jax

from ..model.extensions import ModelPrior
from .base import ParameterInference
from .bo.acquisition import LCBSC
from .bo.gp import GPRegression
from .bo.utils import stochastic_optimization
from .posteriors import BolfiPosterior
from .results import BolfiSample, OptimizationResult
from .utils import (arr2d_to_batch, batch_to_arr2d, ceil_to_batch_size,
                    resolve_sigmas)
from . import mcmc

logger = logging.getLogger(__name__)

__all__ = ["BayesianOptimization", "BOLFI"]


# -- fused BO loop programs ------------------------------------------------------
#
# The segmented fused BO loop (init / acquisition segment / refit) runs as
# three jitted programs.  They are built by a module-level factory memoized
# on a static, hashable ``spec`` plus the (program-cache-stable) model
# traceables, so BOLFI instances sharing a configuration — the
# Testbench-replication and bench warmup/measure cases — reuse ONE set of
# compiled programs.  Built as per-fit locals instead (the pre-round-4
# design), every instance re-traced all three programs and re-loaded their
# persistent-cache entries: pure host/tunnel overhead inside the measured
# fit wall.
#
# The factory deliberately reproduces the validated per-fit CLOSURE code
# verbatim, with the per-fit numeric constants (bounds, acquisition noise
# std, kernel scales) captured as device arrays — NOT passed as traced jit
# arguments and NOT rebuilt from python inside the trace.  Both variants
# were measured 2026-08-18/19 and produce byte-different programs: the
# args-based one was bit-identical on CPU yet XLA:TPU's changed fusion
# re-rolled the chaotic BO trajectories and collapsed the Ricker seed-3
# posterior (t1/t3 pinned at the bounds — the documented GP noise-collapse
# failure mode); the rebuilt-constants one already diverges at the jaxpr
# level (/tmp jaxpr A/B, 2026-08-19).  Capturing the same constants from
# the same closure source keeps the jaxpr — and therefore the TPU binary
# and the validated trajectories — exactly the ones the 4-seed Ricker
# accuracy study passed.

class _FusedBOSpec(NamedTuple):
    """Static (hashable) configuration of one fused BO fit.  Float fields
    are tuples of Python floats, converted back to the exact float32
    device constants the programs capture."""
    cap: int
    d: int
    n_init: int
    n_restarts: int
    n_inits_acq: int
    rng_off: int
    pnames: tuple
    target_name: str
    lo: tuple
    hi: tuple
    noise_std: tuple | None   # None = no acquisition noise
    gp_scales: tuple
    epsilon: float = 0.0      # LCBSC eps-greedy uniform-explore share


_FUSED_BO_PROGRAMS = {}
_FUSED_BO_PROGRAMS_CAP = 8   # LRU bound: evicted entries GC like the
                             # old per-fit closures did

_THETA_SELECTORS = {}


def _make_theta_selector(sel_spec, cost_fn=None):
    """Theta selection for ONE fused LCBSC acquisition step:
    masked GP factorization -> vmapped Adam LCB descent -> eps-greedy
    uniform anchor -> truncnorm acquisition noise.

    ``sel_spec = (cap, d, n_inits_acq, rng_off, lo, hi, noise_std,
    epsilon)`` with lo/hi/noise_std as float tuples (noise_std ``None``
    disables acquisition noise).  ``cost_fn`` (optional, traceable
    ``theta (d,) -> scalar``) is ADDED to the LCB objective — the
    additive ``-log prior`` cost of non-uniform-prior BOLFIRE; with
    ``cost_fn=None`` the emitted operations are byte-identical to the
    pre-extraction BOLFI closures (the Python-level branch adds nothing
    to the trace).  Shared by the BOLFI and BOLFIRE fused
    fits and memoized so equal configurations trace one program; the
    emitted operations are exactly the ones the 4-seed Ricker accuracy
    study validated (lowered-HLO byte-identity checked at extraction,
    scripts/bolfi_jaxpr_probe.py 2026-08-20).
    """
    memo_key = (sel_spec, cost_fn)
    fn = _THETA_SELECTORS.get(memo_key)
    if fn is not None:
        return fn
    import jax.numpy as jnp
    from .bo.gp import (_posterior_factor, _posterior_inverse,
                        gp_neg_lcb_obj_inv)
    from .bo.utils import adam_minimize

    cap, d, n_inits_acq, rng_off, lo_t, hi_t, noise_std_t, eps = sel_spec
    eps = float(eps)
    lo = jnp.asarray(np.asarray(lo_t, np.float32))
    hi = jnp.asarray(np.asarray(hi_t, np.float32))
    if noise_std_t is not None:
        noise_std = jnp.asarray(np.asarray(noise_std_t, np.float32))

    def select(rkey, Xc, yc, n, params, t, beta):
        # The masked K^-1 is computed once per step (one cho_solve) so
        # the 150-step acquisition Adam descent does a parallel matvec
        # per evaluation instead of a sequential cap-deep triangular
        # solve.  (A Sherman-Morrison rank-1-carried K^-1 was measured
        # 2026-08-17 and REJECTED: on BO-clustered evidence the float32
        # bordering update drifts 5-15% within one 20-step refit window —
        # enough to corrupt the LCB variance and derail acquisition; the
        # Ricker t3 posterior landed 5 SD off.)
        mask = (jnp.arange(cap) < n).astype(jnp.float32)
        L, alpha = _posterior_factor(Xc, yc, mask, params)
        Kinv = _posterior_inverse(L, mask)
        kacq = jax.random.fold_in(rkey, rng_off + t)
        starts = lo + (hi - lo) * jax.random.uniform(
            kacq, (n_inits_acq, d))
        lr = jnp.max(hi - lo) / 10.0

        def one(x0):
            if cost_fn is None:
                objective = lambda th: gp_neg_lcb_obj_inv(  # noqa: E731
                    th, Xc, mask, Kinv, alpha, params, beta)
            else:
                objective = lambda th: gp_neg_lcb_obj_inv(  # noqa: E731
                    th, Xc, mask, Kinv, alpha, params, beta) + cost_fn(th)
            return adam_minimize(objective, x0, 150, lr, lo, hi)

        xs, fs = jax.vmap(one)(starts)
        theta = xs[jnp.argmin(jnp.where(jnp.isfinite(fs), fs,
                                        jnp.inf))]
        if eps > 0.0:
            # eps-greedy global anchor (LCBSC.epsilon): a measured
            # fraction of acquisitions is pure prior-box coverage —
            # the 2026-08-20 MA2 decomposition showed LCBSC evidence
            # placement (not GP/threshold/sampler) drives the
            # low-evidence t1 bias, and uniform coverage halves it.
            kexp = jax.random.fold_in(rkey, 4 * rng_off + t)
            coin = jax.random.uniform(jax.random.fold_in(kexp, 0))
            unif = lo + (hi - lo) * jax.random.uniform(
                jax.random.fold_in(kexp, 1), (d,))
            theta = jnp.where(coin < eps, unif, theta)
        if noise_std_t is not None:
            knoise = jax.random.fold_in(rkey, 2 * rng_off + t)
            from ..ops.distributions import truncnorm as _tn
            # zero-noise dims pass theta through unchanged (the
            # host path's _add_noise skips them): with std=0 the
            # raw a/b are 0/0 = NaN whenever the LCB minimizer
            # lands exactly on a bound — which adam's clipping
            # makes common — so divide by a safe std and select
            safe = jnp.where(noise_std > 0, noise_std, 1.0)
            a = (lo - theta) / safe
            b = (hi - theta) / safe
            prop = _tn.rvs(a, b, loc=theta, scale=safe,
                           size=(d,), key=knoise)
            theta = jnp.where(noise_std > 0, prop, theta)
        return theta

    _THETA_SELECTORS[memo_key] = select
    return select


def _install_fused_gp(gp, Xf, yf, uf, n_total, n_init, gp_scales):
    """Install a fused fit's device results (evidence + MAP log
    hyperparameters) into a host :class:`~.bo.gp.GPRegression`, exactly
    as the incremental host loop would have left it (shared by the BOLFI
    and BOLFIRE fused fits)."""
    gp._x = np.asarray(Xf[:n_total], np.float64)
    gp._y = np.asarray(yf[:n_total], np.float64)
    vals = np.exp(np.asarray(uf, np.float64))
    gp.params = dict(zip(("sigma2", "ell", "bias", "noise"),
                         vals.tolist()))
    gp.params["scales"] = np.asarray(gp_scales)
    y0 = gp._y[:n_init]
    gp._prior_shapes = np.array([
        (np.max(np.abs(y0)) / 3.0) ** 2 + 1e-6,
        1.0 / 3.0,
        (np.max(np.abs(y0)) / 3.0) ** 2 / 4.0 + 1e-6, 0.0])
    gp._refactor()


_GP_LOOP_FNS = {}


def _make_gp_loop_fns(gp_spec):
    """GP-surrogate management for fused BO loops: hyperparameter
    heuristics, the initial MAP fit, and the scheduled warm refit.

    ``gp_spec = (cap, n_init, n_restarts, rng_off, gp_scales)`` with
    ``gp_scales`` a float tuple.  Returns ``(heuristic_params,
    u_to_params, init_gp_fit, refit_run)``; memoized, shared by the
    BOLFI and BOLFIRE fused fits (lowered-HLO byte-identity with the
    pre-extraction BOLFI closures checked via
    scripts/bolfi_jaxpr_probe.py, 2026-08-20)."""
    fns = _GP_LOOP_FNS.get(gp_spec)
    if fns is not None:
        return fns
    import jax.numpy as jnp
    from .bo.gp import optimize_restarts_core

    cap, n_init, n_restarts, rng_off, gp_scales_t = gp_spec
    gp_scales = jnp.asarray(np.asarray(gp_scales_t, np.float32))

    def heuristic_params(y):
        # initial log-hyperparams + Gamma prior shapes from the initial
        # evidence (mirrors GPRegression._init_hyperparams)
        ls = jnp.float32(1.0 / 3.0)
        kv = (jnp.max(jnp.abs(y)) / 3.0) ** 2 + 1e-6
        bv = kv / 4.0 + 1e-6
        nv = jnp.maximum(jnp.max(y) ** 2 / 100.0, 1e-6)
        u0 = jnp.log(jnp.stack([kv, ls, bv, nv]))
        shapes = jnp.stack([kv, ls, bv, jnp.float32(0.0)])
        return u0, shapes

    def u_to_params(u):
        v = jnp.exp(u)
        return {"sigma2": v[0], "ell": v[1], "bias": v[2],
                "noise": v[3], "scales": gp_scales}

    def init_gp_fit(master, X0, y0):
        d = X0.shape[1]
        Xp = jnp.zeros((cap, d), jnp.float32).at[:n_init].set(X0)
        yp = jnp.zeros((cap,), jnp.float32).at[:n_init].set(y0)
        mask0 = (jnp.arange(cap) < n_init).astype(jnp.float32)
        u0, shapes = heuristic_params(y0)
        rkey = jax.random.fold_in(master, 0x5EED)
        starts0 = u0 + 0.5 * jax.random.normal(
            jax.random.fold_in(rkey, 0), (n_restarts, 4))
        u0, _ = optimize_restarts_core(
            starts0.at[0].set(u0), Xp, yp, mask0, shapes,
            jnp.float32(0.1), const_params={"scales": gp_scales})
        return Xp, yp, u0, shapes

    def refit_run(master, Xc, yc, u, shapes, n, t):
        rkey = jax.random.fold_in(master, 0x5EED)
        mask = (jnp.arange(cap) < n).astype(jnp.float32)
        st = u + 0.5 * jax.random.normal(
            jax.random.fold_in(rkey, 3 * rng_off + t), (n_restarts, 4))
        # in-loop refits warm-start from the current hyperparams (the
        # first restart IS u) so fewer Adam steps suffice than the
        # 250 the from-heuristic initial fit uses; 120 passed the
        # 4-seed Ricker accuracy check (2026-08-17, worst deviation
        # well under the 2-SD bench gate) — each refit is a
        # sequential Cholesky chain, the dominant refit cost
        u_new, _ = optimize_restarts_core(
            st.at[0].set(u), Xc, yc, mask, shapes, jnp.float32(0.1),
            steps=120, const_params={"scales": gp_scales})
        return u_new

    fns = (heuristic_params, u_to_params, init_gp_fit, refit_run)
    _GP_LOOP_FNS[gp_spec] = fns
    return fns


def _fused_bo_programs(spec, init_fn, sim_fn):
    """``(init_jit, segment_jit, refit_jit)`` for one fused-BO config.

    init: draw + simulate the initial evidence and MAP-fit the GP.
    segment: one refit-to-refit window of acquisitions as a lax.scan.
    refit: scheduled warm-started MAP hyperparameter refit.
    """
    memo_key = (spec, init_fn, sim_fn)
    progs = _FUSED_BO_PROGRAMS.get(memo_key)
    if progs is not None:
        return progs

    import jax
    import jax.numpy as jnp

    cap, d, n_init = spec.cap, spec.d, spec.n_init
    n_restarts, n_inits_acq = spec.n_restarts, spec.n_inits_acq
    rng_off = spec.rng_off
    eps = float(spec.epsilon)
    pnames, target_name = spec.pnames, spec.target_name

    _, u_to_params, init_gp_fit, refit_run = _make_gp_loop_fns(
        (cap, n_init, n_restarts, rng_off, spec.gp_scales))
    select = _make_theta_selector((cap, d, n_inits_acq, rng_off,
                                   spec.lo, spec.hi, spec.noise_std, eps))

    def init_run(master):
        out = init_fn(master, jnp.uint32(0), {})
        y0 = out[target_name].reshape(-1).astype(jnp.float32)
        X0 = jnp.stack([out[p].reshape(-1) for p in pnames],
                       axis=1).astype(jnp.float32)
        return init_gp_fit(master, X0, y0)

    def segment_run(master, Xc, yc, u, n, ts, betas_seg):
        rkey = jax.random.fold_in(master, 0x5EED)
        params = u_to_params(u)

        def step(carry, inp):
            Xc, yc, n = carry
            t, beta = inp
            theta = select(rkey, Xc, yc, n, params, t, beta)
            overrides = {p: theta[i][None]
                         for i, p in enumerate(pnames)}
            y_new = sim_fn(master, (t + 1).astype(jnp.uint32),
                           overrides)[target_name].reshape(())
            Xc = Xc.at[n].set(theta)
            yc = yc.at[n].set(y_new)
            return (Xc, yc, n + 1), None

        (Xc, yc, n), _ = jax.lax.scan(
            step, (Xc, yc, n), (ts, betas_seg))
        return Xc, yc, n

    progs = (jax.jit(init_run), jax.jit(segment_run), jax.jit(refit_run))
    if len(_FUSED_BO_PROGRAMS) >= _FUSED_BO_PROGRAMS_CAP:
        _FUSED_BO_PROGRAMS.pop(next(iter(_FUSED_BO_PROGRAMS)))
    _FUSED_BO_PROGRAMS[memo_key] = progs
    return progs


class BayesianOptimization(ParameterInference):
    """GP-surrogate optimization of the target node (reference
    ``bolfi.py:26-397``)."""

    def __init__(self, model, target_name=None, bounds=None,
                 initial_evidence=None, update_interval=10, target_model=None,
                 acquisition_method=None, acq_noise_var=0, acq_epsilon=0.0,
                 exploration_rate=10, batch_size=1,
                 batches_per_acquisition=None, async_acq=False, **kwargs):
        model, target_name = self._resolve_model(model, target_name)
        output_names = [target_name] + model.parameter_names
        super().__init__(model, output_names, batch_size=batch_size, **kwargs)

        target_model = target_model or GPRegression(
            self.model.parameter_names, bounds=bounds)
        self.target_name = target_name
        self.target_model = target_model

        n_precomputed = 0
        n_initial, precomputed = self._resolve_initial_evidence(
            initial_evidence)
        if precomputed is not None:
            params = batch_to_arr2d(precomputed,
                                    self.target_model.parameter_names)
            n_precomputed = len(params)
            self.target_model.update(params, precomputed[target_name])

        self.batches_per_acquisition = batches_per_acquisition or \
            self.max_parallel_batches
        prior = ModelPrior(self.model,
                           parameter_names=self.target_model.parameter_names)
        self.acquisition_method = acquisition_method or LCBSC(
            self.target_model, prior=prior, noise_var=acq_noise_var,
            epsilon=acq_epsilon,
            exploration_rate=exploration_rate, seed=self.seed)

        self.n_initial_evidence = n_initial
        self.n_precomputed_evidence = n_precomputed
        self.update_interval = update_interval
        self.async_acq = async_acq
        self.state["n_evidence"] = self.n_precomputed_evidence
        self.state["last_GP_update"] = self.n_initial_evidence
        self.state["acquisition"] = []

    def _resolve_initial_evidence(self, initial_evidence):
        precomputed = None
        n_required = max(10, 2 ** self.target_model.input_dim + 1)
        n_required = ceil_to_batch_size(n_required, self.batch_size)
        if initial_evidence is None:
            n_initial_evidence = n_required
        elif np.isscalar(initial_evidence):
            n_initial_evidence = int(initial_evidence)
        else:
            precomputed = initial_evidence
            n_initial_evidence = len(precomputed[self.target_name])
        if n_initial_evidence < 0:
            raise ValueError("Number of initial evidence must be >= 0")
        if n_initial_evidence < n_required:
            logger.warning("We recommend at least %d initialization points "
                           "(now %d)", n_required, n_initial_evidence)
        if precomputed is None and n_initial_evidence % self.batch_size:
            n_initial_evidence = ceil_to_batch_size(n_initial_evidence,
                                                    self.batch_size)
        return n_initial_evidence, precomputed

    @property
    def n_evidence(self):
        return self.state.get("n_evidence", 0)

    @property
    def acq_batch_size(self):
        return self.batch_size * self.batches_per_acquisition

    def set_objective(self, n_evidence=None):
        if n_evidence is None:
            n_evidence = self.objective.get("n_evidence", self.n_evidence)
        if n_evidence < self.n_evidence:
            logger.warning("Requesting less evidence than already exists")
        self.objective["n_evidence"] = n_evidence
        self.objective["n_sim"] = n_evidence - self.n_precomputed_evidence

    def extract_result(self):
        from .bo.utils import minimize_traced
        if getattr(self.target_model, "_factor", None) is not None:
            import jax
            Xp, mask, L, alpha, params = self.target_model._factor
            x_min, _ = minimize_traced(self.target_model.fns.mean_obj,
                                       self.target_model.bounds,
                                       args=(Xp, mask, L, alpha, params),
                                       n_starts=20, steps=200,
                                       key=jax.random.key(self.seed))
        else:
            x_min, _ = stochastic_optimization(
                self.target_model.predict_mean, self.target_model.bounds,
                seed=self.seed)
        batch_min = arr2d_to_batch(x_min[None],
                                   self.target_model.parameter_names)
        outputs = arr2d_to_batch(self.target_model.X,
                                 self.target_model.parameter_names)
        outputs[self.target_name] = self.target_model.Y
        return OptimizationResult(x_min=batch_min, outputs=outputs,
                                  **self._extract_result_kwargs())

    def update(self, batch, batch_index):
        super().update(batch, batch_index)
        self.state["n_evidence"] += self.batch_size
        batch = {k: np.asarray(v) for k, v in batch.items()}
        params = batch_to_arr2d(batch, self.target_model.parameter_names)
        optimize = self._should_optimize()
        self.target_model.update(params, batch[self.target_name], optimize)
        if optimize:
            self.state["last_GP_update"] = self.target_model.n_evidence

    def prepare_new_batch(self, batch_index):
        t = self._get_acquisition_index(batch_index)
        if t < 0:
            return None  # initial evidence from the prior
        acquisition = self.state["acquisition"]
        if len(acquisition) == 0:
            acquisition = self.acquisition_method.acquire(
                self.acq_batch_size, t=t)
        batch = arr2d_to_batch(acquisition[:self.batch_size],
                               self.target_model.parameter_names)
        self.state["acquisition"] = acquisition[self.batch_size:]
        return batch

    def _get_acquisition_index(self, batch_index):
        acq_batch_size = self.batch_size * self.batches_per_acquisition
        initial_offset = self.n_initial_evidence - self.n_precomputed_evidence
        starting_sim_index = self.batch_size * batch_index
        return (starting_sim_index - initial_offset) // acq_batch_size

    def _allow_submit(self, batch_index):
        if not super()._allow_submit(batch_index):
            return False
        if self.async_acq:
            return True
        t = self._get_acquisition_index(batch_index)
        if t < 0:
            return True
        # sync acquisition: wait for pending evidence before acquiring more
        if len(self.state["acquisition"]) == 0 and self.batches.has_pending:
            return False
        return True

    def _should_optimize(self):
        current = self.target_model.n_evidence + self.batch_size
        next_update = self.state["last_GP_update"] + self.update_interval
        return current >= self.n_initial_evidence and current >= next_update

    def plot_state(self, **options):
        gp = self.target_model
        if gp.input_dim == 2 and gp.n_evidence > 0:
            # live view: GP-mean contour + acquired points, newest in red
            # (reference ``bolfi.py:318-345`` + ``interactive.py:79-120``)
            from ..visualization import draw_contour
            return draw_contour(
                lambda g: gp.predict(g)[0].ravel(), gp.bounds,
                parameter_names=gp.parameter_names,
                title="GP posterior mean", points=np.asarray(gp.X),
                **options)
        from ..visualization import plot_gp
        return plot_gp(gp, gp.parameter_names)

    def plot_discrepancy(self, axes=None, **kwargs):
        from ..visualization import plot_discrepancy
        return plot_discrepancy(self.target_model,
                                self.target_model.parameter_names,
                                axes=axes, **kwargs)

    def plot_gp(self, axes=None, resol=50, const=None, bounds=None,
                true_params=None, **kwargs):
        from ..visualization import plot_gp
        return plot_gp(self.target_model,
                       self.target_model.parameter_names, axes, resol,
                       const, bounds, true_params, **kwargs)


class BOLFI(BayesianOptimization):
    """Bayesian Optimization for Likelihood-Free Inference
    (Gutmann & Corander 2016; reference ``bolfi.py:400-598``)."""

    def fit(self, n_evidence, threshold=None, bar=True, fused=None,
            vis=None):
        """Fit the GP surrogate to the discrepancy, then extract the
        posterior (reference ``bolfi.py:417-440``).

        ``fused=True`` (auto-enabled when eligible) runs the ENTIRE
        BO loop — LCB acquisition optimization, acquisition noise,
        simulation at the acquired point, GP factor update, and periodic
        hyperparameter refits — as one jitted ``lax.scan`` on device.
        One compile, zero per-iteration host transfers; essential when
        the device is attached over a high-latency link.
        """
        logger.info("BOLFI: Fitting the surrogate model...")
        if n_evidence is None:
            raise ValueError("n_evidence must be specified")
        if fused is None:
            fused = self._fused_eligible() and vis is None
        if fused:
            self._fused_fit(n_evidence)
        else:
            # vis implies the host-driven loop (live plots need per-batch
            # host control, reference ``parameter_inference.py:205-246``)
            self.infer(n_evidence, bar=bar, vis=vis)
        return self.extract_posterior(threshold)

    def _fused_eligible(self):
        from ..compile.compiler import compile_program
        from ..parallel.backends import NativeBackend
        from .bo.acquisition import LCBSC
        prog = compile_program(self.model,
                               (self.target_name,),
                               override_names=tuple(self.parameter_names))
        return (self.pool is None
                and self.batch_size == 1
                and self.n_precomputed_evidence == 0
                and isinstance(self.client, NativeBackend)
                and type(self.acquisition_method) is LCBSC
                and self.acquisition_method.additive_cost is None
                and self.acquisition_method.constraints is None
                and not prog.host
                # the fused scan hardcodes the RBF+bias hyperparameter
                # heuristics; custom kernels go through the standard loop
                and not getattr(self.target_model, "custom_kernel", False)
                and self.state["n_evidence"] == 0)

    def _fused_fit(self, n_evidence):
        """Segmented fused BO: init / per-refit-window acquisition scan /
        refit as three module-level jitted programs (small compiles that
        hit the persistent cache — the monolithic whole-loop variant's
        remote compile ran past 10 minutes — at ~2 dispatches per
        segment)."""
        import jax.numpy as jnp
        from ..compile.compiler import compile_program
        from .bo.gp import _pad_cap

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
            # eager device sqrt, exactly the constant the validated
            # closure design embedded
            noise_std = tuple(np.asarray(jnp.sqrt(jnp.broadcast_to(
                jnp.asarray(noise_var, jnp.float32), (d,)))).tolist())
        else:
            noise_std = None
        betas = jnp.asarray([acq._beta(t) for t in range(max(n_acq, 1))],
                            jnp.float32)
        # reference refit schedule (bolfi.py:289-293): refit when the count
        # crosses n_init and every update_interval points thereafter
        refit = np.zeros(max(n_acq, 1), bool)
        last = n_init
        for t in range(n_acq):
            cur = n_init + t + 1
            if cur >= n_init and cur >= last + self.update_interval:
                refit[t] = True
                last = cur
        refit = jnp.asarray(refit)

        prog_prior = compile_program(self.model, (self.target_name,)
                                     + tuple(self.parameter_names))
        init_fn = prog_prior.traceable(batch_size=n_init)
        prog_sim = compile_program(self.model, (self.target_name,),
                                   override_names=tuple(self.parameter_names))
        sim_fn = prog_sim.traceable(batch_size=1)

        # bounds-scaled kernel distances, same as GPRegression: ell lives
        # in unit-cube units (heuristic 1/3), scales = 1/width per dim
        gp_scales = np.asarray(1.0 / np.maximum(bounds[:, 1] - bounds[:, 0],
                                                1e-12), np.float32)

        master = jax.random.key(self.seed)
        # sub-stream spacing for the loop's own draws: acquisition starts
        # at off+t, acquisition noise at 2*off+t, refit restarts at
        # 3*off+t.  off = max(n_acq, 1000) keeps the streams disjoint for
        # ANY fit length (1000+t / 2000+t / 3000+t collide once
        # n_acq > 1000) while staying bit-identical to the validated
        # streams for the common n_acq <= 1000 case (off = 1000)
        spec = _FusedBOSpec(cap=cap, d=d, n_init=n_init,
                            n_restarts=gp._n_restarts,
                            n_inits_acq=acq.n_inits,
                            rng_off=max(n_acq, 1000),
                            pnames=tuple(self.parameter_names),
                            target_name=self.target_name,
                            lo=tuple(bounds[:, 0].tolist()),
                            hi=tuple(bounds[:, 1].tolist()),
                            noise_std=noise_std,
                            gp_scales=tuple(gp_scales.tolist()),
                            epsilon=float(getattr(acq, "epsilon", 0.0)))

        # static segment boundaries from the refit schedule
        refit_np = np.asarray(refit)
        segments, start = [], 0
        for t in range(n_acq):
            if refit_np[t]:
                segments.append((start, t + 1 - start, True))
                start = t + 1
        if start < n_acq:
            segments.append((start, n_acq - start, False))

        init_jit, segment_jit, refit_jit = _fused_bo_programs(
            spec, init_fn, sim_fn)
        Xc, yc, u, shapes = init_jit(master)
        n = jnp.int32(n_init)
        for seg_start, seg_len, do_refit in segments:
            ts = jnp.arange(seg_start, seg_start + seg_len, dtype=jnp.int32)
            Xc, yc, n = segment_jit(master, Xc, yc, u, n, ts,
                                    betas[seg_start:seg_start + seg_len])
            if do_refit:
                u = refit_jit(master, Xc, yc, u, shapes, n,
                              jnp.int32(seg_start + seg_len - 1))
        Xf, yf, uf = jax.device_get((Xc, yc, u))

        _install_fused_gp(gp, Xf, yf, uf, n_total, n_init, gp_scales)
        self.state["n_evidence"] = n_total
        self.state["n_batches"] = n_total
        self.state["n_sim"] = n_total
        self.state["last_GP_update"] = n_total
        self.objective["n_evidence"] = n_total
        self.objective["n_sim"] = n_total

    def extract_posterior(self, threshold=None):
        if self.state["n_evidence"] == 0:
            raise ValueError("Model is not fitted yet; see fit()")
        prior = ModelPrior(self.model,
                           parameter_names=self.target_model.parameter_names)
        return BolfiPosterior(self.target_model, threshold=threshold,
                              prior=prior, seed=self.seed)

    def sample(self, n_samples, warmup=None, n_chains=4, threshold=None,
               initials=None, algorithm="nuts", sigma_proposals=None,
               n_evidence=None, bar=True, **kwargs):
        """Sample the BOLFI posterior — all chains vmapped on device."""
        if self.state["n_batches"] == 0:
            self.fit(n_evidence)
        if algorithm not in ("nuts", "metropolis"):
            raise ValueError("Unknown posterior sampler")
        posterior = self.extract_posterior(threshold)
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

        # fit data (threshold + GP factorisation) flows through target_args
        # as traced jit arguments: one compiled sampler program serves every
        # fit — closing over it instead costs a full remote XLA compile per
        # sample() call (measured 9-70 s on the TPU tunnel)
        target, target_args = posterior.traceable_logpdf_args()
        if algorithm == "nuts":
            # bounds widths as a diagonal NUTS mass matrix: one stepsize
            # must serve every parameter, and Ricker-like 16x width spreads
            # otherwise leave the widest parameter under-mixed (t3 bias
            # measured at ~2 gt-SD with identity mass)
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
            sigmas = resolve_sigmas(self.target_model.parameter_names,
                                    sigma_proposals,
                                    self.target_model.bounds)
            chains = mcmc.metropolis_chains(n_samples, initials, target,
                                            sigmas, warmup=0,
                                            seed=self.seed,
                                            target_args=target_args,
                                            **kwargs)

        logger.info("%d chains of %d iterations acquired. Effective sample "
                    "size and Rhat for each parameter:", n_chains, n_samples)
        self.ess = {}
        self.rhat = {}
        for ii, node in enumerate(self.target_model.parameter_names):
            self.ess[node] = mcmc.eff_sample_size(chains[:, warmup:, ii])
            self.rhat[node] = mcmc.gelman_rubin_statistic(
                chains[:, warmup:, ii])
            logger.info("%s ESS=%.1f Rhat=%.4f", node, self.ess[node],
                        self.rhat[node])

        return BolfiSample(method_name="BOLFI", chains=chains,
                           parameter_names=self.target_model.parameter_names,
                           warmup=warmup,
                           threshold=float(posterior.threshold),
                           n_sim=self.state["n_evidence"], seed=self.seed)
