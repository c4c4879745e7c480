"""BayesianOptimization and BOLFI (reference
``elfi/methods/inference/bolfi.py``).

TPU-native differences: the surrogate is the JAX GP
(:mod:`elfi_tpu.methods.bo.gp`) whose predict/gradient programs are jitted;
posterior sampling runs ALL chains vmapped on one chip through the
traceable BOLFI target (the reference farms one Python NUTS chain per
client worker, ``bolfi.py:541-580``)."""

from __future__ import annotations

import logging

import numpy as np

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


class BayesianOptimization(ParameterInference):
    """GP-surrogate optimization of the target node (reference
    ``bolfi.py:26-397``)."""

    def __init__(self, model, target_name=None, bounds=None,
                 initial_evidence=None, update_interval=10, target_model=None,
                 acquisition_method=None, acq_noise_var=0,
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
        x_min, _ = stochastic_optimization(self.target_model.predict_mean,
                                           self.target_model.bounds,
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
        from ..visualization import plot_gp
        return plot_gp(self.target_model,
                       self.target_model.parameter_names)

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

    def fit(self, n_evidence, threshold=None, bar=True):
        """Fit the GP surrogate to the discrepancy, then extract the
        posterior (reference ``bolfi.py:417-440``)."""
        logger.info("BOLFI: Fitting the surrogate model...")
        if n_evidence is None:
            raise ValueError("n_evidence must be specified")
        self.infer(n_evidence, bar=bar)
        return self.extract_posterior(threshold)

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
            inds = np.argsort(np.asarray(self.target_model.Y)[:, 0])
            candidates = np.asarray(self.target_model.X)[inds]
            ok = np.isfinite(posterior.logpdf(candidates))
            candidates = candidates[ok]
            if len(candidates) < n_chains:
                raise ValueError("BOLFI.sample: cannot find enough "
                                 "acceptable initialization points")
            initials = candidates[:n_chains]

        target = posterior.traceable_logpdf()
        if algorithm == "nuts":
            chains = mcmc.nuts_chains(n_samples, initials, target,
                                      n_adapt=warmup, seed=self.seed,
                                      **kwargs)
        else:
            sigmas = resolve_sigmas(self.target_model.parameter_names,
                                    sigma_proposals,
                                    self.target_model.bounds)
            chains = mcmc.metropolis_chains(n_samples, initials, target,
                                            sigmas, warmup=0,
                                            seed=self.seed, **kwargs)

        print(f"{n_chains} chains of {n_samples} iterations acquired. "
              "Effective sample size and Rhat for each parameter:")
        for ii, node in enumerate(self.target_model.parameter_names):
            print(node,
                  mcmc.eff_sample_size(chains[:, warmup:, ii]),
                  mcmc.gelman_rubin_statistic(chains[:, warmup:, ii]))

        return BolfiSample(method_name="BOLFI", chains=chains,
                           parameter_names=self.target_model.parameter_names,
                           warmup=warmup,
                           threshold=float(posterior.threshold),
                           n_sim=self.state["n_evidence"], seed=self.seed)
