"""BOLFIRE: Bayesian Optimization and classification for Likelihood-Free
Inference by Ratio Estimation (reference
``elfi/methods/inference/bolfire.py``).

Per round: simulate ``n_training_data`` datasets at the acquired theta (one
jitted device batch), train a classifier against pre-generated marginal
data, and feed the negative log-ratio at the observed features to the JAX
GP surrogate.  Posterior sampling runs vmapped device NUTS."""

from __future__ import annotations

import logging

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

    def fit(self, n_evidence, bar=True):
        logger.info("BOLFIRE: Fitting the surrogate model...")
        if isinstance(n_evidence, int) and n_evidence > 0:
            if n_evidence < self.n_evidence:
                logger.warning("Requesting less evidence than already exists")
            return self.infer(n_evidence, bar=bar)
        raise TypeError("n_evidence must be a positive integer")

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
