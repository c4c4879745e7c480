"""elfi_tpu — a TPU-native engine for likelihood-free inference.

A from-scratch re-design of the capabilities of ELFI (elfi-dev/elfi): the
user declares a generative model as a DAG of priors, simulators, summaries
and distances, and runs likelihood-free inference against it.  Unlike the
reference — which interprets a networkx graph per batch on the host and
farms pickled graphs to process/cluster workers — this engine traces the
declared DAG once into jitted, vmapped JAX/XLA programs with counter-based
per-batch RNG, keeps the inference hot loops (simulation megabatches,
top-N selection, GP surrogates, MCMC chains, SMC populations) on device,
and shards the batch axis across a TPU mesh over ICI.

Flat namespace parity with the reference (``elfi/__init__.py:9-29``).
"""

from . import _precision  # noqa: F401  (matmul precision = highest, see module docstring)
from .model import (AdaptiveDistance, ComputationContext, Constant,  # noqa: F401
                    Discrepancy, Distance, Model, ModelPrior, NodeReference,
                    Operation, Prior, RandomVariable, Simulator, Summary,
                    get_default_model, new_model, set_default_model)
from .model.model import load_model  # noqa: F401
from .ops.distributions import Distribution  # noqa: F401
from .parallel import (BatchHandler, ClusterBackend,  # noqa: F401
                       MultiprocessingBackend, NativeBackend,
                       ShardedBackend, get_client, reset_client, set_client)
from .methods import (BOLFI, BOLFIRE, BSL, ROMC, SMC, AdaptiveDistanceSMC,  # noqa: F401
                      AdaptiveThresholdSMC, BayesianOptimization,
                      GPRegression, ModelBased, OptimizationResult,
                      ParameterInference, Rejection, Sample, SmcSample)
from .methods.results import (BolfiSample, BolfireSample, BslSample,  # noqa: F401
                              RomcSample)
from .methods import mcmc  # noqa: F401
from .store import ArrayPool, OutputPool  # noqa: F401
from .visualization import (draw, nx_draw, plot_params_vs_node,  # noqa: F401
                            plot_predicted_summaries)
from .model import tools  # noqa: F401
from .methods import (LinearAdjustment, TwoStageSelection,  # noqa: F401
                      adjust_posterior, compare_models)
from .testbench import Testbench, TestbenchMethod  # noqa: F401

# Reference API aliases: elfi.ElfiModel == elfi_tpu.Model and the JAX GP
# answers to the reference surrogate's name (``elfi.GPyRegression``,
# reference ``elfi/__init__.py:29``) so ported scripts run unchanged.
ElfiModel = Model
GPyRegression = GPRegression

__version__ = "0.1.0"
