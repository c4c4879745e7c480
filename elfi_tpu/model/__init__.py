from .model import (AdaptiveDistance, ComputationContext, Constant,  # noqa: F401
                    Discrepancy, Distance, Model, NodeReference, Operation,
                    Prior, RandomVariable, Simulator, Summary,
                    get_default_model, new_model, set_default_model)
from .extensions import ModelPrior, ScipyLikeDistribution  # noqa: F401
from . import tools  # noqa: F401
