from .base import ModelBased, ParameterInference  # noqa: F401
from .results import (BolfireSample, BolfiSample, BslSample,  # noqa: F401
                      OptimizationResult, ParameterInferenceResult,
                      RomcSample, Sample, SmcSample)
from .samplers import (AdaptiveDistanceSMC, AdaptiveThresholdSMC,  # noqa: F401
                       Rejection, SMC)
