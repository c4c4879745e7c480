"""MA2 model with the fused Pallas distance kernel
(:func:`elfi_tpu.ops.pallas_kernels.ma2_distance`).

The whole simulate->summarise->distance pipeline runs in one TPU kernel
(in-VMEM Box-Muller noise, no HBM intermediates), so rejection throughput
is compute-bound (~3 Gsims/s kernel-side) instead of HBM-bound.  Noise
streams come from the TPU per-core PRNG: results are deterministic per
(seed, batch_index) but not bitwise-equal to the XLA-path MA2 model —
posteriors are statistically equivalent (see tests)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from ..ops.pallas_kernels import ma2_distance
from .ma2 import MA2, CustomPrior1, CustomPrior2, autocov

__all__ = ["get_model"]


class _PallasMA2Distance:
    """Picklable stochastic op: (t1, t2) -> distances via the kernel."""

    def __init__(self, observed_autocovs, n_obs):
        self.obs = np.asarray(observed_autocovs, np.float32)
        self.n_obs = n_obs

    def __call__(self, t1, t2, batch_size, key):
        return ma2_distance(t1, t2, self.obs, n_obs=self.n_obs,
                            batch_size=batch_size, key=key)


def get_model(n_obs=100, true_params=None, seed_obs=None):
    """MA2 inference model whose discrepancy node IS the fused kernel."""
    if true_params is None:
        true_params = [.6, .2]
    y = np.asarray(MA2(jnp.asarray([true_params[0]]),
                       jnp.asarray([true_params[1]]), n_obs=n_obs,
                       batch_size=1, key=jax.random.key(seed_obs or 0)))[0]
    obs = np.array([float(autocov(y[None])[0]),
                    float(autocov(y[None], lag=2)[0])])
    m = elfi.Model(name="MA2_pallas")
    elfi.Prior(CustomPrior1, 2, model=m, name="t1")
    elfi.Prior(CustomPrior2, m["t1"], 1, model=m, name="t2")
    elfi.Operation(_PallasMA2Distance(obs, n_obs), m["t1"], m["t2"],
                   stochastic=True, uses_batch_size=True, model=m, name="d")
    return m
