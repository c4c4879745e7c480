"""g-and-k model with the fused Pallas distance kernel
(:func:`elfi_tpu.ops.pallas_kernels.gnk_distance`).

The whole simulate -> order-statistics -> distance pipeline runs in one
TPU kernel: normals and the quantile transform stay in VMEM, the sort is
an in-register bitonic network over sublanes, and only the (batch,)
distances are written — the XLA path (``models/gnk.py``, reference
``elfi/examples/gnk.py``) materialises and sorts the (batch, n_obs)
sample in HBM.  Noise streams come from the TPU per-core PRNG: results
are deterministic per (seed, batch_index) but not bitwise-equal to the
XLA-path model — posteriors are statistically equivalent (see tests)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from ..ops.pallas_kernels import gnk_distance
from .gnk import GNK

__all__ = ["get_model"]


class _PallasGnkDistance:
    """Picklable stochastic op: (A, B, g, k) -> distances via the kernel."""

    def __init__(self, observed_sorted, n_obs):
        self.obs = np.sort(np.asarray(observed_sorted, np.float32).ravel())
        self.n_obs = n_obs

    def __call__(self, A, B, g, k, batch_size, key):
        return gnk_distance(A, B, g, k, self.obs, n_obs=self.n_obs,
                            batch_size=batch_size, key=key)


def get_model(n_obs=50, true_params=None, seed_obs=None):
    """g-and-k inference model whose discrepancy node IS the fused kernel
    (same priors/observed-data protocol as ``models/gnk.get_model``)."""
    if true_params is None:
        true_params = [3, 1, 2, .5]
    y_obs = np.asarray(GNK(*[jnp.asarray([p], jnp.float32)
                             for p in true_params], n_obs=n_obs,
                           batch_size=1,
                           key=jax.random.key(seed_obs or 0)))[0]
    m = elfi.Model(name="gnk_pallas")
    priors = [elfi.Prior("uniform", 0, 10, model=m, name=n)
              for n in ["A", "B", "g", "k"]]
    elfi.Operation(_PallasGnkDistance(y_obs, n_obs), *priors,
                   stochastic=True, uses_batch_size=True, model=m,
                   name="d")
    return m
