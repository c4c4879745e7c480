"""Special functions needed by acquisition rules, in traceable JAX.

The reference leans on ``scipy.stats.skewnorm.cdf`` (which computes Owen's T
internally) for the MaxVar-family acquisitions
(``elfi/methods/bo/acquisition.py:392-469``).  Here Owen's T is computed
with fixed-order Gauss-Legendre quadrature of its integral definition —
fully traceable, so the same expressions run inside jitted optimizers and
device-side NUTS."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = ["owens_t", "skewnorm_cdf", "norm_cdf", "norm_logcdf"]

# 32-point Gauss-Legendre nodes/weights on [0, 1] — kept as NUMPY at
# module scope: a module-level jnp.asarray would initialise the JAX
# backend at import time, which breaks processes that must pick their
# platform AFTER importing the package (`python -m elfi_tpu.worker`
# imports elfi_tpu before it can force CPU; with the axon TPU plugin
# registered, import-time init grabbed the TPU in every cluster worker)
_GL_X_NP, _GL_W_NP = np.polynomial.legendre.leggauss(32)
_GL_X_NP = ((_GL_X_NP + 1.0) / 2.0).astype(np.float32)
_GL_W_NP = (_GL_W_NP / 2.0).astype(np.float32)


def owens_t(h, a):
    """Owen's T function T(h, a) = 1/(2*pi) * int_0^a exp(-h^2(1+x^2)/2)/(1+x^2) dx.

    Gauss-Legendre quadrature after substituting x = a*u, u in [0,1];
    odd in ``a`` (T(h,-a) = -T(h,a)), even in ``h``.
    """
    h = jnp.asarray(h, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    h, a = jnp.broadcast_arrays(h, a)
    hh = h[..., None]
    aa = a[..., None]
    x = aa * jnp.asarray(_GL_X_NP)
    integrand = jnp.exp(-0.5 * hh * hh * (1.0 + x * x)) / (1.0 + x * x)
    return jnp.sum(jnp.asarray(_GL_W_NP) * aa * integrand,
                   axis=-1) / (2.0 * jnp.pi)


def norm_cdf(x, loc=0.0, scale=1.0):
    return jsp.ndtr((jnp.asarray(x) - loc) / scale)


def norm_logcdf(x, loc=0.0, scale=1.0):
    return jsp.log_ndtr((jnp.asarray(x) - loc) / scale)


def skewnorm_cdf(x, a, loc=0.0, scale=1.0):
    """CDF of the skew-normal: Phi(z) - 2*T(z, a) with z standardized."""
    z = (jnp.asarray(x) - loc) / scale
    return jnp.clip(jsp.ndtr(z) - 2.0 * owens_t(z, a), 0.0, 1.0)
