"""Synthetic-likelihood estimators for BSL
(reference ``elfi/methods/bsl/pdf_methods.py``).

These run once per MCMC round on a small (n_sim_round, d) summary matrix —
host-side numpy/scipy linear algebra; the expensive part (the simulations)
already ran on device."""

from __future__ import annotations

import logging
import math
from functools import partial

import numpy as np
import scipy.stats as ss
from scipy.special import loggamma

from .cov_warton import corr_warton, cov_warton
from .gaussian_copula_density import gaussian_copula_density
from .gaussian_rank_corr import gaussian_rank_corr

logger = logging.getLogger(__name__)

__all__ = ["standard_likelihood", "unbiased_likelihood",
           "semiparametric_likelihood", "robust_likelihood",
           "gaussian_syn_likelihood", "gaussian_syn_likelihood_ghurye_olkin",
           "semi_param_kernel_estimate", "syn_likelihood_misspec", "wcon"]


# -- factories (reference ``pdf_methods.py:19-74``) --------------------------

def standard_likelihood(shrinkage=None, penalty=None, whitening=None,
                        standardise=False):
    return partial(gaussian_syn_likelihood, shrinkage=shrinkage,
                   penalty=penalty, whitening=whitening,
                   standardise=standardise)


def unbiased_likelihood():
    return gaussian_syn_likelihood_ghurye_olkin


def semiparametric_likelihood(shrinkage=None, penalty=None, whitening=None):
    return partial(semi_param_kernel_estimate, shrinkage=shrinkage,
                   penalty=penalty, whitening=whitening)


def robust_likelihood(adjustment):
    return partial(syn_likelihood_misspec, adjustment=adjustment)


# -- helpers --------------------------------------------------------------------

def _mvn_logpdf(y, mean, cov):
    """MVN logpdf robust to ill-conditioned covariances (-inf on failure)."""
    try:
        return float(ss.multivariate_normal.logpdf(y, mean=mean, cov=cov))
    except (np.linalg.LinAlgError, ValueError):
        logger.warning("Unable to compute logpdf due to poor sample cov")
        return -math.inf


def _apply_shrinkage(cov, shrinkage, penalty, ssx=None, mean=None,
                     standardise=False):
    if shrinkage is None:
        return cov
    if shrinkage == "warton":
        return cov_warton(cov, 1 - penalty)
    if shrinkage == "glasso":
        from sklearn.covariance import graphical_lasso
        if standardise and ssx is not None:
            std = np.sqrt(np.diag(cov))
            zs = (ssx - mean) / std
            cov = np.atleast_2d(np.cov(zs, rowvar=False))
        return graphical_lasso(cov, alpha=penalty, max_iter=200)[0]
    raise ValueError(f"Unknown shrinkage method {shrinkage!r}")


# -- estimators ------------------------------------------------------------------

def gaussian_syn_likelihood(ssx, ssy, shrinkage=None, penalty=None,
                            whitening=None, standardise=False):
    """Standard Gaussian synthetic likelihood (Price et al. 2018; reference
    ``pdf_methods.py:77-135``), with optional glasso / Warton shrinkage and
    whitening decorrelation."""
    ssx = np.asarray(ssx, np.float64)
    ssy = np.squeeze(np.asarray(ssy, np.float64))
    if whitening is not None:
        ssy = whitening @ ssy
        ssx = ssx @ whitening.T
    mean = ssx.mean(0)
    cov = np.atleast_2d(np.cov(ssx, rowvar=False))
    cov = _apply_shrinkage(cov, shrinkage, penalty, ssx=ssx, mean=mean,
                           standardise=standardise)
    return np.array([_mvn_logpdf(ssy, mean, cov)])


def wcon(k, nu):
    """log c(k, nu) from Ghurye & Olkin (1969) (reference
    ``pdf_methods.py:319-341``)."""
    args = [0.5 * (nu - x) for x in range(k)]
    return (-k * nu / 2 * math.log(2) - k * (k - 1) / 4 * math.log(math.pi)
            - float(np.sum(loggamma(args))))


def gaussian_syn_likelihood_ghurye_olkin(ssx, ssy):
    """Unbiased synthetic-likelihood estimator (Ghurye & Olkin; reference
    ``pdf_methods.py:138-176``)."""
    ssx = np.asarray(ssx, np.float64)
    n, d = ssx.shape
    mu = ssx.mean(0).reshape(-1, 1)
    sigma = np.cov(ssx.T)
    y = np.asarray(ssy, np.float64).reshape(-1, 1)
    psi = (n - 1) * sigma - (y - mu) @ (y - mu).T / (1 - 1 / n)
    try:
        sign_s, logdet_sigma = np.linalg.slogdet(np.atleast_2d(sigma))
        sign_p, logdet_psi = np.linalg.slogdet(np.atleast_2d(psi))
        if sign_p <= 0:
            return np.array([-math.inf])
        A = wcon(d, n - 2) - wcon(d, n - 1) - 0.5 * d * math.log(1 - 1 / n)
        # NOTE: log|(n-1) Sigma| = d log(n-1) + log|Sigma|.  The reference
        # omits the factor d (``pdf_methods.py:167``), which only shifts the
        # result by a theta-independent constant (harmless for MCMC); we use
        # the exact Ghurye & Olkin constant.
        B = -0.5 * (n - d - 2) * (d * math.log(n - 1) + logdet_sigma)
        C = 0.5 * (n - d - 3) * logdet_psi
        loglik = -0.5 * d * math.log(2 * math.pi) + A + B + C
    except np.linalg.LinAlgError:
        loglik = -math.inf
    return np.array([loglik])


def semi_param_kernel_estimate(ssx, ssy, shrinkage=None, penalty=None,
                               whitening=None):
    """Semiparametric synthetic likelihood (An et al. 2020; reference
    ``pdf_methods.py:179-264``): Gaussian-KDE marginals + Gaussian copula
    with gaussian-rank correlation."""
    ssx = np.asarray(ssx, np.float64)
    ssy = np.squeeze(np.asarray(ssy, np.float64))
    n, ns = ssx.shape

    logpdf_y = np.zeros(ns)
    y_u = np.zeros(ns)
    sim_eta = np.zeros((n, ns))
    eta_cov = None
    for j in range(ns):
        col = ssx[:, j]
        kde = ss.gaussian_kde(col, bw_method="silverman")
        logpdf_y[j] = kde.logpdf(ssy[j]).item()
        y_u[j] = min(1.0, kde.integrate_box_1d(-np.inf, ssy[j]))
        if whitening is not None:
            sim_eta[:, j] = ss.norm.ppf(ss.rankdata(col) / (n + 1))

    rho_hat = gaussian_rank_corr(ssx)
    if whitening is not None:
        eta_cov = np.cov(sim_eta.T)
        rho_hat = gaussian_rank_corr(sim_eta @ whitening.T)

    if shrinkage == "glasso":
        from sklearn.covariance import graphical_lasso
        cov = np.cov(ssx, rowvar=False)
        std = np.sqrt(np.diag(cov))
        cov = np.outer(std, std) * rho_hat
        cov = graphical_lasso(cov, alpha=penalty)[0]
        std = np.sqrt(np.diag(cov))
        rho_hat = np.outer(1 / std, 1 / std) * cov
    elif shrinkage == "warton":
        rho_hat = corr_warton(rho_hat, 1 - penalty)
    elif shrinkage is not None:
        raise ValueError(f"Unknown shrinkage method {shrinkage!r}")

    copula = gaussian_copula_density(rho_hat, y_u, whitening, eta_cov)
    return np.array([copula + np.sum(logpdf_y)])


def syn_likelihood_misspec(ssx, ssy, gamma, adjustment):
    """Robust synthetic likelihood with mean/variance adjustment
    (Frazier & Drovandi 2021; reference ``pdf_methods.py:267-316``)."""
    ssx = np.asarray(ssx, np.float64)
    ssy = np.squeeze(np.asarray(ssy, np.float64))
    mean = ssx.mean(0)
    cov = np.atleast_2d(np.cov(ssx, rowvar=False))
    std = np.sqrt(np.diag(cov))
    if adjustment == "mean":
        mean = mean + std * gamma
    elif adjustment == "variance":
        cov = cov + np.diag((std * gamma) ** 2)
    else:
        raise ValueError("adjustment must be 'mean' or 'variance'")
    return _mvn_logpdf(ssy, mean, cov)


# -- traceable (device) estimators for the fused BSL chain -------------------

def _t_mvn_logpdf(y, mean, cov):
    """jnp MVN logpdf; -inf when the covariance is not PD (the Cholesky
    yields NaNs, mirroring ``_mvn_logpdf``'s failure path)."""
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    d = y.shape[0]
    L = jnp.linalg.cholesky(cov)
    sol = jsl.solve_triangular(L, y - mean, lower=True)
    val = -0.5 * (d * jnp.log(2 * jnp.pi)
                  + 2 * jnp.sum(jnp.log(jnp.diag(L)))
                  + jnp.sum(sol * sol))
    return jnp.where(jnp.isfinite(val), val, -jnp.inf)


def _t_cov_warton(S, gamma):
    import jax.numpy as jnp
    d = jnp.sqrt(jnp.diag(S) + 1e-5)
    R = S / jnp.outer(d, d)
    ns = S.shape[0]
    return (gamma * R + (1 - gamma) * jnp.eye(ns)) * jnp.outer(d, d)


def _t_ghurye_olkin(ssx, ssy):
    import jax.numpy as jnp
    n, d = ssx.shape
    mu = jnp.mean(ssx, axis=0)
    sigma = jnp.atleast_2d(jnp.cov(ssx.T))
    diff = (ssy - mu)[:, None]
    psi = (n - 1) * sigma - diff @ diff.T / (1 - 1 / n)
    sign_s, logdet_sigma = jnp.linalg.slogdet(sigma)
    sign_p, logdet_psi = jnp.linalg.slogdet(psi)
    A = wcon(d, n - 2) - wcon(d, n - 1) - 0.5 * d * math.log(1 - 1 / n)
    B = -0.5 * (n - d - 2) * (d * math.log(n - 1) + logdet_sigma)
    C = 0.5 * (n - d - 3) * logdet_psi
    val = -0.5 * d * math.log(2 * math.pi) + A + B + C
    return jnp.where((sign_p > 0) & jnp.isfinite(val), val, -jnp.inf)


def traceable_likelihood(likelihood):
    """jnp-traceable ``(ssx, ssy) -> scalar loglik`` equivalent of a host
    estimator for embedding in the fused BSL scan, or ``None`` when the
    estimator has no traceable form (glasso shrinkage, semiparametric KDE,
    misspecification adjustments stay on the host path)."""
    import jax.numpy as jnp

    if likelihood is None or likelihood is gaussian_syn_likelihood:
        fn, kw = gaussian_syn_likelihood, {}
    elif likelihood is gaussian_syn_likelihood_ghurye_olkin:
        return _t_ghurye_olkin
    elif isinstance(likelihood, partial) \
            and likelihood.func is gaussian_syn_likelihood:
        fn, kw = gaussian_syn_likelihood, dict(likelihood.keywords)
    else:
        return None
    shrinkage = kw.get("shrinkage")
    penalty = kw.get("penalty")
    whitening = kw.get("whitening")
    if shrinkage not in (None, "warton") or kw.get("standardise", False):
        return None
    W = None if whitening is None else jnp.asarray(whitening, jnp.float32)

    def fn_t(ssx, ssy):
        if W is not None:
            ssy = W @ ssy
            ssx = ssx @ W.T
        mean = jnp.mean(ssx, axis=0)
        cov = jnp.atleast_2d(jnp.cov(ssx, rowvar=False))
        if shrinkage == "warton":
            cov = _t_cov_warton(cov, 1 - penalty)
        return _t_mvn_logpdf(ssy, mean, cov)

    return fn_t
