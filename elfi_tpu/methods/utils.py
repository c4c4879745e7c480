"""Shared method-layer utilities (reference ``elfi/methods/utils.py``),
re-implemented on JAX where they sit in hot paths (GM proposal sampling,
weighted statistics) and numpy where they are host-side bookkeeping."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "arr2d_to_batch", "batch_to_arr2d", "ceil_to_batch_size",
    "normalize_weights", "compute_ess", "weighted_var",
    "weighted_sample_quantile", "sample_quantile", "GMDistribution",
    "numgrad", "flat_array_to_dict",
]


def arr2d_to_batch(x, names):
    """(n, d) array -> batch dict keyed by sorted parameter names
    (reference ``utils.py:42-65``)."""
    x = np.atleast_2d(x)
    if x.shape[1] != len(names):
        raise ValueError(f"Array width {x.shape[1]} != len(names) {len(names)}")
    return {name: x[:, i] for i, name in enumerate(names)}


def batch_to_arr2d(batch, names):
    """Batch dict -> (n, d) array, columns in ``names`` order
    (reference ``utils.py:13-39``)."""
    if not names:
        return np.empty((0, 0))
    cols = []
    for n in names:
        c = np.asarray(batch[n])
        cols.append(c.reshape(c.shape[0], -1) if c.ndim > 1 else c[:, None])
    return np.concatenate(cols, axis=1)


def ceil_to_batch_size(n, batch_size):
    return int(batch_size * np.ceil(n / batch_size))


def normalize_weights(weights):
    w = np.atleast_1d(np.asarray(weights, np.float64))
    s = w.sum()
    if s == 0:
        raise ValueError("All weights are zero")
    return w / s


def compute_ess(weights):
    """Kish effective sample size (reference ``utils.py:91-105``)."""
    w = normalize_weights(weights)
    return 1.0 / np.sum(w ** 2)


def weighted_var(x, weights=None):
    """Unbiased weighted variance per dimension (reference
    ``utils.py:108-139``)."""
    x = np.atleast_2d(np.asarray(x, np.float64).reshape(len(x), -1))
    if weights is None:
        return np.var(x, axis=0, ddof=1)
    w = normalize_weights(weights)
    mean = np.sum(w[:, None] * x, axis=0)
    return np.sum(w[:, None] * (x - mean) ** 2, axis=0) / (1 - np.sum(w ** 2))


def weighted_sample_quantile(x, alpha, weights=None):
    """alpha-quantile of a weighted sample (reference ``utils.py:379-411``):
    smallest x whose cumulative normalized weight reaches alpha."""
    x = np.asarray(x, np.float64).ravel()
    order = np.argsort(x)
    xs = x[order]
    if weights is None:
        w = np.full(len(x), 1.0 / len(x))
    else:
        w = normalize_weights(np.asarray(weights).ravel()[order])
    cum = np.cumsum(w)
    idx = int(np.searchsorted(cum, alpha, side="left"))
    return float(xs[min(idx, len(xs) - 1)])


sample_quantile = weighted_sample_quantile


def flat_array_to_dict(names, arr):
    """1-D parameter vector -> {name: scalar-array} (reference
    ``utils.py:414-457``)."""
    arr = np.atleast_1d(arr)
    return {name: np.atleast_1d(arr[i]) for i, name in enumerate(names)}


def resolve_sigmas(parameter_names, sigma_proposals=None, bounds=None):
    """Resolve Metropolis proposal stds; default 1/10 of bound lengths
    (reference ``utils.py:460-500``)."""
    if sigma_proposals is None:
        if bounds is None:
            raise ValueError("Either sigma_proposals or bounds is required")
        return np.array([(b[1] - b[0]) / 10 for b in bounds])
    if isinstance(sigma_proposals, dict):
        return np.array([sigma_proposals[n] for n in parameter_names])
    return np.asarray(sigma_proposals)


def numgrad(fn, x, h=1e-5):
    """Numeric central-difference gradient kept for API parity with the
    reference (``utils.py:275-314``); prefer ``jax.grad``."""
    x = np.asarray(x, np.float64).ravel()
    g = np.zeros_like(x)
    for i in range(len(x)):
        e = np.zeros_like(x)
        e[i] = h
        g[i] = (fn(x + e) - fn(x - e)) / (2 * h)
    return g


class GMDistribution:
    """Gaussian mixture with shared covariance — the SMC proposal
    (reference ``elfi/methods/utils.py:142-272``), on device.

    ``means``: (m, d); ``cov``: (d, d) shared; ``weights``: (m,).
    """

    @staticmethod
    def _prepare(means, cov, weights):
        means = jnp.atleast_2d(jnp.asarray(means, jnp.float32))
        d = means.shape[1]
        cov = jnp.asarray(cov, jnp.float32)
        if cov.ndim < 2:
            cov = jnp.eye(d) * cov
        if weights is None:
            weights = jnp.ones(means.shape[0]) / means.shape[0]
        else:
            w = jnp.asarray(weights, jnp.float32)
            weights = w / jnp.sum(w)
        return means, cov, weights

    @classmethod
    def rvs(cls, means, cov=1, weights=None, size=1, prior_logpdf=None,
            key=None):
        """Draw ``size`` proposal points; if ``prior_logpdf`` is given,
        rejection-resample draws outside the prior support (reference
        ``utils.py:200-261``) — a host loop over jitted redraw rounds with
        fixed shapes (XLA-friendly: no data-dependent shapes on device)."""
        if key is None:
            raise ValueError("GMDistribution.rvs requires a PRNG key")
        means, cov, weights = cls._prepare(means, cov, weights)
        L = jnp.linalg.cholesky(cov)

        @jax.jit
        def draw(k):
            k1, k2 = jax.random.split(k)
            comp = jax.random.choice(k1, means.shape[0], (size,), p=weights)
            z = jax.random.normal(k2, (size, means.shape[1]))
            return means[comp] + z @ L.T

        out = draw(key)
        if prior_logpdf is not None:
            for round_i in range(1000):
                ok = np.isfinite(np.asarray(prior_logpdf(out))) \
                    & np.all(np.isfinite(np.asarray(out)), axis=1)
                if ok.all():
                    break
                key = jax.random.fold_in(key, round_i + 1)
                redraw = draw(key)
                out = jnp.where(ok[:, None], out, redraw)
            else:
                raise RuntimeError(
                    "Could not draw proposal points inside the prior support")
        return out

    @classmethod
    def rvs_traced(cls, means, cov, weights, size, prior_logpdf, key):
        """Fully traceable ``rvs`` for embedding inside fused scans (the
        prior-support redraw becomes a ``lax.while_loop``).  Mirrors
        :meth:`rvs`'s key folding exactly, so for the same inputs both
        paths produce bit-identical draws (tested)."""
        means, cov, weights = cls._prepare(means, cov, weights)
        L = jnp.linalg.cholesky(cov)

        def draw(k):
            k1, k2 = jax.random.split(k)
            comp = jax.random.choice(k1, means.shape[0], (size,), p=weights)
            z = jax.random.normal(k2, (size, means.shape[1]))
            return means[comp] + z @ L.T

        out = draw(key)
        if prior_logpdf is None:
            return out

        def ok_of(o):
            return jnp.isfinite(jnp.asarray(prior_logpdf(o))) \
                & jnp.all(jnp.isfinite(o), axis=1)

        def cond(c):
            o, _, i = c
            return (~jnp.all(ok_of(o))) & (i < 1000)

        def body(c):
            o, k, i = c
            k = jax.random.fold_in(k, i + 1)
            redraw = draw(k)
            ok = ok_of(o)
            return jnp.where(ok[:, None], o, redraw), k, i + 1

        out, _, _ = jax.lax.while_loop(cond, body,
                                       (out, key, jnp.int32(0)))
        return out

    @classmethod
    def logpdf(cls, x, means, cov=1, weights=None):
        means, cov, weights = cls._prepare(means, cov, weights)
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        d = means.shape[1]
        L = jnp.linalg.cholesky(cov)
        diff = x[:, None, :] - means[None, :, :]          # (n, m, d)
        sol = jax.scipy.linalg.solve_triangular(
            L, diff.reshape(-1, d).T, lower=True).T.reshape(diff.shape)
        quad = jnp.sum(sol * sol, axis=-1)                 # (n, m)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
        lognorm = -0.5 * (d * jnp.log(2 * jnp.pi) + logdet)
        comp = lognorm - 0.5 * quad + jnp.log(weights)[None, :]
        return jax.scipy.special.logsumexp(comp, axis=1)

    @classmethod
    def pdf(cls, x, means, cov=1, weights=None):
        return jnp.exp(cls.logpdf(x, means, cov, weights))


def sample_object_to_dict(data, elem, skip=""):
    """Flatten a result object's attributes into ``data`` for JSON export
    (reference ``methods/utils.py:317-340``): ``outputs`` (redundant with
    ``samples``/``discrepancies``) and ``skip`` are omitted; ``meta`` entries
    are inlined at the top level."""
    omit = {"outputs", skip}
    for key, val in vars(elem).items():
        if key in omit:
            continue
        if key == "meta":
            data.update(val)
        else:
            data[key] = val


def numpy_to_python_type(data):
    """In-place conversion of numpy scalars/arrays (one level of nesting) to
    plain Python types for JSON serialization (reference
    ``methods/utils.py:342-376``)."""
    def _convert(v):
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        return v

    for key, val in data.items():
        if isinstance(val, dict):
            for k2, v2 in val.items():
                val[k2] = _convert(v2)
        else:
            data[key] = _convert(val)
