"""Vectorised distance operations between batched summary vectors and the
observed summary vector.

The reference delegates to ``scipy.spatial.distance.cdist`` on the host
(``elfi/model/elfi_model.py:974-1045``).  Here each metric is a pure JAX
function over the whole batch — it fuses into the simulator/summary program
under jit, so the distance costs one pass over VMEM-resident data instead of
a host round-trip.

Weighted-metric semantics follow ``scipy.spatial.distance`` exactly
(verified against ``cdist`` in ``tests/unit/test_distances.py``); note
scipy's weighted chebyshev treats ``w`` as a mask (``w > 0`` keeps the
coordinate), not a scale.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["stack_summaries", "distance_op", "adaptive_distance_op", "METRICS"]


def stack_summaries(summaries):
    """Column-stack summaries into a (batch, d) matrix, flattening event dims
    (the reference's implicit ``np.column_stack`` convention)."""
    cols = []
    for s in summaries:
        s = jnp.asarray(s)
        if s.ndim == 0:
            s = s[None, None]
        elif s.ndim == 1:
            s = s[:, None]
        else:
            s = s.reshape(s.shape[0], -1)
        cols.append(s)
    return jnp.concatenate(cols, axis=1)


def _euclidean(u, v, w=None):
    d = u - v
    if w is not None:
        d = d * jnp.sqrt(w)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def _sqeuclidean(u, v, w=None):
    d = u - v
    if w is not None:
        d = d * jnp.sqrt(w)
    return jnp.sum(d * d, axis=-1)


def _cityblock(u, v, w=None):
    d = jnp.abs(u - v)
    if w is not None:
        d = d * w
    return jnp.sum(d, axis=-1)


def _chebyshev(u, v, w=None):
    d = jnp.abs(u - v)
    if w is not None:
        # scipy semantics: w is a coordinate mask (w > 0 keeps), not a scale.
        d = jnp.where(w > 0, d, -jnp.inf)
    return jnp.max(d, axis=-1)


def _canberra(u, v, w=None):
    num = jnp.abs(u - v)
    den = jnp.abs(u) + jnp.abs(v)
    t = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    if w is not None:
        t = t * w
    return jnp.sum(t, axis=-1)


def _braycurtis(u, v, w=None):
    dn = jnp.abs(u - v)
    dd = jnp.abs(u + v)
    if w is not None:
        dn = dn * w
        dd = dd * w
    num = jnp.sum(dn, axis=-1)
    den = jnp.sum(dd, axis=-1)
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def _cosine(u, v, w=None):
    if w is None:
        w = 1.0
    un = jnp.sqrt(jnp.sum(w * u * u, axis=-1))
    vn = jnp.sqrt(jnp.sum(w * v * v, axis=-1))
    return 1.0 - jnp.sum(w * u * v, axis=-1) / (un * vn)


def _correlation(u, v, w=None):
    if w is None:
        umean = jnp.mean(u, axis=-1, keepdims=True)
        vmean = jnp.mean(v, axis=-1, keepdims=True)
    else:
        wsum = jnp.sum(w)
        umean = jnp.sum(w * u, axis=-1, keepdims=True) / wsum
        vmean = jnp.sum(w * v, axis=-1, keepdims=True) / wsum
    return _cosine(u - umean, v - vmean, w)


def _hamming(u, v, w=None):
    ne = (u != v).astype(u.dtype if jnp.issubdtype(u.dtype, jnp.floating)
          else jnp.float32)
    if w is None:
        return jnp.mean(ne, axis=-1)
    return jnp.sum(w * ne, axis=-1) / jnp.sum(w)


def _jensenshannon(u, v, w=None):
    # scipy normalises each row to a probability vector and uses natural log.
    p = u / jnp.sum(u, axis=-1, keepdims=True)
    q = v / jnp.sum(v, axis=-1, keepdims=True)
    m = 0.5 * (p + q)

    def _kl_term(a, b):
        ratio = jnp.where(a > 0, a / jnp.where(a > 0, b, 1.0), 1.0)
        return jnp.where(a > 0, a * jnp.log(ratio), 0.0)

    js = 0.5 * jnp.sum(_kl_term(p, m) + _kl_term(q, m), axis=-1)
    return jnp.sqrt(jnp.maximum(js, 0.0))


def _minkowski_factory(p):
    def _minkowski(u, v, w=None):
        d = jnp.abs(u - v)
        if w is not None:
            d = d * w ** (1.0 / p)
        return jnp.sum(d ** p, axis=-1) ** (1.0 / p)
    return _minkowski


def _seuclidean_factory(V):
    V = jnp.asarray(V, dtype=jnp.float32)

    def _seuclidean(u, v, w=None):
        d = u - v
        return jnp.sqrt(jnp.sum(d * d / V, axis=-1))
    return _seuclidean


def _mahalanobis_factory(VI):
    VI = jnp.asarray(VI, dtype=jnp.float32)

    def _mahalanobis(u, v, w=None):
        d = u - v
        return jnp.sqrt(jnp.einsum("...i,ij,...j->...", d, VI, d))
    return _mahalanobis


METRICS = {
    "euclidean": _euclidean,
    "sqeuclidean": _sqeuclidean,
    "cityblock": _cityblock,
    "manhattan": _cityblock,
    "chebyshev": _chebyshev,
    "canberra": _canberra,
    "braycurtis": _braycurtis,
    "cosine": _cosine,
    "correlation": _correlation,
    "hamming": _hamming,
    "jensenshannon": _jensenshannon,
}

# Metrics whose scipy implementation accepts a weight vector ``w``.
_WEIGHTED = frozenset({
    "euclidean", "sqeuclidean", "cityblock", "manhattan", "chebyshev",
    "canberra", "braycurtis", "cosine", "correlation", "hamming",
    "minkowski", "wminkowski",
})


class DistanceOp:
    """Picklable discrepancy op ``op(*summaries, observed) -> (batch,)``
    (ops must survive pickling for process-pool backends, like the
    reference's loaded graphs do).

    ``p``/``w``/``V``/``VI`` follow ``scipy.spatial.distance.cdist``:
    ``p`` for minkowski, ``w`` a non-negative weight vector, ``V`` the
    variance vector for seuclidean, ``VI`` the inverse covariance for
    mahalanobis.
    """

    def __init__(self, metric, p=None, w=None, V=None, VI=None):
        if metric in ("minkowski", "wminkowski"):
            if p is None:
                raise ValueError("minkowski distance requires p")
        elif metric == "seuclidean":
            if V is None:
                raise ValueError("seuclidean distance requires V "
                                 "(variance vector)")
        elif metric == "mahalanobis":
            if VI is None:
                raise ValueError("mahalanobis distance requires VI "
                                 "(inverse covariance matrix)")
        elif metric not in METRICS:
            raise ValueError(
                f"Unknown metric {metric!r}. Available: "
                f"{sorted(METRICS) + ['minkowski', 'seuclidean', 'mahalanobis']}")
        if w is not None and metric not in _WEIGHTED:
            raise ValueError(
                f"metric {metric!r} does not support a weight vector w "
                "(scipy cdist semantics)")
        self.metric = metric
        self.p = p
        self.w = None if w is None else jnp.asarray(w)
        self.V = None if V is None else np.asarray(V)
        self.VI = None if VI is None else np.asarray(VI)

    def _base(self):
        if self.metric in ("minkowski", "wminkowski"):
            return _minkowski_factory(float(self.p))
        if self.metric == "seuclidean":
            return _seuclidean_factory(self.V)
        if self.metric == "mahalanobis":
            return _mahalanobis_factory(self.VI)
        return METRICS[self.metric]

    def __call__(self, *summaries, observed):
        u = stack_summaries(summaries)
        v = stack_summaries(observed)
        return self._base()(u, v, self.w)

    def __getstate__(self):
        return {"metric": self.metric, "p": self.p,
                "w": None if self.w is None else np.asarray(self.w),
                "V": self.V, "VI": self.VI}

    def __setstate__(self, st):
        self.__init__(st["metric"], st["p"], st["w"],
                      st.get("V"), st.get("VI"))


def distance_op(metric, p=None, w=None, V=None, VI=None):
    """Build a discrepancy op ``fn(*summaries, observed) -> (batch,)``."""
    return DistanceOp(metric, p=p, w=w, V=V, VI=VI)


class CallableDistanceOp:
    """Wrap a user metric ``metric(u, v) -> (batch,)`` as a discrepancy op."""

    def __init__(self, metric):
        self.metric = metric

    def __call__(self, *summaries, observed):
        u = stack_summaries(summaries)
        v = stack_summaries(observed)
        return self.metric(u, v)


class AdaptiveDistanceOp:
    """Discrepancy op for :class:`~elfi_tpu.model.model.AdaptiveDistance`:
    one weighted-euclidean column per accumulated weight vector ``w``
    (``None`` = unweighted), reference ``elfi_model.py:1135-1151``.

    ``holder['w']`` is a host-side list; the model cache is invalidated when
    it grows, so each round retraces with the current weights baked in as
    constants."""

    def __init__(self, holder):
        self.holder = holder

    def __call__(self, *summaries, observed):
        u = stack_summaries(summaries)
        v = stack_summaries(observed)
        cols = []
        for w in self.holder.get("w", [None]):
            if w is None:
                cols.append(_euclidean(u, v))
            else:
                wv = jnp.asarray(w)
                cols.append(_euclidean(u * wv, v * wv))
        return jnp.stack(cols, axis=1)


def adaptive_distance_op(state_holder):
    return AdaptiveDistanceOp(state_holder)
