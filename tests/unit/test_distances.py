"""Every built-in metric must agree with ``scipy.spatial.distance.cdist``
(the reference's implementation, ``elfi/model/elfi_model.py:974-1045``),
including weighted variants and the V/VI kwargs."""

import numpy as np
import pytest
from scipy.spatial.distance import cdist

from elfi_tpu.ops.distances import distance_op

RNG = np.random.default_rng(42)
U = RNG.normal(size=(7, 5)).astype(np.float32)
V_OBS = RNG.normal(size=(1, 5)).astype(np.float32)
W = RNG.uniform(0.5, 2.0, size=5).astype(np.float32)

SIMPLE = ["euclidean", "sqeuclidean", "cityblock", "chebyshev", "canberra",
          "braycurtis", "cosine", "correlation"]


def _run(op, u=U, v=V_OBS):
    return np.asarray(op(u, observed=(v,)))


@pytest.mark.parametrize("metric", SIMPLE)
def test_unweighted_matches_cdist(metric):
    got = _run(distance_op(metric))
    want = cdist(U, V_OBS, metric).ravel()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("metric", SIMPLE)
def test_weighted_matches_cdist(metric):
    got = _run(distance_op(metric, w=W))
    want = cdist(U, V_OBS, metric, w=W).ravel()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_chebyshev_weight_is_mask():
    w = np.array([1.0, 0.0, 2.0, 0.0, 1.0], dtype=np.float32)
    got = _run(distance_op("chebyshev", w=w))
    want = cdist(U, V_OBS, "chebyshev", w=w).ravel()
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("p", [1.0, 1.5, 3.0])
def test_minkowski(p):
    got = _run(distance_op("minkowski", p=p))
    want = cdist(U, V_OBS, "minkowski", p=p).ravel()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    got_w = _run(distance_op("minkowski", p=p, w=W))
    want_w = cdist(U, V_OBS, "minkowski", p=p, w=W).ravel()
    np.testing.assert_allclose(got_w, want_w, rtol=2e-5, atol=1e-6)


def test_hamming():
    ub = (U > 0).astype(np.float32)
    vb = (V_OBS > 0).astype(np.float32)
    got = _run(distance_op("hamming"), ub, vb)
    want = cdist(ub, vb, "hamming").ravel()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_w = _run(distance_op("hamming", w=W), ub, vb)
    want_w = cdist(ub, vb, "hamming", w=W).ravel()
    np.testing.assert_allclose(got_w, want_w, rtol=1e-6)


def test_jensenshannon():
    up = np.abs(U) + 0.1
    vp = np.abs(V_OBS) + 0.1
    got = _run(distance_op("jensenshannon"), up, vp)
    want = cdist(up, vp, "jensenshannon").ravel()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_seuclidean():
    var = RNG.uniform(0.5, 2.0, size=5).astype(np.float32)
    got = _run(distance_op("seuclidean", V=var))
    want = cdist(U, V_OBS, "seuclidean", V=var).ravel()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_mahalanobis():
    X = RNG.normal(size=(30, 5))
    VI = np.linalg.inv(np.cov(X.T)).astype(np.float32)
    got = _run(distance_op("mahalanobis", VI=VI))
    want = cdist(U, V_OBS, "mahalanobis", VI=VI).ravel()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_required_kwargs_enforced():
    with pytest.raises(ValueError, match="requires p"):
        distance_op("minkowski")
    with pytest.raises(ValueError, match="requires V"):
        distance_op("seuclidean")
    with pytest.raises(ValueError, match="requires VI"):
        distance_op("mahalanobis")
    with pytest.raises(ValueError, match="Unknown metric"):
        distance_op("nosuchmetric")


def test_unsupported_weight_raises():
    with pytest.raises(ValueError, match="does not support a weight"):
        distance_op("jensenshannon", w=W)
    with pytest.raises(ValueError, match="does not support a weight"):
        distance_op("seuclidean", V=np.ones(5), w=W)


def test_distance_node_passes_V_VI():
    import elfi_tpu as elfi
    m = elfi.new_model("dist_kwargs_test")
    p = elfi.Prior("uniform", 0, 1, model=m, name="p")
    sim = elfi.Simulator(
        lambda t, **kw: t[:, None] * np.ones(5),
        p, observed=0.5 * np.ones(5), model=m, name="sim")
    var = np.linspace(0.5, 1.5, 5)
    d = elfi.Distance("seuclidean", sim, V=var, model=m, name="d")
    out = m.generate(batch_size=4, outputs=["sim", "d"], seed=3)
    want = cdist(np.asarray(out["sim"]), 0.5 * np.ones((1, 5)),
                 "seuclidean", V=var).ravel()
    np.testing.assert_allclose(out["d"], want, rtol=2e-5, atol=1e-6)
