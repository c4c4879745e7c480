import numpy as np
import pytest

import jax

from elfi_tpu.methods import utils as mu


def test_arr_batch_roundtrip():
    x = np.random.RandomState(0).rand(10, 3)
    batch = mu.arr2d_to_batch(x, ["a", "b", "c"])
    back = mu.batch_to_arr2d(batch, ["a", "b", "c"])
    np.testing.assert_array_equal(x, back)


def test_weighted_var_matches_numpy_unweighted():
    x = np.random.RandomState(1).rand(50, 2)
    np.testing.assert_allclose(mu.weighted_var(x),
                               np.var(x, axis=0, ddof=1), rtol=1e-10)


def test_weighted_var_weighted():
    x = np.array([[0.0], [1.0], [2.0]])
    w = np.array([1.0, 1.0, 0.0])
    # only first two points count: mean .5, unbiased var .25/(1-.5)= .5
    np.testing.assert_allclose(mu.weighted_var(x, w), [0.5])


def test_weighted_sample_quantile():
    x = np.arange(10.0)
    assert mu.weighted_sample_quantile(x, 0.5) == 4.0
    w = np.zeros(10); w[7] = 1.0
    assert mu.weighted_sample_quantile(x, 0.5, w) == 7.0


def test_compute_ess():
    assert np.isclose(mu.compute_ess(np.ones(100)), 100.0)
    w = np.zeros(100); w[0] = 1
    assert np.isclose(mu.compute_ess(w), 1.0)


def test_gm_distribution():
    means = np.array([[0.0], [5.0]])
    key = jax.random.key(0)
    x = np.asarray(mu.GMDistribution.rvs(means, cov=0.25,
                                         weights=[0.5, 0.5], size=20000,
                                         key=key))
    # bimodal: half near 0, half near 5
    frac_near_5 = np.mean(x > 2.5)
    assert 0.45 < frac_near_5 < 0.55
    lp = np.asarray(mu.GMDistribution.logpdf(np.array([[0.0], [5.0], [2.5]]),
                                             means, 0.25, [0.5, 0.5]))
    assert lp[0] > lp[2] and lp[1] > lp[2]


def test_gm_rvs_prior_filter():
    means = np.array([[0.0], [5.0]])

    class FakePrior:
        def logpdf(self, x):
            x = np.atleast_2d(np.asarray(x))
            return np.where(x[:, 0] > 0, 0.0, -np.inf)

    x = np.asarray(mu.GMDistribution.rvs(means, cov=0.25, weights=[.5, .5],
                                         size=500, prior_logpdf=FakePrior().logpdf,
                                         key=jax.random.key(1)))
    assert np.all(x > 0)


def test_resolve_sigmas():
    s = mu.resolve_sigmas(["a", "b"], None, [(0, 10), (0, 20)])
    np.testing.assert_allclose(s, [1.0, 2.0])
    s = mu.resolve_sigmas(["a", "b"], {"b": 3.0, "a": 1.0})
    np.testing.assert_allclose(s, [1.0, 3.0])
