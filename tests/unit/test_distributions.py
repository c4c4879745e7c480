import numpy as np
import pytest
import scipy.stats as ss

import jax

from elfi_tpu.ops import distributions as d


KEY = jax.random.key(7)


@pytest.mark.parametrize("dist,params,ss_dist", [
    (d.uniform, (1.0, 3.0), ss.uniform(1.0, 3.0)),
    (d.norm, (2.0, 0.5), ss.norm(2.0, 0.5)),
    (d.expon, (0.0, 2.0), ss.expon(0.0, 2.0)),
    (d.gamma, (3.0, 0.0, 2.0), ss.gamma(3.0, 0.0, 2.0)),
    (d.beta, (2.0, 5.0), ss.beta(2.0, 5.0)),
    (d.lognorm, (0.5, 0.0, 1.0), ss.lognorm(0.5, 0.0, 1.0)),
    (d.truncnorm, (-1.0, 2.0, 0.5, 1.5), ss.truncnorm(-1.0, 2.0, 0.5, 1.5)),
    (d.t, (3.0, 0.5, 2.0), ss.t(3.0, 0.5, 2.0)),
    (d.cauchy, (1.0, 2.0), ss.cauchy(1.0, 2.0)),
    (d.laplace, (0.5, 1.5), ss.laplace(0.5, 1.5)),
    (d.chi2, (4.0, 0.0, 1.5), ss.chi2(4.0, 0.0, 1.5)),
    (d.skewnorm, (4.0, 0.5, 2.0), ss.skewnorm(4.0, 0.5, 2.0)),
    (d.weibull_min, (1.8, 0.0, 2.0), ss.weibull_min(1.8, 0.0, 2.0)),
])
def test_logpdf_matches_scipy(dist, params, ss_dist):
    x = np.asarray(ss_dist.rvs(size=50, random_state=np.random.RandomState(0)),
                   np.float32)
    ours = np.asarray(dist.logpdf(x, *params))
    theirs = ss_dist.logpdf(x)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("dist,params,ss_dist", [
    (d.uniform, (1.0, 3.0), ss.uniform(1.0, 3.0)),
    (d.norm, (2.0, 0.5), ss.norm(2.0, 0.5)),
    (d.expon, (0.0, 2.0), ss.expon(0.0, 2.0)),
    (d.gamma, (3.0, 0.0, 2.0), ss.gamma(3.0, 0.0, 2.0)),
    (d.truncnorm, (-1.0, 2.0, 0.5, 1.5), ss.truncnorm(-1.0, 2.0, 0.5, 1.5)),
    (d.t, (5.0, 0.5, 2.0), ss.t(5.0, 0.5, 2.0)),
    (d.laplace, (0.5, 1.5), ss.laplace(0.5, 1.5)),
    (d.chi2, (4.0, 0.0, 1.5), ss.chi2(4.0, 0.0, 1.5)),
    (d.skewnorm, (4.0, 0.5, 2.0), ss.skewnorm(4.0, 0.5, 2.0)),
    (d.weibull_min, (1.8, 0.0, 2.0), ss.weibull_min(1.8, 0.0, 2.0)),
])
def test_rvs_moments(dist, params, ss_dist):
    x = np.asarray(dist.rvs(*params, size=20000, key=KEY))
    assert x.shape == (20000,)
    np.testing.assert_allclose(x.mean(), ss_dist.mean(), atol=0.05)
    np.testing.assert_allclose(x.std(), ss_dist.std(), rtol=0.1)


def test_rvs_support():
    x = np.asarray(d.uniform.rvs(1.0, 3.0, size=1000, key=KEY))
    assert x.min() >= 1.0 and x.max() <= 4.0
    x = np.asarray(d.truncnorm.rvs(-1.0, 2.0, 0.0, 1.0, size=1000, key=KEY))
    assert x.min() >= -1.0 and x.max() <= 2.0


def test_mvn():
    mean = np.array([1.0, -1.0])
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    x = np.asarray(d.multivariate_normal.rvs(mean, cov, size=20000, key=KEY))
    assert x.shape == (20000, 2)
    np.testing.assert_allclose(x.mean(0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(x.T), cov, atol=0.1)
    lp = np.asarray(d.multivariate_normal.logpdf(x[:10], mean, cov))
    np.testing.assert_allclose(lp, ss.multivariate_normal(mean, cov)
                               .logpdf(x[:10]), rtol=1e-4, atol=1e-4)


def test_batched_params():
    locs = np.linspace(0, 10, 100).astype(np.float32)
    x = np.asarray(d.norm.rvs(locs, 1e-4, size=100, key=KEY))
    np.testing.assert_allclose(x, locs, atol=1e-2)


def test_gradient_logpdf():
    g = np.asarray(d.norm.gradient_logpdf(np.float32(1.0), 0.0, 1.0))
    np.testing.assert_allclose(g, -1.0, rtol=1e-5)


def test_from_name():
    assert d.from_name("uniform") is d.uniform
    assert d.from_name("normal") is d.norm
    with pytest.raises(ValueError):
        d.from_name("nope")


def test_custom_distribution_pdf_from_logpdf():
    class MyDist(d.Distribution):
        @classmethod
        def logpdf(cls, x, a):
            return -np.abs(x) * a

    assert np.isclose(np.asarray(MyDist.pdf(0.0, 1.0)), 1.0)


def test_cdf_ppf_match_scipy():
    import scipy.stats as ss
    from elfi_tpu.ops import distributions as d

    x = np.linspace(-3, 8, 23)
    q = np.linspace(0.01, 0.99, 9)
    cases = [
        (d.uniform.cdf(x, 1, 3), ss.uniform.cdf(x, 1, 3)),
        (d.uniform.ppf(q, 1, 3), ss.uniform.ppf(q, 1, 3)),
        (d.norm.cdf(x, 1, 2), ss.norm.cdf(x, 1, 2)),
        (d.norm.ppf(q, 1, 2), ss.norm.ppf(q, 1, 2)),
        (d.truncnorm.cdf(x, -1, 2, 1, 2), ss.truncnorm.cdf(x, -1, 2, 1, 2)),
        (d.truncnorm.ppf(q, -1, 2, 1, 2), ss.truncnorm.ppf(q, -1, 2, 1, 2)),
        (d.lognorm.cdf(x, 0.5, 0, 2), ss.lognorm.cdf(x, 0.5, 0, 2)),
        (d.lognorm.ppf(q, 0.5, 0, 2), ss.lognorm.ppf(q, 0.5, 0, 2)),
        (d.expon.cdf(x, 0.5, 2), ss.expon.cdf(x, 0.5, 2)),
        (d.expon.ppf(q, 0.5, 2), ss.expon.ppf(q, 0.5, 2)),
        (d.gamma.cdf(x, 2.5, 0, 1.5), ss.gamma.cdf(x, 2.5, 0, 1.5)),
        (d.beta.cdf(np.linspace(-.2, 1.2, 15), 2, 3),
         ss.beta.cdf(np.linspace(-.2, 1.2, 15), 2, 3)),
        (d.cauchy.cdf(x, 1, 2), ss.cauchy.cdf(x, 1, 2)),
        (d.cauchy.ppf(q, 1, 2), ss.cauchy.ppf(q, 1, 2)),
        (d.laplace.cdf(x, 0.5, 1.5), ss.laplace.cdf(x, 0.5, 1.5)),
        (d.laplace.ppf(q, 0.5, 1.5), ss.laplace.ppf(q, 0.5, 1.5)),
        (d.t.cdf(x, 3, 0.5, 2), ss.t.cdf(x, 3, 0.5, 2)),
        (d.chi2.cdf(x, 4, 0, 1.5), ss.chi2.cdf(x, 4, 0, 1.5)),
        (d.skewnorm.cdf(x, 4, 0.5, 2), ss.skewnorm.cdf(x, 4, 0.5, 2)),
        (d.weibull_min.cdf(x, 1.8, 0, 2), ss.weibull_min.cdf(x, 1.8, 0, 2)),
        (d.weibull_min.ppf(q, 1.8, 0, 2), ss.weibull_min.ppf(q, 1.8, 0, 2)),
    ]
    for got, want in cases:
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-6)


def test_gamma_beta_ppf_match_scipy():
    # bisection-inverted cdf: slightly looser tolerance than closed forms
    import scipy.stats as ss
    from elfi_tpu.ops import distributions as d

    q = np.array([0.0, 0.01, 0.25, 0.5, 0.9, 0.999, 1.0], dtype=np.float32)
    for a in [0.5, 1.0, 3.7]:
        np.testing.assert_allclose(
            np.asarray(d.gamma.ppf(q, a, 1.0, 2.0)),
            ss.gamma.ppf(q, a, 1.0, 2.0), rtol=2e-4, atol=1e-5)
    for a, b in [(0.5, 0.5), (2.0, 5.0)]:
        np.testing.assert_allclose(
            np.asarray(d.beta.ppf(q, a, b, -1.0, 3.0)),
            ss.beta.ppf(q, a, b, -1.0, 3.0), rtol=2e-4, atol=2e-5)
    qmid = np.array([0.05, 0.25, 0.5, 0.9, 0.99], dtype=np.float32)
    for df in [2.0, 7.0]:
        np.testing.assert_allclose(
            np.asarray(d.t.ppf(qmid, df, 0.5, 2.0)),
            ss.t.ppf(qmid, df, 0.5, 2.0), rtol=5e-4, atol=1e-4)


def test_ppf_nan_outside_unit_interval():
    from elfi_tpu.ops import distributions as d

    bad = np.array([-0.1, 1.1], dtype=np.float32)
    for dist, args in [(d.uniform, ()), (d.expon, ()), (d.gamma, (2.0,)),
                       (d.beta, (2.0, 3.0)), (d.truncnorm, (-1.0, 1.0)),
                       (d.norm, ()), (d.lognorm, (0.5,)), (d.cauchy, ()),
                       (d.laplace, ()), (d.t, (3.0,)),
                       (d.weibull_min, (1.8,))]:
        out = np.asarray(dist.ppf(bad, *args))
        assert np.all(np.isnan(out)), (dist.name, out)


@pytest.mark.parametrize("dist,params", [
    (d.uniform, (1.0, 3.0)), (d.norm, (2.0, 0.5)),
    (d.expon, (0.0, 2.0)), (d.gamma, (3.0, 0.0, 2.0)),
    (d.beta, (2.0, 5.0)), (d.lognorm, (0.5, 0.0, 1.0)),
    (d.truncnorm, (-1.0, 2.0, 0.5, 1.5)), (d.t, (3.0,)),
    (d.cauchy, ()), (d.laplace, ()), (d.chi2, (4.0,)),
    (d.skewnorm, (4.0,)), (d.weibull_min, (1.8,)),
    (d.binom, (10, 0.3)), (d.poisson, (2.5,)),
    (d.levy_stable, (1.7, 0.5)),
])
def test_distribution_contract(dist, params):
    """Reference conftest's distribution_test parity
    (``/root/reference/tests/conftest.py:242-308``): rvs/pdf/logpdf obey
    scipy shape conventions, including tuple sizes and batched params."""
    x = np.asarray(dist.rvs(*params, size=7, key=KEY))
    assert x.shape == (7,)
    x2 = np.asarray(dist.rvs(*params, size=(7,), key=KEY))
    assert x2.shape == (7,)
    np.testing.assert_array_equal(x, x2)
    if hasattr(dist, "logpdf") and dist is not d.levy_stable:
        lp = np.asarray(dist.logpdf(x, *params))
        assert lp.shape == x.shape
        pdf = np.asarray(dist.pdf(x, *params))
        assert pdf.shape == x.shape
        finite = np.isfinite(lp)
        np.testing.assert_allclose(pdf[finite], np.exp(lp[finite]),
                                   rtol=1e-4)
    if params and np.ndim(params[0]) == 0:
        # batched leading parameter (hierarchical priors)
        batched = (np.full(7, params[0], np.float32),) + params[1:]
        xb = np.asarray(dist.rvs(*batched, size=7, key=KEY))
        assert xb.shape == (7,)
