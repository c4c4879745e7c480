"""Arbitrary scipy.stats distributions as priors/RVs (reference parity:
``elfi/utils.py:18-23`` resolves any scipy name, ``elfi/model/utils.py:6-34``
wraps any rvs object).  Distributions outside the JAX-native zoo route the
graph through the host executor with per-node seeded RandomStates."""

import numpy as np
import pytest
import scipy.stats as ss

import jax

import elfi_tpu as elfi
from elfi_tpu.ops import distributions as d

KEY = jax.random.key(3)


@pytest.mark.parametrize("name,params", [
    ("gumbel_r", (0.5, 2.0)),
    ("powerlaw", (1.8,)),
    ("skellam", (2.0, 1.0)),          # discrete: logpdf -> logpmf
])
def test_host_adapter_matches_scipy(name, params):
    dist = d.from_name(name)
    assert isinstance(dist, d.ScipyHostDistribution)
    assert dist.host
    x = dist.rvs(*params, size=200, key=KEY)
    assert np.asarray(x).shape == (200,)
    # deterministic per key
    np.testing.assert_array_equal(dist.rvs(*params, size=200, key=KEY), x)
    sdist = getattr(ss, name)
    lp = getattr(sdist, "logpdf", None) or sdist.logpmf
    np.testing.assert_allclose(dist.logpdf(x, *params), lp(x, *params))
    pf = getattr(sdist, "pdf", None) or sdist.pmf
    np.testing.assert_allclose(dist.pdf(x, *params), pf(x, *params))


def test_from_name_unknown_still_raises():
    with pytest.raises(ValueError, match="Unknown distribution"):
        d.from_name("definitely_not_a_distribution")


def test_wrap_if_foreign():
    # JAX-native passes through
    assert d.wrap_if_foreign(d.norm) is d.norm

    class MyJax(d.Distribution):
        @classmethod
        def rvs(cls, size=1, key=None):
            return jax.random.normal(key, (size,))

    assert d.wrap_if_foreign(MyJax) is MyJax

    # duck-typed key-style object passes through
    class Ducked:
        def rvs(self, size=1, key=None):
            return jax.random.normal(key, (size,))

    duck = Ducked()
    assert d.wrap_if_foreign(duck) is duck

    # scipy frozen and unfrozen get wrapped
    for obj in (ss.skewnorm(4), ss.gumbel_r):
        wrapped = d.wrap_if_foreign(obj)
        assert isinstance(wrapped, d.ScipyHostDistribution)


def test_prior_by_scipy_name_end_to_end():
    """elfi.Prior with a scipy-only name runs Rejection end to end via the
    host executor (VERDICT r2 done-criterion)."""
    m = elfi.Model(name="scipy_name_prior")
    p = elfi.Prior("gumbel_r", 0.0, 1.0, model=m, name="p")
    assert m.dag.get_state("p")["host"]

    def sim(t, batch_size=1, key=None, random_state=None, **kw):
        rs = random_state or np.random
        return np.atleast_1d(t)[:, None] + 0.1 * rs.normal(
            size=(batch_size, 2))

    elfi.Simulator(sim, p, observed=np.array([1.0, 1.0]), host=True,
                   model=m, name="sim")
    elfi.Distance("euclidean", m["sim"], model=m, name="dist")
    res = elfi.Rejection(m["dist"], batch_size=100, seed=7).sample(
        20, n_sim=1000, bar=False)
    assert res.n_samples == 20
    # posterior concentrates near the observed location
    assert abs(np.mean(res.samples["p"]) - 1.0) < 1.0
    # deterministic per seed
    res2 = elfi.Rejection(m["dist"], batch_size=100, seed=7).sample(
        20, n_sim=1000, bar=False)
    np.testing.assert_array_equal(res.samples_array, res2.samples_array)


def test_prior_frozen_scipy_end_to_end():
    """elfi.Prior(ss.skewnorm(4)) — a frozen scipy object — runs Rejection
    end to end (VERDICT r2 done-criterion)."""
    m = elfi.Model(name="scipy_frozen_prior")
    p = elfi.Prior(ss.skewnorm(4), model=m, name="p")
    assert m.dag.get_state("p")["host"]

    def sim(t, batch_size=1, key=None, random_state=None, **kw):
        rs = random_state or np.random
        return np.atleast_1d(t)[:, None] + 0.1 * rs.normal(
            size=(batch_size, 2))

    elfi.Simulator(sim, p, observed=np.array([0.7, 0.7]), host=True,
                   model=m, name="sim")
    elfi.Distance("euclidean", m["sim"], model=m, name="dist")
    res = elfi.Rejection(m["dist"], batch_size=100, seed=11).sample(
        20, n_sim=1000, bar=False)
    assert res.n_samples == 20
    assert np.all(np.isfinite(res.samples_array))


def test_prior_t_is_device_native_now():
    """elfi.Prior('t', 3) traces on device (t joined the JAX zoo) — the
    fused rejection path still applies."""
    m = elfi.Model(name="t_prior")
    p = elfi.Prior("t", 3, model=m, name="p")
    assert not m.dag.get_state("p").get("host", False)

    import jax.numpy as jnp

    def sim(t, batch_size=1, key=None):
        return t[:, None] + 0.1 * jax.random.normal(key, (batch_size, 2))

    elfi.Simulator(sim, p, observed=np.array([0.5, 0.5]), model=m,
                   name="sim")
    elfi.Distance("euclidean", m["sim"], model=m, name="dist")
    res = elfi.Rejection(m["dist"], batch_size=256, seed=5).sample(
        50, n_sim=2048, bar=False)
    assert res.n_samples == 50
    assert jnp.isfinite(jnp.asarray(res.samples_array)).all()


def test_smc_with_scipy_host_prior():
    """Host-path scipy priors flow through the full SMC machinery too
    (ModelPrior rvs/logpdf, GM proposals, weighting)."""
    m = elfi.Model(name="scipy_smc")
    elfi.Prior("gumbel_r", 0.5, 0.3, model=m, name="p")

    def sim(t, batch_size=1, random_state=None, **kw):
        return np.atleast_1d(t)[:, None] + 0.1 * random_state.normal(
            size=(batch_size, 2))

    elfi.Simulator(sim, m["p"], observed=np.array([0.8, 0.8]), host=True,
                   model=m, name="sim")
    elfi.Distance("euclidean", m["sim"], model=m, name="dist")
    res = elfi.SMC(m["dist"], batch_size=200, seed=3).sample(
        100, thresholds=[0.5, 0.3, 0.2], bar=False)
    assert res.n_samples == 100
    assert abs(float(np.mean(res.samples["p"])) - 0.8) < 0.3


def test_model_prior_with_host_distribution():
    m = elfi.Model(name="host_prior_model")
    elfi.Prior(ss.gumbel_r(0.0, 1.0), model=m, name="a")
    elfi.Prior("uniform", 0, 2, model=m, name="b")
    prior = elfi.ModelPrior(m)
    x = prior.rvs(size=50, seed=4)
    assert x.shape == (50, 2)
    lp = prior.logpdf(x)
    want = ss.gumbel_r(0.0, 1.0).logpdf(x[:, 0]) \
        + ss.uniform(0, 2).logpdf(x[:, 1])
    np.testing.assert_allclose(lp, want, rtol=1e-5, atol=1e-5)
    g = prior.gradient_logpdf(x[:3])
    assert g.shape == (3, 2)
    with pytest.raises(ValueError, match="host-path"):
        prior.traceable_logpdf()


def test_unseedable_rvs_still_deterministic():
    """An rvs callable WITHOUT the random_state kwarg must still give
    draws that are a pure function of the key (the deterministic-replay
    contract behind batch retry / cluster replay): the adapter seeds the
    global numpy stream around the call and restores the caller's
    state afterwards."""
    class NoSeed:
        def rvs(self, size=1):
            return np.random.normal(size=size)

    dist = d.ScipyHostDistribution(NoSeed())
    saved = np.random.get_state()
    a = dist.rvs(size=32, key=KEY)
    b = dist.rvs(size=32, key=KEY)
    np.testing.assert_array_equal(a, b)     # same key -> same bits
    c = dist.rvs(size=32, key=jax.random.key(4))
    assert not np.array_equal(a, c)         # different key -> new stream
    after = np.random.get_state()           # caller's stream untouched
    assert saved[0] == after[0]
    np.testing.assert_array_equal(saved[1], after[1])
    assert saved[2:] == after[2:]


def test_seedable_rvs_param_error_surfaces():
    """Once rvs is known to accept random_state, a TypeError from bad
    parameters must propagate instead of being retried unseeded."""
    dist = d.ScipyHostDistribution("gumbel_r")
    dist.rvs(0.0, 1.0, size=3, key=KEY)     # resolves seedability
    assert dist._rvs_seedable is True
    with pytest.raises(TypeError):
        dist.rvs(0.0, 1.0, 2.0, 3.0, size=3, key=KEY)
