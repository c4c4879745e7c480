"""ROMC end-to-end tests on a 1D conjugate-style Gaussian example
(mirrors the reference's ``tests/functional/test_romc.py`` setup)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import elfi_tpu as elfi


pytestmark = pytest.mark.slow  # excluded from the fast CI gate

def build_gauss_1d(seed_obs=1):
    """theta ~ U(-2.5, 2.5); data ~ N(theta, 1); summary = mean."""
    m = elfi.Model(name="romc_gauss")
    elfi.Prior("uniform", -2.5, 5.0, model=m, name="theta")

    def sim(theta, batch_size, key):
        return theta[:, None] + jax.random.normal(key, (batch_size, 5))

    y = np.asarray(sim(jnp.asarray([1.0]), 1, jax.random.key(seed_obs)))[0]
    elfi.Simulator(sim, m["theta"], observed=y, model=m, name="sim")
    elfi.Summary(lambda x: jnp.mean(x, axis=1), m["sim"], model=m, name="S")
    elfi.Distance("euclidean", m["S"], model=m, name="d")
    return m, float(np.mean(y))


@pytest.fixture(scope="module")
def romc_fitted():
    m, obs_mean = build_gauss_1d()
    romc = elfi.ROMC(m["d"], bounds=[(-2.5, 2.5)], seed=3)
    romc.solve_problems(n1=30, seed=7)
    # objectives are SQUARED distances; with exact autodiff optima the
    # f_min quantile degenerates to ~0, so use an explicit threshold as in
    # the reference's own tests (eps=.75 there)
    romc.estimate_regions(eps_filter=0.2)
    return romc, obs_mean


def test_solve_problems(romc_fitted):
    romc, _ = romc_fitted
    assert sum(romc.inference_state["solved"]) >= 25
    f_mins = [p.result.f_min for p in romc.optim_problems
              if p.state["solved"]]
    # exact autodiff optimisation: squared distances at optimum ~ 0
    assert np.median(f_mins) < 1e-3


def test_regions(romc_fitted):
    romc, _ = romc_fitted
    n_regions = len(romc.posterior.regions)
    assert n_regions >= 20
    for region in romc.posterior.regions[:5]:
        assert region.volume > 0
        assert region.contains(region.center)


def test_sampling_posterior_mean(romc_fitted):
    romc, obs_mean = romc_fitted
    res = romc.sample(n2=50, seed=5)
    assert res.n_samples == len(romc.posterior.regions) * 50
    w = res.weights
    assert np.sum(w) > 0
    post_mean = np.sum(res.samples["theta"] * w) / np.sum(w)
    # posterior of theta | mean(y) concentrates near the observed mean
    assert abs(post_mean - obs_mean) < 0.5
    ess = romc.compute_ess()
    assert ess > 10


def test_eval_posterior(romc_fitted):
    romc, obs_mean = romc_fitted
    theta = np.linspace(-2.4, 2.4, 25)[:, None]
    pdf = romc.eval_posterior(theta)
    assert np.all(pdf >= 0)
    # normalized: grid-integral close to 1
    integral = np.sum(pdf) * (theta[1, 0] - theta[0, 0])
    assert 0.6 < integral < 1.4
    # highest density near the observed mean
    assert abs(theta[np.argmax(pdf), 0] - obs_mean) < 0.6


def test_expectation(romc_fitted):
    romc, obs_mean = romc_fitted
    romc.sample(n2=50, seed=5)
    mean = romc.compute_expectation(lambda t: np.squeeze(t, -1))
    assert abs(mean - obs_mean) < 0.5


def test_local_surrogates():
    m, obs_mean = build_gauss_1d()
    romc = elfi.ROMC(m["d"], bounds=[(-2.5, 2.5)], seed=3)
    romc.fit_posterior(n1=15, eps_filter=0.2, seed=7, fit_models=True)
    res = romc.sample(n2=30, seed=4)
    w = res.weights
    post_mean = np.sum(res.samples["theta"] * w) / np.sum(w)
    assert abs(post_mean - obs_mean) < 0.6


def test_romc_2d(ma2):
    romc = elfi.ROMC(ma2["d"], bounds=[(-2, 2), (-1, 1)], seed=1)
    romc.solve_problems(n1=20, seed=2)
    assert romc.compute_eps(quantile=0.9) < 0.1  # exact optima
    romc.estimate_regions(eps_filter=0.05)
    res = romc.sample(n2=20, seed=3)
    assert res.samples["t1"].shape == (len(romc.posterior.regions) * 20,)
    assert np.sum(res.weights) > 0


def test_romc_gnk_end_to_end():
    """BASELINE.md config: ROMC on the 4-d g-and-k model (dict bounds,
    multi-restart gradient solves)."""
    from elfi_tpu.models import gnk

    m = gnk.get_model(n_obs=50, seed_obs=2)
    romc = elfi.ROMC(m["d"], bounds={p: (0.0, 10.0)
                                     for p in m.parameter_names}, seed=3)
    romc.solve_problems(n1=20, use_bo=False)
    eps = romc.compute_eps(0.5)
    assert np.isfinite(eps)
    romc.estimate_regions(eps_filter=eps)
    res = romc.sample(n2=10)
    means = res.sample_means
    assert set(means) == set(m.parameter_names)
    for v in means.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_romc_bo_path_with_batched_surrogate_regions():
    """ROMC with deterministic-BO solves (reference ``romc.py:1446-1500``)
    end to end: GP surrogates per problem, batched surrogate region
    construction (stacked GP factors, one vmapped line-search program),
    posterior sampling through the surrogates."""
    m, obs_mean = build_gauss_1d()
    romc = elfi.ROMC(m["d"], bounds=[(-2.5, 2.5)], seed=11)
    romc.solve_problems(n1=6, use_bo=True,
                        optimizer_args={"n_evidence": 14}, seed=13)
    assert romc.inference_state["_has_fitted_surrogate_model"]
    romc.estimate_regions(eps_filter=0.5)
    built = [p for p in romc.optim_problems if p.state["region"]]
    assert built, "no regions built via the surrogate path"
    assert all(p.state["has_built_region_with_surrogate"] for p in built)
    res = romc.sample(n2=30, seed=17)
    w = res.weights
    assert w.sum() > 0
    mean = float(np.sum(res.samples_array.ravel() * w) / w.sum())
    assert abs(mean - obs_mean) < 0.75


def test_batched_regions_match_per_problem_path():
    """The one-program vmapped region construction must produce the same
    bounding boxes as the sequential per-problem RegionConstructor."""
    m, _ = build_gauss_1d()
    romc = elfi.ROMC(m["d"], bounds=[(-2.5, 2.5)], seed=3)
    romc.solve_problems(n1=10, seed=7)
    romc.estimate_regions(eps_filter=0.2)
    batched = {p.ind: p.regions[0] for p in romc.optim_problems
               if p.state["region"]}
    assert batched

    romc2 = elfi.ROMC(m["d"], bounds=[(-2.5, 2.5)], seed=3)
    romc2.solve_problems(n1=10, seed=7)
    romc2._can_batch_regions = lambda *a, **k: False
    romc2.estimate_regions(eps_filter=0.2)
    sequential = {p.ind: p.regions[0] for p in romc2.optim_problems
                  if p.state["region"]}
    assert set(batched) == set(sequential)
    for ind, reg in batched.items():
        np.testing.assert_allclose(reg.center, sequential[ind].center,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(reg.limits, sequential[ind].limits,
                                   rtol=1e-4, atol=1e-5)


def test_batched_local_fits_match_per_problem_path():
    """fit_models=True as one vmapped program must reproduce the
    sequential per-problem quadratic fits (same regions, same keys)."""
    m, _ = build_gauss_1d()
    romc = elfi.ROMC(m["d"], bounds=[(-2.5, 2.5)], seed=3)
    romc.solve_problems(n1=10, seed=7)
    romc.estimate_regions(eps_filter=0.2)
    accepted = romc.inference_state["accepted"]
    probs = [p for p, a in zip(romc.optim_problems, accepted) if a]
    assert probs

    sequential = {}
    for p in probs:
        p.fit_local_surrogate()
        sequential[p.ind] = [np.asarray(c) for c in p._local_coeffs]
        p._local_coeffs = None
        p.local_surrogates = None

    romc._fit_local_surrogates_batched(accepted)
    for p in probs:
        assert p.state["has_fit_local_surrogates"]
        assert len(p._local_coeffs) == len(sequential[p.ind])
        for got, want in zip(p._local_coeffs, sequential[p.ind]):
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                       err_msg=f"problem {p.ind}")
        # the rebuilt host callables evaluate the batched coefficients
        th = np.asarray([p.result.x_min], np.float32).ravel()
        val = p.local_surrogates[0](th)
        assert np.isfinite(val)


def test_romc_bo_posterior_evaluates_surrogates():
    """Under use_bo the vectorised posterior must evaluate the fitted GP
    surrogates (the reference's ``self.funcs``, romc.py:507-551), not
    fall back to full simulator runs: every device-path distance column
    must match the corresponding host surrogate callable."""
    m, _ = build_gauss_1d()
    romc = elfi.ROMC(m["d"], bounds=[(-2.5, 2.5)], seed=11)
    romc.solve_problems(n1=5, use_bo=True,
                        optimizer_args={"n_evidence": 14}, seed=13)
    romc.estimate_regions(eps_filter=0.5)
    post = romc.posterior
    assert post._surrogate_aux is not None, \
        "surrogate factors were not stacked into the posterior"
    thetas = np.linspace(-2.0, 2.0, 7, dtype=np.float32)[:, None]
    dists = post._all_distances(thetas)
    assert dists.shape == (7, len(post.regions))
    for j, fn in enumerate(post.funcs):
        want = np.array([fn(t) for t in thetas])
        np.testing.assert_allclose(dists[:, j], want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"region {j}")
