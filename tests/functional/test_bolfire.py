import numpy as np
import pytest

import elfi_tpu as elfi
from elfi_tpu.methods.classifier import GPClassifier, LogisticRegression


pytestmark = pytest.mark.slow  # excluded from the fast CI gate

def test_logistic_regression_classifier():
    rng = np.random.RandomState(0)
    X = np.vstack([rng.normal(1, 1, (200, 2)), rng.normal(-1, 1, (200, 2))])
    y = np.concatenate([np.ones(200), -np.ones(200)])
    clf = LogisticRegression()
    clf.fit(X, y)
    lr = clf.predict_log_likelihood_ratio(np.array([[2.0, 2.0], [-2., -2.]]))
    assert lr[0] > 0 > lr[1]
    assert "parameters" in clf.attributes


def test_gp_classifier():
    rng = np.random.RandomState(0)
    X = np.vstack([rng.normal(1, 0.5, (80, 1)), rng.normal(-1, 0.5, (80, 1))])
    y = np.concatenate([np.ones(80), -np.ones(80)])
    clf = GPClassifier()
    clf.fit(X, y)
    lr = clf.predict_log_likelihood_ratio(np.array([[1.5], [-1.5]]))
    assert lr[0] > 0 > lr[1]


@pytest.fixture(scope="module")
def bolfire_fitted(request):
    from elfi_tpu.models import ma2
    m = ma2.get_model(seed_obs=4)
    bolfire = elfi.BOLFIRE(m, n_training_data=100, batch_size=100,
                           bounds={"t1": (-2, 2), "t2": (-1, 1)},
                           n_initial_evidence=5, update_interval=5, seed=11)
    bolfire.fit(n_evidence=12, bar=False)
    return bolfire


def test_bolfire_fit(bolfire_fitted):
    assert bolfire_fitted.target_model.n_evidence == 12
    post = bolfire_fitted.extract_result()
    lp = post.logpdf(np.array([0.6, 0.2], np.float32))
    assert np.isfinite(lp)
    maps = post.map_estimates
    assert set(maps) == {"t1", "t2"}


def test_bolfire_sample(bolfire_fitted):
    res = bolfire_fitted.sample(200, n_chains=2, bar=False)
    assert res.chains.shape == (2, 200, 2)
    assert np.all(np.abs(res.sample_means_array) < 3)


def test_logreg_core_matches_sklearn():
    """The device logreg (fused BOLFIRE's classifier) must reproduce
    sklearn's log-likelihood-ratios in the overlapping-classes regime
    BOLFIRE operates in (weakly separable features, thousands of rows)."""
    import jax
    import jax.numpy as jnp

    from elfi_tpu.methods.classifier import logreg_fit_core

    rng = np.random.RandomState(3)
    X = np.vstack([rng.normal(0.3, 1, (2000, 3)),
                   rng.normal(-0.3, 1, (2000, 3))])
    y = np.concatenate([np.ones(2000), -np.ones(2000)])
    skl = LogisticRegression()
    skl.fit(X, y)
    w, b, mu, sd = jax.jit(logreg_fit_core)(jnp.asarray(X),
                                            jnp.asarray(y))
    Xq = rng.normal(0, 1.5, (20, 3))
    ref = skl.predict_log_likelihood_ratio(Xq)
    dev = ((Xq - np.asarray(mu)) / np.asarray(sd)) @ np.asarray(w) \
        + float(b)
    np.testing.assert_allclose(dev, ref, atol=0.05)


def test_logreg_core_survives_ill_scaled_features():
    """Regression for the 2026-08-20 fused-BOLFIRE accuracy collapse:
    gnk's squared-octile features span ~11 orders of magnitude, and the
    UNDAMPED Newton diverged on them (log-ratios ~ -2500 vs sklearn's
    -1.6, float64 identical — algorithmic, not precision), poisoning the
    GP surface (gnk bench A errors up to 2.7 vs host 0.58).  The damped
    iteration must stay at the optimum: sane log-ratios, objective value
    no worse than sklearn's solution under OUR objective."""
    import jax
    import jax.numpy as jnp

    from elfi_tpu.methods.classifier import logreg_fit_core

    rng = np.random.RandomState(7)
    scales = np.array([1.0, 1e3, 1e6, 1e9])
    X = np.vstack([rng.lognormal(0.3, 2, (1500, 4)),
                   rng.lognormal(0.0, 2, (1500, 4))]) * scales
    y = np.concatenate([np.ones(1500), -np.ones(1500)])
    w, b, mu, sd = jax.jit(logreg_fit_core)(jnp.asarray(X), jnp.asarray(y))
    Xq = rng.lognormal(0.15, 2, (10, 4)) * scales
    z = ((Xq - np.asarray(mu)) / np.asarray(sd)) @ np.asarray(w) + float(b)
    assert np.all(np.abs(z) < 50), z

    skl = LogisticRegression()
    skl.fit(X, y)

    def objective(v):
        Xs = (X - np.asarray(mu)) / np.asarray(sd)
        m = y * (Xs @ v[:-1] + v[-1])
        return 0.5 * np.sum(v * v) + np.sum(np.logaddexp(0.0, -m))

    v_dev = np.concatenate([np.asarray(w), [float(b)]])
    v_skl = np.concatenate([skl.model.coef_[0], skl.model.intercept_])
    assert objective(v_dev) <= objective(v_skl) + 1.0


@pytest.mark.parametrize("fused", [True, False])
def test_bolfire_gnk_smoke(fused):
    """BASELINE.md config: BOLFIRE runs end-to-end on 4-d g-and-k (tiny
    budget — mechanics only, not posterior quality) on BOTH the fused
    device loop (auto-selected: uniform-box prior == bounds) and the
    host round loop."""
    from elfi_tpu.models import gnk

    m = gnk.get_model(n_obs=50, seed_obs=2)
    bolfire = elfi.BOLFIRE(m, n_training_data=100,
                           feature_names=["ss_order"],
                           bounds={p: (0.0, 10.0)
                                   for p in m.parameter_names},
                           n_initial_evidence=8, seed=5)
    assert bolfire._fused_eligible()
    bolfire.fit(n_evidence=12, bar=False, fused=fused)
    assert bolfire.target_model.n_evidence == 12
    assert len(bolfire.classifier_attributes) == 12
    ev = np.asarray(bolfire.target_model.X)
    assert np.all((ev >= 0.0) & (ev <= 10.0))
    res = bolfire.sample(100, n_chains=2, bar=False)
    arr = res.samples_array
    assert arr.shape[1] == 4 and np.all(np.isfinite(arr))
    assert np.all((arr >= 0.0) & (arr <= 10.0))


def test_prior_cost_fn_sanitized_outside_support():
    """The fused acquisition's -log prior cost must be finite-valued and
    nan-free in gradient OUTSIDE the prior support (MA2's triangle): a
    -inf log prior otherwise nans the Adam descent (the same failure
    mode the NUTS leapfrog sanitization guards)."""
    import jax
    import jax.numpy as jnp

    from elfi_tpu.methods.bolfire import _prior_cost_fn
    from elfi_tpu.model.extensions import ModelPrior
    from elfi_tpu.models import ma2

    m = ma2.get_model(seed_obs=4)
    cost = _prior_cost_fn(ModelPrior(m))
    inside = jnp.asarray([0.6, 0.2], jnp.float32)
    outside = jnp.asarray([-3.0, 0.0], jnp.float32)  # |t1| > 2: pdf = 0
    c_in, g_in = jax.value_and_grad(cost)(inside)
    c_out, g_out = jax.value_and_grad(cost)(outside)
    assert np.isfinite(float(c_in)) and float(c_in) < 1e29
    assert float(c_out) == float(np.float32(1e30))
    assert np.all(np.isfinite(np.asarray(g_in)))
    assert np.all(np.asarray(g_out) == 0.0)
    # memoized per model revision: same model -> same traced callable
    assert _prior_cost_fn(ModelPrior(m)) is cost
