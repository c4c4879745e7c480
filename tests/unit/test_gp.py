import numpy as np
import pytest

from elfi_tpu.methods.bo.gp import GPRegression
from elfi_tpu.methods.bo.utils import minimize, stochastic_optimization


@pytest.fixture(scope="module")
def fitted_gp():
    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, size=(30, 1))
    y = X[:, 0] ** 2 + 0.05 * rng.randn(30)
    gp = GPRegression(["x"], bounds=[(-2, 2)])
    gp.update(X, y, optimize=True)
    return gp


def test_gp_predict_accuracy(fitted_gp):
    xs = np.linspace(-1.8, 1.8, 7)[:, None]
    mu, var = fitted_gp.predict(xs)
    assert mu.shape == (7, 1) and var.shape == (7, 1)
    np.testing.assert_allclose(mu[:, 0], xs[:, 0] ** 2, atol=0.25)
    assert np.all(var > 0)


def test_gp_gradients(fitted_gp):
    xs = np.array([[1.0], [-1.0], [0.5]])
    gmu, gvar = fitted_gp.predictive_gradients(xs)
    np.testing.assert_allclose(gmu[:, 0], 2 * xs[:, 0], atol=0.5)
    # finite-difference agreement
    eps = 1e-3
    fd = (fitted_gp.predict(xs + eps)[0] - fitted_gp.predict(xs - eps)[0]) \
        / (2 * eps)
    np.testing.assert_allclose(gmu[:, 0], fd[:, 0], atol=0.05)


def test_gp_incremental_update_no_refit(fitted_gp):
    gp = fitted_gp.copy()
    n0 = gp.n_evidence
    gp.update(np.array([[0.3]]), np.array([0.09]))
    assert gp.n_evidence == n0 + 1
    mu, _ = gp.predict(np.array([[0.3]]))
    assert abs(mu[0, 0] - 0.09) < 0.3


def test_gp_noiseless_variance_smaller(fitted_gp):
    xs = np.array([[0.7]])
    _, v_noisy = fitted_gp.predict(xs, noiseless=False)
    _, v_clean = fitted_gp.predict(xs, noiseless=True)
    assert v_clean[0, 0] <= v_noisy[0, 0]


def test_gp_empty_predict():
    gp = GPRegression(["x"], bounds=[(0, 1)])
    mu, var = gp.predict(np.array([[0.5]]))
    assert mu[0, 0] == 0 and var[0, 0] == 1


def test_gp_bounds_dict():
    gp = GPRegression(["a", "b"], bounds={"b": (0, 2), "a": (-1, 1)})
    assert gp.bounds == [(-1, 1), (0, 2)]


def test_minimize_quadratic():
    loc, val = minimize(lambda x: np.sum((x - 0.3) ** 2),
                        [(-1, 1)], n_start_points=5,
                        random_state=np.random.RandomState(1))
    assert abs(loc[0] - 0.3) < 1e-3


def test_stochastic_optimization():
    loc, val = stochastic_optimization(
        lambda x: np.atleast_1d(np.sum((x - 0.5) ** 2)), [(0, 1)],
        maxiter=50, seed=3)
    assert abs(loc[0] - 0.5) < 1e-2


def _matern32(A, B, params):
    import jax.numpy as jnp
    r2 = (jnp.sum(A ** 2, 1)[:, None] + jnp.sum(B ** 2, 1)[None, :]
          - 2.0 * A @ B.T)
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    z = jnp.sqrt(3.0) * r / params["lengthscale"]
    return params["variance"] * (1.0 + z) * jnp.exp(-z)


def test_gp_custom_kernel_fit_predict():
    """Reference GPyRegression accepts a user kernel object
    (gpy_regression.py:60-96); here a traceable cross-covariance fn."""
    rng = np.random.RandomState(1)
    X = rng.uniform(-2, 2, size=(25, 1))
    y = np.sin(2 * X[:, 0]) + 0.05 * rng.randn(25)
    gp = GPRegression(["x"], bounds=[(-2, 2)], kernel=_matern32,
                      kernel_params={"variance": 1.0, "lengthscale": 0.8})
    gp.update(X, y, optimize=True)
    assert gp.custom_kernel
    xs = np.linspace(-1.8, 1.8, 9)[:, None]
    mu, var = gp.predict(xs)
    np.testing.assert_allclose(mu[:, 0], np.sin(2 * xs[:, 0]), atol=0.3)
    assert np.all(var > 0)
    # autodiff gradients agree with finite differences
    gmu, _ = gp.predictive_gradients(xs)
    eps = 1e-3
    fd = (gp.predict(xs + eps)[0] - gp.predict(xs - eps)[0]) / (2 * eps)
    np.testing.assert_allclose(gmu[:, 0], fd[:, 0], atol=0.05)
    # device closure (used by NUTS/posteriors) routes through the kernel
    pred = gp.device_predict(noiseless=True)
    import jax.numpy as jnp
    mu_dev, _ = pred(jnp.asarray(xs, jnp.float32))
    np.testing.assert_allclose(np.asarray(mu_dev), mu[:, 0], atol=1e-4)


def test_gp_custom_kernel_requires_params():
    with pytest.raises(ValueError, match="kernel_params"):
        GPRegression(["x"], bounds=[(-2, 2)], kernel=_matern32)


def test_bolfi_custom_kernel_end_to_end():
    """BOLFI (standard loop + LCBSC traced path + posterior threshold
    optimization) must flow a custom kernel through every stage."""
    import elfi_tpu as elfi
    import jax.numpy as jnp
    from elfi_tpu.models import ma2
    m = ma2.get_model(seed_obs=4)
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d_ck")
    gp = GPRegression(m.parameter_names, bounds=[(-2, 2), (-1, 1)],
                      kernel=_matern32,
                      kernel_params={"variance": 1.0, "lengthscale": 1.0})
    bolfi = elfi.BOLFI(m["log_d_ck"], batch_size=1, initial_evidence=10,
                       update_interval=5, seed=7, target_model=gp,
                       bounds={"t1": (-2, 2), "t2": (-1, 1)})
    post = bolfi.fit(n_evidence=16, bar=False)
    assert bolfi.target_model.custom_kernel
    assert np.isfinite(post.threshold)
    assert np.isfinite(float(post.logpdf(np.array([0.5, 0.1]))))


def test_gp_inverse_predict_matches_solve(fitted_gp):
    """The cached-inverse predict path (one matvec per evaluation, used
    inside fused Adam/NUTS loops) must agree with the triangular-solve
    path to float32 tolerance."""
    import jax.numpy as jnp
    xs = np.linspace(-2, 2, 31)[:, None].astype(np.float32)
    for noiseless in (False, True):
        solve_pred = fitted_gp.device_predict(noiseless=noiseless)
        inv_pred = fitted_gp.device_predict(noiseless=noiseless,
                                            use_inverse=True)
        mu_s, var_s = solve_pred(jnp.asarray(xs))
        mu_i, var_i = inv_pred(jnp.asarray(xs))
        np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_s),
                                   rtol=1e-4, atol=1e-4)
        # with matmul precision pinned to HIGHEST (see _precision.py) the
        # two paths agree to ~1e-3 absolute; the remaining slack is plain
        # float32 cancellation in near-zero noiseless variances, not the
        # old bf16 corruption (which needed rtol=5e-2 and still collapsed
        # clustered-evidence fits, see
        # test_gp_variance_never_collapses_on_clustered_evidence)
        np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_s),
                                   rtol=5e-2, atol=1e-3)
        assert np.all(np.asarray(var_i) > 0)


def test_explicit_zero_noise_var_respected():
    """noise_var=0 must produce a near-noiseless GP, not be silently
    swallowed by a falsy check and replaced with the ~1e4x larger
    max(y)^2/100 heuristic."""
    import numpy as np
    from elfi_tpu.methods.bo.gp import GPRegression

    x = np.linspace(0.0, 1.0, 8)[:, None]
    y = np.sin(3 * x).ravel() * 10.0
    gp = GPRegression(["a"], bounds=[(0, 1)], noise_var=0)
    gp.update(x, y, optimize=False)
    assert gp.params["noise"] <= 1e-8
    heuristic = max(np.max(y) ** 2 / 100.0, 1e-6)
    assert gp.params["noise"] < heuristic / 100


def test_matmul_precision_policy():
    """Importing the package must set the library-wide HIGHEST matmul
    precision: the TPU bf16 default corrupted GP Cholesky factors by
    5-11% and collapsed predictive variances to the clip floor (frozen
    NUTS chains, garbage LCB exploration — see _precision.py)."""
    import jax

    import elfi_tpu  # noqa: F401
    assert str(jax.config.jax_default_matmul_precision) == "highest"


def test_gp_variance_never_collapses_on_clustered_evidence():
    """The bf16-matmul failure mode: BO-clustered (near-duplicate)
    evidence rows drove the kx@Kinv@kx quadratic form past prior+noise,
    clipping the predictive variance to 1e-10 over most of the box.
    Invariant (exact arithmetic): noisy predictive variance >= noise.
    Checked against a float64 host reference on a pathological fit."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # 3 tight clusters of near-duplicates + a few spread points, 2-d
    centers = np.array([[0.2, 0.3], [0.5, 0.7], [0.8, 0.4]])
    x = np.vstack([c + 1e-4 * rng.randn(60, 2) for c in centers]
                  + [rng.rand(20, 2)])
    y = np.sin(5 * x[:, 0]) + np.cos(3 * x[:, 1]) + 0.1 * rng.randn(len(x))
    gp = GPRegression(["a", "b"], bounds=[(0, 1), (0, 1)])
    gp.update(x, y, optimize=True)

    Xp, mask, L, alpha, params = gp._factor
    Kinv = gp.fns.posterior_inverse(L, mask)
    grid = np.stack(np.meshgrid(np.linspace(0, 1, 9),
                                np.linspace(0, 1, 9)), -1).reshape(-1, 2)
    mu, var = gp.fns.predict_inv(jnp.asarray(grid, jnp.float32), Xp, mask,
                                 Kinv, alpha, params)
    noise = float(params["noise"])
    assert np.all(np.asarray(var) > 0.5 * noise)

    # float64 host reference on the same evidence/hyperparameters
    sc = np.asarray(params["scales"], np.float64)
    ell = float(params["ell"])
    s2, b = float(params["sigma2"]), float(params["bias"])

    def k64(A, B):
        d2 = (((A[:, None, :] - B[None, :, :]) * sc) / ell) ** 2
        return s2 * np.exp(-0.5 * d2.sum(-1)) + b

    Xa = np.asarray(gp.X, np.float64)
    Ka = k64(Xa, Xa) + np.eye(len(Xa)) * noise
    kx = k64(grid.astype(np.float64), Xa)
    q = np.einsum("ij,ji->i", kx, np.linalg.solve(Ka, kx.T))
    var64 = s2 + b - q + noise
    mu64 = kx @ np.linalg.solve(Ka, np.asarray(gp.Y, np.float64).ravel())
    np.testing.assert_allclose(np.asarray(mu), mu64, atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(var), var64, rtol=2e-2)


def test_lcbsc_epsilon_validation_and_default():
    from elfi_tpu.methods.bo.acquisition import LCBSC

    gp = GPRegression(["x"], bounds=[(-2, 2)])
    assert LCBSC(gp, seed=0).epsilon == 0.0
    with pytest.raises(ValueError):
        LCBSC(gp, seed=0, epsilon=1.0)
    with pytest.raises(ValueError):
        LCBSC(gp, seed=0, epsilon=-0.1)


def test_lcbsc_epsilon_mixes_uniform_draws(fitted_gp):
    """eps-greedy LCBSC: with epsilon=1 every acquisition is a uniform
    prior-box draw; with epsilon=0 the classic LCB minimizer (near the
    quadratic's minimum at 0) comes back every time."""
    from elfi_tpu.methods.bo.acquisition import LCBSC

    pure = LCBSC(fitted_gp, seed=7)
    xs0 = np.concatenate([pure.acquire(1, t=t) for t in range(8)])
    assert np.all(np.abs(xs0) < 0.5)          # always near the minimum

    mixed = LCBSC(fitted_gp, seed=7, epsilon=1.0 - 1e-9)
    xs1 = np.concatenate([mixed.acquire(1, t=t) for t in range(8)])
    assert np.std(xs1) > np.std(xs0) + 0.1    # spread over the box
    # deterministic per seed
    mixed2 = LCBSC(fitted_gp, seed=7, epsilon=1.0 - 1e-9)
    xs2 = np.concatenate([mixed2.acquire(1, t=t) for t in range(8)])
    np.testing.assert_array_equal(xs1, xs2)


def test_bolfi_acq_epsilon_flows_to_fused_spec():
    """BOLFI(acq_epsilon=...) must reach both the LCBSC instance and the
    fused-program spec (an undeclared knob silently ignored by the fused
    path is exactly the bug class the override guard exists for)."""
    import jax.numpy as jnp

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2

    m = ma2.get_model(seed_obs=4)
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d")
    b = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=10,
                   update_interval=10, bounds={"t1": (-2, 2),
                                               "t2": (-1, 1)},
                   acq_epsilon=0.4, seed=1)
    assert b.acquisition_method.epsilon == 0.4
    assert b._fused_eligible()
    b.fit(n_evidence=14, bar=False)
    x = b.target_model._x
    assert x.shape[0] == 14 and np.all(np.isfinite(x))
