import numpy as np
import pytest

import jax.numpy as jnp

import elfi_tpu as elfi
from elfi_tpu.methods.bo.acquisition import (LCBSC, MaxVar, RandMaxVar,
                                             UniformAcquisition)
from elfi_tpu.model.extensions import ModelPrior

pytestmark = pytest.mark.slow  # excluded from the fast CI gate


@pytest.fixture(scope="module")
def ma2_log():
    from elfi_tpu.models import ma2
    m = ma2.get_model(seed_obs=4)
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d")
    return m


@pytest.fixture(scope="module")
def fitted_bolfi(ma2_log):
    bolfi = elfi.BOLFI(ma2_log["log_d"], batch_size=1, initial_evidence=16,
                       update_interval=8,
                       bounds={"t1": (-2, 2), "t2": (-1, 1)},
                       acq_noise_var=0.1, seed=42)
    post = bolfi.fit(n_evidence=40, bar=False)
    return bolfi, post


def test_bolfi_fit(fitted_bolfi):
    bolfi, post = fitted_bolfi
    assert bolfi.target_model.n_evidence == 40
    assert np.isfinite(post.threshold)
    res = bolfi.extract_result()
    assert set(res.x_min) == {"t1", "t2"}
    assert -2 <= res.x_min["t1"][0] <= 2


def test_bolfi_posterior_logpdf(fitted_bolfi):
    _, post = fitted_bolfi
    x = np.array([0.6, 0.2], np.float32)
    lp = post.logpdf(x)
    assert np.isfinite(lp)
    g = post.gradient_logpdf(x)
    assert g.shape == (2,)
    # outside prior support -> -inf
    assert post.logpdf(np.array([3.0, 0.0], np.float32)) == -np.inf


def test_bolfi_sample(fitted_bolfi):
    bolfi, _ = fitted_bolfi
    res = bolfi.sample(400, n_chains=2, bar=False)
    assert res.chains.shape == (2, 400, 2)
    assert res.n_samples == 2 * 200
    means = res.sample_means_array
    assert -2 < means[0] < 2 and -1 < means[1] < 1


def test_fused_fit_programs_reused_across_instances(ma2_log):
    """A second BOLFI on the same model must NOT retrace/recompile the
    fused-fit or sampler programs: the fused BO programs are module-level
    with static spec + program-cache-stable traceables, and the NUTS
    target routes fit data through target_args.  (The per-instance
    closures this replaces cost a full remote XLA compile per fit/sample
    on the TPU tunnel.)"""
    from elfi_tpu.methods import mcmc
    from elfi_tpu.methods import bolfi as bolfi_mod

    # uniform (box) priors: the NUTS target is the stable per-kernel
    # bundle target, so even the sampler program must be reused.  (MA2's
    # hierarchical custom priors take the general closure-target path,
    # which legitimately retraces per posterior.)
    m = elfi.Model(name="bolfi_reuse")
    elfi.Prior("uniform", -2, 4, model=m, name="t1")
    elfi.Prior("uniform", -1, 2, model=m, name="t2")
    elfi.Simulator(
        lambda t1, t2, batch_size, key: (
            jnp.stack([t1, t2], 1)
            + 0.1 * __import__("jax").random.normal(key, (batch_size, 2))),
        m["t1"], m["t2"], observed=np.array([0.6, 0.2]), model=m, name="S")
    elfi.Distance("euclidean", m["S"], model=m, name="d")
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d")

    def run(seed):
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1,
                           initial_evidence=16, update_interval=8,
                           bounds={"t1": (-2, 2), "t2": (-1, 1)},
                           acq_noise_var=0.1, seed=seed)
        bolfi.fit(n_evidence=32, bar=False)
        return bolfi.sample(100, n_chains=2, bar=False)

    run(11)
    entries = dict(bolfi_mod._FUSED_BO_PROGRAMS)
    assert entries, "fit did not register fused-BO programs"
    progs = [f for trio in entries.values() for f in trio]
    progs.append(mcmc._nuts_chains_jit)
    sizes = [f._cache_size() for f in progs]
    res = run(12)
    # same spec + program-cache-stable traceables -> the memo entry is
    # reused and no jitted program retraces
    for key in entries:
        assert bolfi_mod._FUSED_BO_PROGRAMS.get(key) is entries[key]
    for f, before in zip(progs, sizes):
        assert f._cache_size() == before, f
    assert res.chains.shape == (2, 100, 2)


def test_bolfi_continue_fit(ma2_log):
    bolfi = elfi.BOLFI(ma2_log["log_d"], batch_size=1, initial_evidence=16,
                       bounds={"t1": (-2, 2), "t2": (-1, 1)}, seed=7)
    bolfi.fit(n_evidence=20, bar=False)
    bolfi.infer(30, bar=False)
    assert bolfi.target_model.n_evidence == 30


def test_acquisitions(fitted_bolfi):
    bolfi, _ = fitted_bolfi
    gp = bolfi.target_model
    prior = ModelPrior(bolfi.model, parameter_names=gp.parameter_names)

    for acq_cls, kwargs in [(LCBSC, {}), (MaxVar, {}),
                            (UniformAcquisition, {})]:
        acq = acq_cls(gp, prior=prior, seed=0, **kwargs) \
            if acq_cls is not UniformAcquisition else acq_cls(gp, seed=0)
        pts = acq.acquire(3, t=2)
        assert pts.shape == (3, 2)
        for i, b in enumerate(gp.bounds):
            assert np.all(pts[:, i] >= b[0]) and np.all(pts[:, i] <= b[1])


def test_randmaxvar(fitted_bolfi):
    bolfi, _ = fitted_bolfi
    gp = bolfi.target_model
    prior = ModelPrior(bolfi.model, parameter_names=gp.parameter_names)
    acq = RandMaxVar(gp, prior=prior, n_samples=40, seed=0)
    pts = acq.acquire(1, t=0)
    assert pts.shape == (1, 2)


def test_acquisitions_device_only(fitted_bolfi, monkeypatch):
    """Every acquisition rule optimizes through ONE traced device program:
    no host-side GP predict round trips (each costs ~30 ms on the
    tunnel-attached TPU; the reference pays one per optimizer step)."""
    from elfi_tpu.methods.bo.acquisition import ExpIntVar
    bolfi, _ = fitted_bolfi
    gp = bolfi.target_model
    prior = ModelPrior(bolfi.model, parameter_names=gp.parameter_names)

    def boom(*a, **k):
        raise AssertionError("host GP predict called during acquisition")

    monkeypatch.setattr(gp, "predict", boom)
    monkeypatch.setattr(gp, "predictive_gradients", boom)
    for acq in (LCBSC(gp, prior=prior, seed=0),
                MaxVar(gp, prior=prior, seed=0),
                RandMaxVar(gp, prior=prior, n_samples=20, seed=0),
                ExpIntVar(gp, prior=prior, seed=0)):
        pts = acq.acquire(1, t=2)
        assert pts.shape == (1, 2)
        for i, b in enumerate(gp.bounds):
            assert np.all(pts[:, i] >= b[0]) and np.all(pts[:, i] <= b[1])


def test_maxvar_gradient_matches_numeric(fitted_bolfi):
    """Autodiff acquisition gradient vs central differences."""
    bolfi, _ = fitted_bolfi
    gp = bolfi.target_model
    prior = ModelPrior(bolfi.model, parameter_names=gp.parameter_names)
    acq = MaxVar(gp, prior=prior, seed=0)
    acq._update_eps()
    thetas = np.array([[0.4, 0.1], [-0.5, 0.3], [1.2, -0.6]])
    grads = acq.evaluate_gradient(thetas)
    eps = 1e-3
    for j in range(2):
        shift = np.zeros(2)
        shift[j] = eps
        num = (acq.evaluate(thetas + shift) - acq.evaluate(thetas - shift)) \
            / (2 * eps)
        scale = np.maximum(np.abs(num.ravel()), 1e-7)
        np.testing.assert_allclose(grads[:, j] / scale,
                                   num.ravel() / scale, atol=0.05)


def test_expintvar_gradient_matches_numeric(fitted_bolfi):
    """ExpIntVar.evaluate_gradient (jax.grad of the traced lookahead
    loss) vs central differences."""
    from elfi_tpu.methods.bo.acquisition import ExpIntVar
    bolfi, _ = fitted_bolfi
    gp = bolfi.target_model
    prior = ModelPrior(bolfi.model, parameter_names=gp.parameter_names)
    acq = ExpIntVar(gp, prior=prior, seed=0)
    acq._refresh_state(t=1)
    thetas = np.array([[0.4, 0.1], [-0.5, 0.3], [1.2, -0.6]])
    grads = acq.evaluate_gradient(thetas)
    assert grads.shape == (3, 2)
    eps = 1e-3
    for j in range(2):
        shift = np.zeros(2)
        shift[j] = eps
        num = (acq.evaluate(thetas + shift) - acq.evaluate(thetas - shift)) \
            / (2 * eps)
        scale = np.maximum(np.abs(num.ravel()), 1e-7)
        np.testing.assert_allclose(grads[:, j] / scale,
                                   num.ravel() / scale, atol=0.05)


def test_constrained_acquisitions(fitted_bolfi):
    """MaxVar and ExpIntVar honor scipy-style constraints: acquired points
    satisfy the constraint instead of it being silently ignored."""
    from elfi_tpu.methods.bo.acquisition import ExpIntVar
    bolfi, _ = fitted_bolfi
    gp = bolfi.target_model
    prior = ModelPrior(bolfi.model, parameter_names=gp.parameter_names)
    # feasible region: t1 + t2 <= 0.5
    con = {"type": "ineq", "fun": lambda x: 0.5 - x[0] - x[1]}
    for acq in (MaxVar(gp, prior=prior, seed=0, constraints=(con,)),
                ExpIntVar(gp, prior=prior, seed=0, constraints=(con,))):
        pts = acq.acquire(2, t=1)
        assert pts.shape == (2, 2)
        assert np.all(pts.sum(axis=1) <= 0.5 + 1e-5)
        for i, b in enumerate(gp.bounds):
            assert np.all(pts[:, i] >= b[0]) and np.all(pts[:, i] <= b[1])


def test_bayesian_optimization_result(ma2_log):
    bo = elfi.BayesianOptimization(ma2_log["log_d"], batch_size=1,
                                   initial_evidence=16,
                                   bounds={"t1": (-2, 2), "t2": (-1, 1)},
                                   seed=3)
    res = bo.infer(20, bar=False)
    assert isinstance(res, elfi.OptimizationResult)
    assert "log_d" in res.outputs


def test_expintvar(fitted_bolfi):
    from elfi_tpu.methods.bo.acquisition import ExpIntVar
    bolfi, _ = fitted_bolfi
    gp = bolfi.target_model
    prior = ModelPrior(bolfi.model, parameter_names=gp.parameter_names)
    acq = ExpIntVar(gp, prior=prior, seed=0)
    pts = acq.acquire(1, t=1)
    assert pts.shape == (1, 2)
    for i, b in enumerate(gp.bounds):
        assert np.all(pts[:, i] >= b[0]) and np.all(pts[:, i] <= b[1])


def test_bolfi_fused_zero_acq_noise_stays_finite(ma2_log):
    """acq_noise_var=0 (the constructor default) through the fused loop:
    the LCB minimizer's clipping frequently lands theta exactly on a
    bound, where the raw truncnorm standardisation a=(lo-theta)/0 is
    0/0=NaN; zero-noise dims must pass theta through unchanged (matching
    the host path's _add_noise), keeping all evidence finite."""
    bolfi = elfi.BOLFI(ma2_log["log_d"], batch_size=1, initial_evidence=12,
                       update_interval=8,
                       bounds={"t1": (-2, 2), "t2": (-1, 1)},
                       acq_noise_var=0, seed=7)
    bolfi.fit(n_evidence=24, bar=False)
    gp = bolfi.target_model
    assert gp.n_evidence == 24
    assert np.all(np.isfinite(np.asarray(gp._x)))
    assert np.all(np.isfinite(np.asarray(gp._y)))


def test_posterior_tracks_continued_fit(ma2_log):
    """A posterior held across a continued fit must evaluate the
    refitted GP (the reference reads self.model.predict live per call),
    not a stale jitted snapshot; the threshold stays frozen."""
    from elfi_tpu.methods.posteriors import BolfiPosterior

    bolfi = elfi.BOLFI(ma2_log["log_d"], batch_size=1, initial_evidence=12,
                       update_interval=8,
                       bounds={"t1": (-2, 2), "t2": (-1, 1)},
                       acq_noise_var=0.1, seed=21)
    post = bolfi.fit(n_evidence=20, bar=False)
    x = np.array([[0.5, 0.2], [-0.3, 0.1]], np.float32)
    v1 = post.logpdf(x)                      # populates the jit cache
    bolfi.fit(n_evidence=28, bar=False)      # continue: refits the GP
    v2 = post.logpdf(x)
    fresh = BolfiPosterior(bolfi.target_model, threshold=post.threshold,
                           prior=post.prior)
    np.testing.assert_allclose(v2, fresh.logpdf(x), rtol=1e-5, atol=1e-6)
    assert not np.allclose(v1, v2)           # the refit moved the density
