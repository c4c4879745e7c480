import numpy as np
import pytest

import elfi_tpu as elfi


def test_smc_quantiles(ma2):
    smc = elfi.SMC(ma2["d"], batch_size=200, seed=42)
    res = smc.sample(50, quantiles=[0.5, 0.5], bar=False)
    assert res.n_samples == 50
    assert len(res.populations) == 2
    assert res.weights is not None
    # round 2 threshold must be tighter than round 1
    t0 = res.populations[0].meta["threshold"]
    assert np.max(res.populations[1].discrepancies) <= np.max(
        np.atleast_1d(t0))


def test_smc_thresholds(ma2):
    smc = elfi.SMC(ma2["d"], batch_size=200, seed=42)
    res = smc.sample(30, thresholds=[1.0, 0.5], bar=False)
    assert np.all(res.populations[-1].discrepancies <= 0.5)


def test_smc_determinism(ma2):
    r1 = elfi.SMC(ma2["d"], batch_size=100, seed=7).sample(
        20, quantiles=[0.5, 0.5], bar=False)
    r2 = elfi.SMC(ma2["d"], batch_size=100, seed=7).sample(
        20, quantiles=[0.5, 0.5], bar=False)
    r3 = elfi.SMC(ma2["d"], batch_size=100, seed=8).sample(
        20, quantiles=[0.5, 0.5], bar=False)
    np.testing.assert_array_equal(r1.samples["t1"], r2.samples["t1"])
    assert not np.array_equal(r1.samples["t1"], r3.samples["t1"])


def test_smc_weights_cover_prior_change(ma2):
    smc = elfi.SMC(ma2["d"], batch_size=200, seed=1)
    res = smc.sample(40, quantiles=[0.5, 0.5], bar=False)
    w = res.weights
    assert np.all(w >= 0) and np.sum(w) > 0
    assert res.populations[0].weights is not None


def test_adaptive_distance_node(ma2):
    # build an adaptive-distance variant of MA2
    ad = elfi.AdaptiveDistance(ma2["S1"], ma2["S2"], model=ma2, name="ad")
    rej = elfi.Rejection(ma2["ad"], batch_size=100, seed=3)
    res = rej.sample(20, quantile=0.2, bar=False)
    node = rej.model["ad"]
    assert len(node.adaptive_state["w"]) == 2  # unweighted + 1 adapted
    assert res.outputs["ad"].ndim == 1  # re-computed final distances


def test_adaptive_distance_smc(ma2):
    ad = elfi.AdaptiveDistance(ma2["S1"], ma2["S2"], model=ma2, name="ad")
    smc = elfi.AdaptiveDistanceSMC(ma2["ad"], batch_size=100, seed=5)
    res = smc.sample(20, rounds=2, quantile=0.5, bar=False)
    assert res.n_samples == 20
    assert len(res.populations) == 2
    assert len(res.meta["adaptive_distance_w"]) == 2


def test_adaptive_threshold_smc(ma2):
    from elfi_tpu.methods.density_ratio_estimation import \
        DensityRatioEstimation
    smc = elfi.AdaptiveThresholdSMC(
        ma2["d"], batch_size=150, seed=11, initial_quantile=0.3,
        densratio_estimation=DensityRatioEstimation(n=20, epsilon=0.001,
                                                    max_iter=200,
                                                    abs_tol=0.01))
    res = smc.sample(30, max_iter=3, bar=False)
    assert res.n_samples == 30
    assert 1 <= len(res.populations) <= 3


def test_gm_rvs_traced_matches_host(ma2):
    """rvs_traced (fused-SMC proposal path) must reproduce the host rvs
    draws bit-for-bit, including prior-support redraws."""
    import jax
    import jax.numpy as jnp
    from elfi_tpu.model.extensions import ModelPrior
    from elfi_tpu.methods.utils import GMDistribution

    prior = ModelPrior(ma2)
    means = np.array([[0.3, 0.2], [1.5, 0.8]])
    cov = np.diag([0.4, 0.3])  # wide enough to trigger redraws
    w = np.array([0.5, 0.5])
    key = jax.random.key(42)
    host = GMDistribution.rvs(means, cov, w, size=256,
                              prior_logpdf=prior.logpdf, key=key)
    traced = jax.jit(lambda k: GMDistribution.rvs_traced(
        means, cov, w, 256, prior.traceable_logpdf(), k))(key)
    np.testing.assert_array_equal(np.asarray(host), np.asarray(traced))


def test_smc_fused_equals_unfused_single_round(ma2):
    """Quantile-mode round 0 has a deterministic batch count, so fused and
    unfused runs must agree bit-for-bit."""
    kw = dict(batch_size=500, seed=31)
    r1 = elfi.SMC(ma2["d"], **kw).sample(100, quantiles=[0.2], bar=False,
                                         fused=False)
    r2 = elfi.SMC(ma2["d"], **kw).sample(100, quantiles=[0.2], bar=False,
                                         fused=True)
    np.testing.assert_array_equal(r1.samples_array, r2.samples_array)


def test_smc_fused_multiround(ma2):
    """Fused multi-round SMC: deterministic per seed, statistically
    consistent with the unfused sampler."""
    kw = dict(batch_size=1000, seed=7)
    f1 = elfi.SMC(ma2["d"], **kw).sample(500, thresholds=[1.0, 0.5, 0.25],
                                         bar=False, fused=True)
    f2 = elfi.SMC(ma2["d"], **kw).sample(500, thresholds=[1.0, 0.5, 0.25],
                                         bar=False, fused=True)
    np.testing.assert_array_equal(f1.samples_array, f2.samples_array)
    assert f1.n_populations == 3
    assert float(np.max(f1.discrepancies)) <= 0.25

    u = elfi.SMC(ma2["d"], batch_size=1000, seed=8).sample(
        500, thresholds=[1.0, 0.5, 0.25], bar=False, fused=False)
    np.testing.assert_allclose(f1.sample_means_array, u.sample_means_array,
                               atol=0.12)


def test_smc_fused_sharded_equals_native(ma2):
    """Fused SMC over the 8-device mesh must match the single-device fused
    run exactly (quantile round: deterministic batch count)."""
    from elfi_tpu.parallel.backends import (NativeBackend, ShardedBackend,
                                            set_client)
    kw = dict(batch_size=800, seed=13)
    set_client(NativeBackend())
    r_native = elfi.SMC(ma2["d"], **kw).sample(100, quantiles=[0.2],
                                               bar=False, fused=True)
    set_client(ShardedBackend())
    try:
        r_shard = elfi.SMC(ma2["d"], **kw).sample(100, quantiles=[0.2],
                                                  bar=False, fused=True)
    finally:
        set_client(NativeBackend())
    np.testing.assert_array_equal(r_native.samples_array,
                                  r_shard.samples_array)


def test_fused_overrides_actually_flow(ma2):
    """Regression guard: a traceable overrides_spec must actually replace
    the parameter nodes inside the fused scan (undeclared overrides are
    silently ignored by the traced program)."""
    import jax.numpy as jnp
    from elfi_tpu.compile.compiler import compile_program

    rej = elfi.Rejection(ma2["d"], batch_size=100, seed=2)
    rej.set_objective(10, n_sim=300)
    prog = compile_program(rej.model, tuple(rej.output_names),
                           override_names=("t1", "t2"))

    def const_fn(args, i):
        c1, c2 = args
        return {"t1": jnp.full((100,), c1), "t2": jnp.full((100,), c2)}

    rej.bar = False
    rej._run_fused(prog, None,
                   overrides_spec=(("const",), const_fn,
                                   (jnp.float32(0.7), jnp.float32(0.15))))
    res = rej.extract_result()
    np.testing.assert_allclose(res.samples["t1"], 0.7, rtol=1e-6)
    np.testing.assert_allclose(res.samples["t2"], 0.15, rtol=1e-6)


def test_smc_fused_proposals_shrink_n_sim(ma2):
    """With GM proposals flowing, reaching a tight threshold takes far
    fewer simulations than prior sampling would."""
    f = elfi.SMC(ma2["d"], batch_size=1000, seed=9).sample(
        300, thresholds=[1.0, 0.3, 0.1], bar=False, fused=True)
    u = elfi.SMC(ma2["d"], batch_size=1000, seed=10).sample(
        300, thresholds=[1.0, 0.3, 0.1], bar=False, fused=False)
    assert float(np.max(f.discrepancies)) <= 0.1
    # chunk-granularity overshoot allowed, but the proposal mechanism must
    # keep the fused run within a small multiple of the unfused sim count
    assert f.n_sim <= 4 * u.n_sim
    np.testing.assert_allclose(f.sample_means_array, u.sample_means_array,
                               atol=0.12)


def test_adaptive_threshold_smc_fused(ma2):
    from elfi_tpu.methods.density_ratio_estimation import \
        DensityRatioEstimation

    def make():
        return elfi.AdaptiveThresholdSMC(
            ma2["d"], batch_size=500, seed=11, initial_quantile=0.3,
            densratio_estimation=DensityRatioEstimation(n=20, epsilon=0.001,
                                                        max_iter=200,
                                                        abs_tol=0.01))
    f1 = make().sample(100, max_iter=3, bar=False, fused=True)
    f2 = make().sample(100, max_iter=3, bar=False, fused=True)
    np.testing.assert_array_equal(f1.samples_array, f2.samples_array)
    assert 1 <= f1.n_populations <= 3

    u = make().sample(100, max_iter=3, bar=False, fused=False)
    np.testing.assert_allclose(f1.sample_means_array, u.sample_means_array,
                               atol=0.3)


def test_adaptive_distance_smc_three_rounds():
    """Rounds >= 3 replay the SMC round program from the SHARED model
    cache while the adaptive weights holder has grown — the program must
    retrace per weights version (a stale executable with len(w) baked at
    round 1 crashed round 2 with a broadcast shape error)."""
    from elfi_tpu.models import ma2 as ma2_module
    m = ma2_module.get_model(seed_obs=4)
    elfi.AdaptiveDistance(m["S1"], m["S2"], model=m, name="ad")
    smc = elfi.AdaptiveDistanceSMC(m["ad"], batch_size=100, seed=5)
    res = smc.sample(20, rounds=3, quantile=0.5, bar=False)
    assert res.n_samples == 20
    # three adaptation rounds -> three frozen weight vectors recorded
    assert len(res.adaptive_distance_w) == 3
