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
