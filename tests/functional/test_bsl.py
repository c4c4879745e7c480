import numpy as np
import pytest

import elfi_tpu as elfi
from elfi_tpu.methods.bsl import (estimate_whitening_matrix,
                                  gaussian_syn_likelihood,
                                  gaussian_syn_likelihood_ghurye_olkin,
                                  robust_likelihood,
                                  semi_param_kernel_estimate,
                                  semiparametric_likelihood,
                                  standard_likelihood)


@pytest.fixture(scope="module")
def ssx_ssy():
    rng = np.random.RandomState(0)
    ssx = rng.multivariate_normal([1.0, -1.0], [[1.0, 0.3], [0.3, 0.5]],
                                  size=300)
    ssy = np.array([1.1, -0.9])
    return ssx, ssy


class TestEstimators:
    def test_gaussian(self, ssx_ssy):
        ssx, ssy = ssx_ssy
        ll = gaussian_syn_likelihood(ssx, ssy)
        import scipy.stats as ss
        expected = ss.multivariate_normal.logpdf(
            ssy, ssx.mean(0), np.cov(ssx, rowvar=False))
        np.testing.assert_allclose(ll[0], expected, rtol=1e-10)

    def test_gaussian_warton(self, ssx_ssy):
        ssx, ssy = ssx_ssy
        ll = gaussian_syn_likelihood(ssx, ssy, shrinkage="warton",
                                     penalty=0.3)
        assert np.isfinite(ll[0])

    def test_gaussian_glasso(self, ssx_ssy):
        ssx, ssy = ssx_ssy
        ll = gaussian_syn_likelihood(ssx, ssy, shrinkage="glasso",
                                     penalty=0.1)
        assert np.isfinite(ll[0])

    def test_unbiased(self, ssx_ssy):
        ssx, ssy = ssx_ssy
        ll_u = gaussian_syn_likelihood_ghurye_olkin(ssx, ssy)
        ll_s = gaussian_syn_likelihood(ssx, ssy)
        # unbiased estimator close to standard at large n
        assert abs(ll_u[0] - ll_s[0]) < 0.5

    def test_semiparametric(self, ssx_ssy):
        ssx, ssy = ssx_ssy
        ll = semi_param_kernel_estimate(ssx, ssy)
        ll_g = gaussian_syn_likelihood(ssx, ssy)
        assert np.isfinite(ll[0])
        assert abs(ll[0] - ll_g[0]) < 1.0  # Gaussian data: should agree

    def test_semiparametric_whitening(self, ssx_ssy):
        ssx, ssy = ssx_ssy
        z = (ssx - ssx.mean(0)) / ssx.std(0)
        w, v = np.linalg.eigh(np.cov(z.T))
        W = np.diag(w ** -0.5) @ v.T
        ll = semi_param_kernel_estimate(ssx, ssy, shrinkage="warton",
                                        penalty=0.3, whitening=W)
        assert np.isfinite(ll[0])

    def test_misspec_mean(self, ssx_ssy):
        ssx, ssy = ssx_ssy
        fn = robust_likelihood("mean")
        ll0 = fn(ssx, ssy, gamma=np.zeros(2))
        ll_g = gaussian_syn_likelihood(ssx, ssy)
        np.testing.assert_allclose(ll0, ll_g[0], rtol=1e-8)

    def test_factories(self):
        assert callable(standard_likelihood(shrinkage="warton", penalty=0.5))
        assert callable(semiparametric_likelihood())


class TestBslSampling:
    def test_bsl_ma2(self, ma2):
        bsl = elfi.BSL(ma2, n_sim_round=300, batch_size=300, seed=5)
        res = bsl.sample(12, sigma_proposals=np.eye(2) * 0.1, burn_in=2,
                         bar=False)
        assert res.n_samples == 10
        assert set(res.samples) == {"t1", "t2"}
        assert 0 <= res.meta["acc_rate"] <= 1
        ess = res.compute_ess()
        assert set(ess) == {"t1", "t2"}

    def test_bsl_determinism(self, ma2):
        r1 = elfi.BSL(ma2, n_sim_round=200, seed=3).sample(
            6, sigma_proposals=np.eye(2) * 0.1, bar=False)
        r2 = elfi.BSL(ma2, n_sim_round=200, seed=3).sample(
            6, sigma_proposals=np.eye(2) * 0.1, bar=False)
        np.testing.assert_array_equal(r1.samples["t1"], r2.samples["t1"])

    def test_bsl_logit_transform(self, ma2):
        bsl = elfi.BSL(ma2, n_sim_round=200, seed=7)
        res = bsl.sample(6, sigma_proposals=np.eye(2) * 0.1,
                         logit_transform_bound=[(-2, 2), (-1, 1)], bar=False)
        assert np.all(res.samples["t1"] > -2) and \
            np.all(res.samples["t1"] < 2)

    def test_bsl_misspec(self, ma2):
        bsl = elfi.BSL(ma2, n_sim_round=200, seed=7,
                       likelihood=robust_likelihood("mean"))
        res = bsl.sample(5, sigma_proposals=np.eye(2) * 0.1, bar=False)
        assert "gamma" in res.samples_all

    def test_whitening_pipeline(self, ma2):
        W = estimate_whitening_matrix(ma2, 300, [0.6, 0.2],
                                      ["S1", "S2"], seed=1)
        assert W.shape == (2, 2)
        bsl = elfi.BSL(ma2, n_sim_round=200, seed=2,
                       likelihood=standard_likelihood(
                           shrinkage="warton", penalty=0.5, whitening=W))
        res = bsl.sample(5, sigma_proposals=np.eye(2) * 0.1, bar=False)
        assert res.n_samples == 5


class TestFusedBSL:
    def _run(self, ma2, fused, seed=4, likelihood=None, bound=None):
        bsl = elfi.BSL(ma2, n_sim_round=300, feature_names=["S1", "S2"],
                       seed=seed, likelihood=likelihood)
        return bsl.sample(120, sigma_proposals=np.diag([.05, .05]),
                          params0=np.array([[.6, .2]]), burn_in=20,
                          logit_transform_bound=bound, fused=fused,
                          bar=False)

    def test_fused_deterministic(self, ma2):
        r1 = self._run(ma2, fused=True)
        r2 = self._run(ma2, fused=True)
        np.testing.assert_array_equal(r1.samples_array, r2.samples_array)
        r3 = self._run(ma2, fused=True, seed=5)
        assert not np.array_equal(r1.samples_array, r3.samples_array)

    def test_fused_statistically_matches_host(self, ma2):
        f = self._run(ma2, fused=True)
        u = self._run(ma2, fused=False)
        # different RNG streams (device vs numpy) -> statistical agreement
        np.testing.assert_allclose(f.sample_means_array,
                                   u.sample_means_array, atol=0.15)
        assert 0.05 < f.meta["acc_rate"] < 1.0

    def test_fused_warton_and_unbiased(self, ma2):
        from elfi_tpu.methods.bsl import (standard_likelihood,
                                          unbiased_likelihood)
        f1 = self._run(ma2, fused=True,
                       likelihood=standard_likelihood(shrinkage="warton",
                                                      penalty=0.3))
        f2 = self._run(ma2, fused=True, likelihood=unbiased_likelihood())
        for f in (f1, f2):
            assert np.all(np.isfinite(f.samples_array))

    def test_fused_logit_transform(self, ma2):
        bound = np.array([[-1.0, 1.0], [-1.0, 1.0]])
        f = self._run(ma2, fused=True, bound=bound)
        u = self._run(ma2, fused=False, bound=bound)
        assert np.all((f.samples_array > -1) & (f.samples_array < 1))
        np.testing.assert_allclose(f.sample_means_array,
                                   u.sample_means_array, atol=0.15)

    def test_semiparametric_stays_host(self, ma2):
        from elfi_tpu.methods.bsl import semiparametric_likelihood
        with pytest.raises(ValueError):
            self._run(ma2, fused=True,
                      likelihood=semiparametric_likelihood())
