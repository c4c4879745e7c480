"""Tests for the BSL pre-sampling tuning tools (reference
``elfi/methods/bsl/pre_sample_methods.py``) and the profiling subsystem —
previously only exercised indirectly through the BSL sampler."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

import matplotlib.pyplot as plt  # noqa: E402

from elfi_tpu.methods.bsl import (estimate_whitening_matrix,  # noqa: E402
                                  log_SL_stdev, plot_covariance_matrix,
                                  plot_features, select_penalty,
                                  standard_likelihood)

FEATURES = ["S1", "S2"]
THETA = [0.6, 0.2]


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


def test_plot_features(ma2):
    axes = plot_features(ma2, THETA, n_sim=60, feature_names=FEATURES,
                         seed=1)
    # 2 features -> one row of min(4, k)=2 panels
    assert axes.shape == (1, 2)
    # observed marker drawn on each panel
    assert all(len(ax.lines) == 1 for ax in axes.ravel())


def test_plot_features_dict_theta_and_str_name(ma2):
    axes = plot_features(ma2, {"t1": 0.6, "t2": 0.2}, n_sim=40,
                         feature_names="S1", seed=1)
    assert axes.shape == (1, 1)


@pytest.mark.parametrize("kw", [{}, {"corr": True}, {"precision": True}])
def test_plot_covariance_matrix(ma2, kw):
    ax = plot_covariance_matrix(ma2, THETA, n_sim=60,
                                feature_names=FEATURES, seed=1, **kw)
    mat = ax.images[0].get_array()
    assert mat.shape == (2, 2)
    if kw.get("corr"):
        np.testing.assert_allclose(np.diag(mat), 1.0, atol=1e-6)


def test_log_SL_stdev_shrinks_with_n_sim(ma2):
    stds = log_SL_stdev(ma2, THETA, n_sim=[20, 400],
                        feature_names=FEATURES, M=8, seed=2)
    assert stds.shape == (2,)
    assert np.all(np.isfinite(stds)) and np.all(stds > 0)
    # more simulations -> less log-SL noise (8 replicates, 20x gap: robust)
    assert stds[1] < stds[0]


def test_estimate_whitening_matrix(ma2):
    W = estimate_whitening_matrix(ma2, 400, THETA, FEATURES, seed=3)
    assert W.shape == (2, 2)
    # W whitens the standardized feature correlation: W C W^T = I.
    # Re-simulate the identical features (same seed) to check externally.
    from elfi_tpu.methods.bsl.pre_sample_methods import _simulate_features
    ssx = _simulate_features(ma2, THETA, 400, FEATURES, seed=3)
    z = (ssx - ssx.mean(0)) / ssx.std(0)
    np.testing.assert_allclose(W @ np.cov(z.T) @ W.T, np.eye(2), atol=1e-5)


def test_estimate_whitening_matrix_semiparametric(ma2):
    W = estimate_whitening_matrix(ma2, 200, THETA, FEATURES,
                                  likelihood_type="semiparametric", seed=3)
    assert W.shape == (2, 2) and np.all(np.isfinite(W))
    with pytest.raises(ValueError):
        estimate_whitening_matrix(ma2, 50, THETA, FEATURES,
                                  likelihood_type="bogus")


def test_select_penalty(ma2):
    lmdas = [0.2, 0.5, 0.8]
    pick = select_penalty(ma2, 60, THETA, FEATURES,
                          likelihood=standard_likelihood(),
                          lmdas=lmdas, M=4, shrinkage="warton", seed=4)
    assert pick in lmdas


def test_select_penalty_vector_n_sim(ma2, capsys):
    lmdas = [0.3, 0.6]
    picks = select_penalty(ma2, [40, 80], THETA, FEATURES,
                           likelihood=standard_likelihood(),
                           lmdas=lmdas, M=3, shrinkage="warton", seed=4,
                           verbose=True)
    assert picks.shape == (2,)
    assert all(p in lmdas for p in picks)
    assert "log-SL stds per penalty" in capsys.readouterr().out


def test_timers_report():
    from elfi_tpu.utils.profiling import Timers

    t = Timers()
    with t.time("phase_a"):
        pass
    with t.time("phase_a"):
        pass
    with t.time("phase_b"):
        pass
    rep = t.report()
    assert rep["phase_a"]["calls"] == 2
    assert rep["phase_b"]["calls"] == 1
    assert rep["phase_a"]["total_s"] >= 0
    assert "phase_a" in repr(t)
    t.reset()
    assert t.report() == {} and repr(t) == "Timers()"


def test_timers_accumulate_on_exception():
    from elfi_tpu.utils.profiling import Timers

    t = Timers()
    with pytest.raises(RuntimeError):
        with t.time("failing"):
            raise RuntimeError("boom")
    assert t.report()["failing"]["calls"] == 1


def test_annotate_and_trace(tmp_path):
    import jax.numpy as jnp

    from elfi_tpu.utils.profiling import annotate, trace

    with annotate("region"):
        jnp.arange(4).sum().block_until_ready()
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jnp.arange(4).sum().block_until_ready()
    import os
    assert any(os.scandir(logdir))


def test_batch_handler_keeps_timers(ma2, with_all_clients):
    """Every BatchHandler accumulates submit/wait phases."""
    import elfi_tpu as elfi

    rej = elfi.Rejection(ma2["d"], batch_size=32, seed=11)
    rej.sample(10, quantile=0.5, fused=False, bar=False)
    rep = rej.batches.timers.report()
    assert any(k in rep for k in ("submit", "wait"))
