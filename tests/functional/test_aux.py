"""Tests for post-processing, model selection, diagnostics, testbench,
and visualization entry points."""

import numpy as np
import pytest

import elfi_tpu as elfi


def test_adjust_posterior(ma2):
    rej = elfi.Rejection(ma2["d"], output_names=["S1", "S2"],
                         batch_size=100, seed=3)
    res = rej.sample(50, n_sim=500, bar=False)
    adj = elfi.adjust_posterior(res, rej.model, ["S1", "S2"],
                                ["t1", "t2"])
    assert adj.n_samples == 50
    assert set(adj.samples) == {"t1", "t2"}
    # adjusted samples differ from raw but stay in a sane range
    assert not np.allclose(adj.samples["t1"], res.samples["t1"])
    assert np.all(np.abs(adj.samples["t1"]) < 5)


def test_compare_models(ma2):
    r1 = elfi.Rejection(ma2["d"], batch_size=50, seed=1).sample(
        20, n_sim=200, bar=False)
    r2 = elfi.Rejection(ma2["d"], batch_size=50, seed=2).sample(
        20, n_sim=400, bar=False)
    p = elfi.compare_models([r1, r2])
    assert p.shape == (2,)
    np.testing.assert_allclose(p.sum(), 1.0)
    p2 = elfi.compare_models([r1, r2], model_priors=[0.9, 0.1])
    assert p2[0] > p[0]


def test_two_stage_selection(ma2):
    import jax.numpy as jnp
    from functools import partial

    def ss_mean(y):
        return jnp.mean(y, axis=1)

    def ss_var(y):
        return jnp.var(y, axis=1)

    selector = elfi.TwoStageSelection(ma2["MA2"], "euclidean",
                                      list_ss=[ss_mean, ss_var],
                                      max_cardinality=2, seed=4)
    best = selector.run(n_sim=400, n_acc=40, n_closest=4, batch_size=100)
    assert isinstance(best, tuple)
    assert 1 <= len(best) <= 2


def test_testbench(ma2):
    tb = elfi.Testbench(model=ma2, repetitions=2, seed=7,
                        progress_bar=False)
    method = elfi.TestbenchMethod(
        elfi.Rejection, method_kwargs={"batch_size": 50, "discrepancy_name": "d"},
        sample_kwargs={"n_samples": 10, "n_sim": 100, "bar": False,
                       "fused": False},
        name="rejection")
    tb.add_method(method)
    tb.run()
    out = tb.get_testbench_results()
    assert len(out["results"]) == 1
    assert len(out["results"][0]["results"]) == 2
    diffs = tb.parameterwise_sample_mean_differences()
    assert set(diffs["rejection"]) == {"t1", "t2"}


def test_visualization_entry_points(ma2, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    rej = elfi.Rejection(ma2["d"], batch_size=50, seed=3)
    res = rej.sample(20, n_sim=200, bar=False)
    res.plot_marginals()
    res.plot_pairs()
    elfi.draw(ma2)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_live_vis_plumbing(ma2):
    """vis= drives plot_state every consumed batch (reference
    parameter_inference.py:205-246 + interactive.py); headless-safe."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    import jax.numpy as jnp

    import elfi_tpu as elfi

    calls = []
    rej = elfi.Rejection(ma2["d"], batch_size=2000, seed=0)
    orig = rej.plot_state

    def counting(**kw):
        calls.append(kw)
        return orig(**kw)

    rej.plot_state = counting
    res = rej.sample(50, n_sim=8000, bar=False,
                     vis=dict(xlim=(-2, 2), ylim=(-1, 1)))
    assert res.n_samples == 50
    n_batches = 8000 // 2000
    assert len(calls) == n_batches + 1          # per batch + final close
    assert calls[0]["interactive"] and calls[0]["xlim"] == (-2, 2)
    assert calls[-1]["close"] and "interactive" not in calls[-1]

    # BOLFI: vis falls back to the host loop and draws GP contours
    m = ma2.copy()
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d_vis")
    b = elfi.BOLFI(m["log_d_vis"], batch_size=1, initial_evidence=10,
                   update_interval=5, seed=1,
                   bounds={"t1": (-2, 2), "t2": (-1, 1)})
    b.fit(n_evidence=12, bar=False, vis=True)
    assert b.target_model.n_evidence == 12
