"""Smoke tests for the plotting layer (``elfi_tpu/visualization.py``).

The reference ships its visualization module untested; here every public
helper is at least executed headless (Agg backend) against real model
output so signature drift or matplotlib API breakage is caught.
"""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

import matplotlib.pyplot as plt  # noqa: E402

import elfi_tpu as elfi  # noqa: E402
from elfi_tpu import visualization as vis  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


@pytest.fixture
def samples():
    rng = np.random.RandomState(0)
    return {"t1": rng.normal(0.6, 0.1, 200), "t2": rng.normal(0.2, 0.1, 200)}


def test_plot_marginals(samples):
    axes = vis.plot_marginals(samples)
    assert len(axes) == 2
    assert axes[0].get_xlabel() == "t1"


def test_plot_marginals_selector(samples):
    axes = vis.plot_marginals(samples, selector=["t2"])
    assert len(axes) == 1
    assert axes[0].get_xlabel() == "t2"


def test_plot_pairs(samples):
    axes = vis.plot_pairs(samples)
    assert axes.shape == (2, 2)
    assert axes[1][0].get_xlabel() == "t1"
    assert axes[1][0].get_ylabel() == "t2"


def test_plot_traces():
    class FakeResult:
        chains = np.random.RandomState(1).normal(size=(4, 50, 2))
        parameter_names = ["a", "b"]
        warmup = 10

    axes = vis.plot_traces(FakeResult())
    assert len(axes) == 2
    # every chain drawn plus the warmup marker
    assert len(axes[0].lines) == 4 + 1


def test_plot_sample_scatter_and_hist(samples):
    vis.plot_sample(samples)                      # 2-node scatter
    vis.plot_sample(samples, nodes="t1", close=True)  # 1-node histogram


class FakeGP:
    """Duck-typed stand-in for GPRegression in plot helpers."""

    def __init__(self, dim=2, n=30):
        rng = np.random.RandomState(2)
        self.x = rng.uniform(0, 1, size=(n, dim))
        self.y = rng.uniform(0, 1, size=(n, 1))
        self.bounds = [(0.0, 1.0)] * dim

    def predict(self, x):
        x = np.asarray(x)
        mu = np.sum(x, axis=1, keepdims=True)
        return mu, np.ones_like(mu)


def test_plot_discrepancy():
    axes = vis.plot_discrepancy(FakeGP(), ["p0", "p1"])
    assert len(axes) == 2
    assert axes[1].get_xlabel() == "p1"


def test_plot_gp():
    axes = vis.plot_gp(FakeGP(), ["p0", "p1"], resol=8,
                       true_params={"p0": 0.5, "p1": 0.5})
    assert axes.shape == (2, 2)


def test_plot_gp_real_surrogate(ma2):
    """plot_gp/plot_discrepancy against the real GP class, not just the
    duck-type — catches attribute drift in GPRegression itself."""
    bolfi = elfi.BOLFI(ma2["d"], batch_size=4, initial_evidence=12,
                       update_interval=100, bounds={"t1": (-2, 2),
                                                    "t2": (-1, 1)}, seed=7)
    bolfi.fit(n_evidence=12, bar=False)
    vis.plot_gp(bolfi.target_model, ["t1", "t2"], resol=5)
    vis.plot_discrepancy(bolfi.target_model, ["t1", "t2"])


def test_nx_draw(ma2):
    # With or without graphviz this must not raise; graphviz returns a
    # Digraph, the matplotlib fallback returns None.
    vis.nx_draw(ma2)
    vis.nx_draw(ma2, internal=True)


def test_plot_params_vs_node(ma2):
    axes = vis.plot_params_vs_node(ma2["S1"], n_samples=20, seed=3)
    assert len(axes) == len(ma2.parameter_names)


def test_plot_params_vs_node_parameter(ma2):
    axes = vis.plot_params_vs_node(ma2["t1"], n_samples=20, seed=3)
    assert len(axes) == 1


def test_plot_predicted_summaries(ma2):
    axes = vis.plot_predicted_summaries(model=ma2,
                                        summary_names=["S1", "S2"],
                                        n_samples=20, seed=3)
    assert axes.shape == (2, 2)


def test_draw_contour():
    fn = lambda g: np.sum(np.asarray(g) ** 2, axis=1)  # noqa: E731
    pts = np.array([[0.1, 0.2], [0.3, 0.4]])
    ax = vis.draw_contour(fn, [(-1, 1), (-1, 1)], resol=8,
                          parameter_names=["x", "y"], title="t", points=pts)
    assert ax.get_title() == "t"


def test_sample_plot_methods(ma2, with_all_clients):
    """Result-object plotting entry points used in the tutorials."""
    res = elfi.Rejection(ma2["d"], batch_size=64, seed=5).sample(
        20, quantile=0.2, bar=False)
    res.plot_marginals()
    res.plot_pairs()


def test_progress_bar(capsys):
    bar = vis.ProgressBar(prefix="P")
    bar.reinit_progressbar(reinit_msg="round 1")
    bar.update_progressbar(5, 10)
    bar.update_progressbar(10, 10)
    out = capsys.readouterr().out
    assert "round 1" in out and "100.0%" in out
    assert bar.finished
