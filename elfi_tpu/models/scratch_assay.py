"""Scratch assay cell-migration model (Johnston et al. 2014, Price et al.
2018; reference ``elfi/examples/scratch_assay.py``).

The simulator is an inherently sequential lattice process (each motility /
proliferation attempt observes earlier moves in the same step), so it runs
as a HOST operation vectorised with the loop vectorizer — the honest
translation until a lattice-kernel port; the inference stack treats it
exactly like the external C++ BDM simulator."""

from __future__ import annotations

import numpy as np

import elfi_tpu as elfi
from ..model.tools import vectorize

__all__ = ["cell_sim", "cell_summaries", "get_model"]


def _random_init(nrows, ncols, ncell, nrows_init, random_state=None):
    random_state = random_state or np.random
    init = np.zeros(nrows * ncols)
    init[:ncell] = 1.0
    init[:nrows_init * ncols] = random_state.permutation(
        init[:nrows_init * ncols])
    return init.reshape(nrows, ncols)


_MOVES = np.array([(1, 0), (-1, 0), (0, 1), (0, -1)])


def _random_move(coords, nrows, ncols, random_state):
    prop = np.asarray(coords) + _MOVES[random_state.choice(4)]
    return np.minimum(np.maximum(prop, 0), [nrows - 1, ncols - 1])


def cell_sim(pm, pp, init_arr=None, init_params=None, obs_period=12,
             obs_interval=1 / 12, tau=1 / 24, random_state=None):
    """One realization of the lattice process; (nrows, ncols, num_obs+1)."""
    random_state = random_state or np.random
    if init_arr is None:
        init_params = init_params or [27, 36, 100, 10]
        cell_arr = _random_init(*init_params, random_state=random_state)
    else:
        cell_arr = np.copy(init_arr)
    nrows, ncols = cell_arr.shape
    num_iter = int(obs_period / tau)
    obs_every = int(obs_interval / tau)
    num_obs = int(num_iter / obs_every)
    obs_arr = np.ones((num_obs + 1, nrows, ncols))
    obs_arr[0] = np.copy(cell_arr)

    for iteration in range(num_iter):
        num_cells = int(np.sum(cell_arr))
        coords = np.transpose(np.array(np.where(cell_arr)))
        if num_cells < nrows * ncols:
            # motility attempts (with replacement)
            cand = random_state.choice(num_cells, size=num_cells)
            cand = cand[random_state.uniform(size=num_cells) < pm]
            for cell in cand:
                new = _random_move(coords[cell], nrows, ncols, random_state)
                if cell_arr[new[0], new[1]] == 0:
                    cell_arr[coords[cell][0], coords[cell][1]] = 0
                    cell_arr[new[0], new[1]] = 1
                    coords[cell] = new
            # proliferation attempts
            cand = random_state.choice(num_cells, size=num_cells)
            cand = cand[random_state.uniform(size=num_cells) < pp]
            for cell in cand:
                new = _random_move(coords[cell], nrows, ncols, random_state)
                cell_arr[new[0], new[1]] = 1
        if (iteration + 1) % obs_every == 0:
            obs_arr[(iteration + 1) // obs_every] = np.copy(cell_arr)
    return np.transpose(obs_arr, (1, 2, 0))


def cell_summaries(x):
    """Consecutive-frame mismatches + final count;
    (batch, num_obs+1)."""
    x = np.asarray(x)
    ds = np.sum(np.abs(x[:, :, :, :-1] - x[:, :, :, 1:]), axis=(1, 2))
    count = np.sum(x[:, :, :, -1], axis=(1, 2))[:, None]
    return np.concatenate((ds, count), axis=1)


def get_model(true_params=None, init_arr=None, init_params=None,
              seed_obs=None, obs_period=12, obs_interval=1 / 12, tau=1 / 24):
    """Scratch assay inference model (reference
    ``scratch_assay.py:get_model``)."""
    if true_params is None:
        true_params = [0.25, 0.002]
    from functools import partial
    single = partial(cell_sim, init_arr=init_arr, init_params=init_params,
                     obs_period=obs_period, obs_interval=obs_interval,
                     tau=tau)
    sim_fn = vectorize(single)
    y_obs = single(*true_params,
                   random_state=np.random.RandomState(seed_obs))
    m = elfi.Model(name="scratch_assay")
    elfi.Prior("uniform", 0, 1, model=m, name="pm")
    elfi.Prior("uniform", 0, 1, model=m, name="pp")
    elfi.Simulator(sim_fn, m["pm"], m["pp"], observed=y_obs, model=m,
                   name="sim")
    elfi.Summary(cell_summaries, m["sim"], model=m, name="S", host=True)
    elfi.Distance("euclidean", m["S"], model=m, name="d")
    return m
