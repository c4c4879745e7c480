"""Daycare-center bacterial transmission model (Numminen et al. 2013;
reference ``elfi/examples/daycare.py``) — the BOLFI paper's flagship
example.

A continuous-time Markov SIS process over (daycare x individual x strain)
solved with the Gillespie direct method: the event loop is a single
``lax.while_loop`` whose body is fully vectorised over (batch, dcc) — the
reference's numpy loop translated to a traced device loop with a bounded
step count.  Divergence (documented): a daycare stops evolving once its
clock passes ``time_end``, whereas the reference keeps mutating finished
daycares until the slowest one ends."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import elfi_tpu as elfi

__all__ = ["daycare", "get_model", "ss_shannon", "ss_strains",
           "ss_prevalence", "ss_prevalence_multi", "distance"]

_MAX_EVENTS = 20000


def daycare(t1, t2, t3, n_dcc=29, n_ind=53, n_strains=33,
            freq_strains_commun=None, n_obs=36, time_end=10., batch_size=1,
            key=None):
    """Cross-sectional carriage states; (batch, n_dcc, n_obs, n_strains)."""
    t1 = jnp.asarray(t1, jnp.float32).reshape(-1, 1, 1, 1)
    t2 = jnp.asarray(t2, jnp.float32).reshape(-1, 1, 1, 1)
    t3 = jnp.asarray(t3, jnp.float32).reshape(-1, 1, 1, 1)
    if freq_strains_commun is None:
        freq_strains_commun = jnp.full((n_strains,), 0.1)
    prob_commun = t2 * freq_strains_commun
    n_factor = 1.0 / (n_ind - 1)
    gamma = 1.0

    state0 = jnp.zeros((batch_size, n_dcc, n_ind, n_strains), jnp.bool_)
    time0 = jnp.zeros((batch_size, n_dcc))

    def cond(c):
        state, time, k, steps = c
        return jnp.any(time < time_end) & (steps < _MAX_EVENTS)

    def body(c):
        state, time, k, steps = c
        k, k1, k2 = jax.random.split(k, 3)
        fstate = state.astype(jnp.float32)
        per_ind = jnp.sum(fstate, axis=3, keepdims=True)
        prob_strain_adjust = jnp.where(per_ind > 0, fstate / per_ind, 0.0)
        prob_strain = jnp.sum(prob_strain_adjust, axis=2, keepdims=True)
        intra = t1 * (prob_strain - prob_strain_adjust) * n_factor + 1e-9
        hazards = intra + prob_commun
        any_inf = jnp.any(state, axis=3, keepdims=True)
        hazards = jnp.where(any_inf, t3 * hazards, hazards)
        hazards = jnp.where(state, gamma, hazards)

        total = jnp.sum(hazards, axis=(2, 3))               # (batch, dcc)
        dt = jax.random.exponential(k1, total.shape) / total
        flat = hazards.reshape(batch_size, n_dcc, -1)
        cum = jnp.cumsum(flat, axis=2)
        u = jax.random.uniform(k2, (batch_size, n_dcc, 1)) * total[..., None]
        idx = jnp.sum(u >= cum[:, :, :-1], axis=2)          # (batch, dcc)
        flip = jax.nn.one_hot(idx, n_ind * n_strains,
                              dtype=jnp.bool_).reshape(
            batch_size, n_dcc, n_ind, n_strains)
        active = (time < time_end)[:, :, None, None]
        state = jnp.where(flip & active, ~state, state)
        time = jnp.where(time < time_end, time + dt, time)
        return state, time, k, steps + 1

    state, _, _, _ = jax.lax.while_loop(cond, body,
                                        (state0, time0, key, jnp.int32(0)))
    return state[:, :, :n_obs, :].astype(jnp.float32)


def ss_shannon(data):
    """Shannon diversity per daycare; (batch, n_dcc)."""
    total_obs = jnp.sum(data, axis=2, keepdims=True)
    denom = jnp.sum(total_obs, axis=3, keepdims=True)
    p = jnp.where(denom > 0, total_obs / denom, 0.0)
    p = jnp.where(p == 0, 1.0, p)
    return -jnp.sum(p * jnp.log(p), axis=3)[:, :, 0]


def ss_strains(data):
    return jnp.sum(jnp.any(data > 0, axis=2), axis=2)


def ss_prevalence(data):
    return jnp.sum(jnp.any(data > 0, axis=3), axis=2) / data.shape[2]


def ss_prevalence_multi(data):
    return jnp.sum(jnp.sum(data, axis=3) > 1, axis=2) / data.shape[2]


def distance(*summaries, observed):
    """Gutmann & Corander (2016) single-distance: L1 over obs-normalised,
    sorted per-daycare summaries (reference ``daycare.py:distance``)."""
    sim = jnp.stack([jnp.asarray(s, jnp.float32) for s in summaries])
    obs = jnp.stack([jnp.asarray(o, jnp.float32) for o in observed])
    obs_max = jnp.max(obs, axis=2, keepdims=True)
    obs_max = jnp.where(obs_max == 0, 1.0, obs_max)
    y = jnp.sort(obs / obs_max, axis=2)
    x = jnp.sort(sim / obs_max, axis=2)
    n_ss, _, n_dcc = x.shape
    return jnp.sum(jnp.abs(x - y), axis=(0, 2)) / (n_ss * n_dcc)


def get_model(true_params=None, seed_obs=None, **kwargs):
    """Daycare transmission inference model (reference
    ``daycare.py:get_model``)."""
    if true_params is None:
        true_params = [3.6, 0.6, 0.1]
    sim_fn = partial(daycare, **kwargs)
    y_obs = np.asarray(sim_fn(*[jnp.asarray([p], jnp.float32)
                                for p in true_params], batch_size=1,
                              key=jax.random.key(seed_obs or 0)))[0]
    m = elfi.Model(name="daycare")
    elfi.Prior("uniform", 0, 11, model=m, name="t1")
    elfi.Prior("uniform", 0, 2, model=m, name="t2")
    elfi.Prior("uniform", 0, 1, model=m, name="t3")
    elfi.Simulator(sim_fn, m["t1"], m["t2"], m["t3"], observed=y_obs,
                   model=m, name="DCC")
    ss = [elfi.Summary(ss_shannon, m["DCC"], model=m, name="Shannon"),
          elfi.Summary(ss_strains, m["DCC"], model=m, name="n_strains"),
          elfi.Summary(ss_prevalence, m["DCC"], model=m, name="prevalence"),
          elfi.Summary(ss_prevalence_multi, m["DCC"], model=m,
                       name="multi")]
    elfi.Discrepancy(distance, *ss, model=m, name="d")
    elfi.Operation(jnp.log, m["d"], model=m, name="logd")
    return m
