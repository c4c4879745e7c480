"""Checkpoint / resume semantics (reference SURVEY.md §5):

1. pool replay — re-running an inference against a stored pool replays
   stored batches instead of re-simulating (reference
   ``tests/functional/test_simulation_reuse.py``),
2. method-level continuation — calling the inference again with a larger
   objective continues from stored state (BO with more evidence, SMC with
   more rounds).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import elfi_tpu as elfi

_SIM_CALLS = {"n": 0}


def _counting_sim(t1, batch_size=1, random_state=None):
    """Host-side simulator with a call counter (host ops run in-process on
    the native backend, so the counter observes real executions)."""
    _SIM_CALLS["n"] += 1
    t1 = np.atleast_1d(np.asarray(t1, dtype=np.float64))
    noise = random_state.normal(size=(batch_size, 5))
    return t1[:, None] + noise


def _counting_model():
    m = elfi.Model(name="resume_counting")
    elfi.Prior("uniform", 0, 1, model=m, name="t1")
    sim = elfi.Simulator(elfi.tools.mark_host(_counting_sim), m["t1"],
                         observed=np.full((1, 5), 0.5), model=m, name="sim")
    s = elfi.Summary(lambda x: np.mean(np.asarray(x), axis=1,
                                       keepdims=True), sim, model=m,
                     name="S")
    elfi.Distance("euclidean", s, model=m, name="d")
    return m


def test_pool_replay_skips_simulation():
    m = _counting_model()
    pool = elfi.OutputPool(["sim"])
    _SIM_CALLS["n"] = 0
    rej = elfi.Rejection(m["d"], batch_size=10, seed=7, pool=pool)
    res1 = rej.sample(5, n_sim=40, bar=False)
    calls_first = _SIM_CALLS["n"]
    assert calls_first >= 4  # 40 sims / batch 10

    rej2 = elfi.Rejection(m["d"], batch_size=10, seed=7, pool=pool)
    res2 = rej2.sample(5, n_sim=40, bar=False)
    assert _SIM_CALLS["n"] == calls_first  # all batches replayed from pool
    np.testing.assert_allclose(res1.samples_array, res2.samples_array)


def test_pool_extends_on_longer_run():
    m = _counting_model()
    pool = elfi.OutputPool(["sim"])
    _SIM_CALLS["n"] = 0
    elfi.Rejection(m["d"], batch_size=10, seed=7, pool=pool).sample(
        5, n_sim=20, bar=False)
    first = _SIM_CALLS["n"]
    elfi.Rejection(m["d"], batch_size=10, seed=7, pool=pool).sample(
        5, n_sim=40, bar=False)
    # only the 2 new batch indices simulate; the first 2 replay
    assert _SIM_CALLS["n"] == first + 2
    assert len(pool.stores["sim"]) == 4


def test_bo_continuation(ma2):
    bo = elfi.BayesianOptimization(
        ma2["d"], initial_evidence=10, batch_size=5, update_interval=10,
        bounds={"t1": (0, 2), "t2": (0, 1)}, seed=3)
    bo.infer(n_evidence=15, bar=False)
    assert bo.n_evidence == 15
    bo.infer(n_evidence=25, bar=False)  # continues, does not restart
    assert bo.n_evidence == 25
    assert bo.target_model.n_evidence == 25
    # requesting less evidence than exists only warns; state is untouched
    bo.set_objective(n_evidence=5)
    assert bo.n_evidence == 25


def test_smc_continuation(ma2):
    smc = elfi.SMC(ma2["d"], batch_size=200, seed=11)
    res1 = smc.sample(50, quantiles=[0.5], bar=False)
    assert res1.n_populations == 1
    res2 = smc.sample(50, quantiles=[0.5], bar=False)
    assert res2.n_populations == 2
    # earlier populations are preserved in the continued result
    np.testing.assert_allclose(res2.populations[0].samples_array,
                               res1.populations[0].samples_array)


def test_model_save_load_roundtrip(ma2, tmp_path):
    path = ma2.save(prefix=str(tmp_path))  # saves <prefix>/<model name>.pkl
    loaded = elfi.load_model(path)
    r1 = elfi.Rejection(ma2["d"], batch_size=100, seed=5).sample(
        10, n_sim=200, bar=False)
    r2 = elfi.Rejection(loaded["d"], batch_size=100, seed=5).sample(
        10, n_sim=200, bar=False)
    np.testing.assert_allclose(r1.samples_array, r2.samples_array)


_FLAKY = {"fail_next": 0, "calls": 0}


def _flaky_sim(t1, batch_size=1, random_state=None):
    """Host simulator that raises while the fail budget lasts — exercises
    deterministic resubmission (SURVEY.md §5: failed batch indices are
    replayable by construction of the counter RNG)."""
    _FLAKY["calls"] += 1
    if _FLAKY["fail_next"] > 0:
        _FLAKY["fail_next"] -= 1
        raise RuntimeError("transient simulator failure")
    t1 = np.atleast_1d(np.asarray(t1, dtype=np.float64))
    return t1[:, None] + random_state.normal(size=(batch_size, 4))


def _flaky_model():
    m = elfi.Model(name="flaky")
    elfi.Prior("uniform", 0, 1, model=m, name="t1")
    sim = elfi.Simulator(elfi.tools.mark_host(_flaky_sim), m["t1"],
                         observed=np.full((1, 4), 0.5), model=m, name="sim")
    s = elfi.Summary(lambda x: np.mean(np.asarray(x), axis=1,
                                       keepdims=True), sim, model=m,
                     name="S")
    elfi.Distance("euclidean", s, model=m, name="d")
    return m


def test_failed_batch_is_resubmitted_deterministically():
    m = _flaky_model()
    _FLAKY.update(fail_next=0, calls=0)
    clean = elfi.Rejection(m["d"], batch_size=20, seed=3).sample(
        5, n_sim=100, bar=False)

    _FLAKY.update(fail_next=2, calls=0)  # first two executions die
    recovered = elfi.Rejection(m["d"], batch_size=20, seed=3).sample(
        5, n_sim=100, bar=False)
    np.testing.assert_array_equal(clean.samples_array,
                                  recovered.samples_array)

    _FLAKY.update(fail_next=10**6)  # permanent failure -> hard error
    with pytest.raises(RuntimeError):
        elfi.Rejection(m["d"], batch_size=20, seed=4).sample(
            5, n_sim=100, bar=False)
    _FLAKY.update(fail_next=0)
