"""Dedicated multiprocessing-backend tests (kept out of the main
parametrized matrix: spawn workers re-import JAX, which is slow on a
single-core CI box)."""

import numpy as np
import pytest

import elfi_tpu as elfi


pytestmark = pytest.mark.slow  # excluded from the fast CI gate

@pytest.fixture(scope="module")
def mp_client():
    try:
        c = elfi.MultiprocessingBackend(num_processes=2)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"could not construct multiprocessing backend: {e}")
    yield c


def test_rejection_through_process_pool(ma2, mp_client):
    pre = elfi.get_client()
    try:
        elfi.set_client(mp_client)
        rej = elfi.Rejection(ma2["d"], batch_size=20, seed=11)
        res = rej.sample(5, n_sim=60, fused=False, bar=False)
        assert res.n_samples == 5
        # bit-identical with the native backend for the same seed
        elfi.set_client(elfi.NativeBackend())
        res_native = elfi.Rejection(ma2["d"], batch_size=20, seed=11).sample(
            5, n_sim=60, fused=False, bar=False)
        np.testing.assert_allclose(np.asarray(res.samples["t1"]),
                                   np.asarray(res_native.samples["t1"]),
                                   rtol=1e-6)
    finally:
        elfi.set_client(pre)


def _host_sim(mu, batch_size, random_state):
    # module-level: ops must be picklable for the process pool
    return np.asarray(mu)[:, None] + random_state.randn(batch_size, 4)


def _host_mean(x):
    return np.mean(np.asarray(x), axis=1)


def test_host_simulator_through_process_pool(mp_client):
    """External-style (host) simulators farm to worker processes."""
    m = elfi.Model(name="mp_host")
    elfi.Prior("uniform", -1, 2, model=m, name="mu")
    elfi.Simulator(_host_sim, m["mu"], host=True,
                   observed=np.array([.4, .6, .5, .4]), model=m, name="sim")
    elfi.Summary(_host_mean, m["sim"], model=m, name="S", host=True)
    elfi.Distance("euclidean", m["S"], model=m, name="d")

    pre = elfi.get_client()
    try:
        elfi.set_client(mp_client)
        rej = elfi.Rejection(m["d"], batch_size=25, seed=3)
        res = rej.sample(5, n_sim=50, fused=False, bar=False)
        assert res.n_samples == 5
        assert np.all(np.isfinite(res.samples_array))
    finally:
        elfi.set_client(pre)
