"""ipyparallel adapter backend (reference ``elfi/clients/ipyparallel.py``
parity) — skipped when ipyparallel isn't installed, mirroring the
reference's skip-unavailable-client fixture pattern
(``tests/conftest.py:35-52``)."""

import numpy as np
import pytest

ipp = pytest.importorskip("ipyparallel")

pytestmark = pytest.mark.slow


def test_ipyparallel_backend_matches_native():
    import elfi_tpu as elfi
    from elfi_tpu.models import ma2

    try:
        cluster = ipp.Cluster(n=2)
        rc = cluster.start_and_connect_sync()
    except Exception as e:
        pytest.skip(f"could not start an ipyparallel cluster: {e}")

    m = ma2.get_model(seed_obs=4)
    prev = elfi.get_client()
    try:
        backend = elfi.set_client("elfi_tpu.parallel.ipyparallel_client",
                                  ipp_client=rc)
        res = elfi.Rejection(m["d"], batch_size=100, seed=13).sample(
            20, n_sim=1000, bar=False)
        elfi.set_client("native")
        ref = elfi.Rejection(m["d"], batch_size=100, seed=13).sample(
            20, n_sim=1000, bar=False, fused=False)
        np.testing.assert_array_equal(res.samples_array, ref.samples_array)
        backend.close()
    finally:
        elfi.set_client(prev)
        try:
            cluster.stop_cluster_sync()
        except Exception:
            pass
