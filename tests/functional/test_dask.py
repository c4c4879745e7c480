"""Dask adapter backend (reference ``elfi/clients/dask.py`` parity) —
skipped when dask isn't installed, mirroring the reference's
skip-unavailable-client fixture pattern (``tests/conftest.py:35-52``)."""

import numpy as np
import pytest

dask_distributed = pytest.importorskip("dask.distributed")

pytestmark = pytest.mark.slow


def test_dask_backend_matches_native():
    import elfi_tpu as elfi
    from elfi_tpu.models import ma2

    m = ma2.get_model(seed_obs=4)
    prev = elfi.get_client()
    client = None
    try:
        backend = elfi.set_client(
            "elfi_tpu.parallel.dask_client",
            n_workers=2, threads_per_worker=1, processes=False)
        client = backend
        res = elfi.Rejection(m["d"], batch_size=100, seed=13).sample(
            20, n_sim=1000, bar=False)
        elfi.set_client("native")
        ref = elfi.Rejection(m["d"], batch_size=100, seed=13).sample(
            20, n_sim=1000, bar=False, fused=False)
        np.testing.assert_array_equal(res.samples_array, ref.samples_array)
    finally:
        elfi.set_client(prev)
        if client is not None:
            client.close()
