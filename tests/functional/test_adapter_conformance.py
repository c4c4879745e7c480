"""Protocol-conformance tests for the dask/ipyparallel adapter backends
using in-memory fakes of each library's future/view API.

The real-integration tests (``test_dask.py`` / ``test_ipyparallel.py``)
skip when the optional dependency is absent; these fakes keep the
adapters' BackendBase wiring (submit/_launch, get_result/_materialize,
apply-thunk farming, is_ready, remove_task, deferred launch errors)
exercised in every CI run.  Tasks execute in-process, which also pins the
pid-guard behavior: the shared worker body must leave the master
session's JAX state alone."""

import numpy as np
import pytest

import elfi_tpu as elfi

pytestmark = pytest.mark.slow  # grouped with the other backend suites


class _FakeDaskFuture:
    def __init__(self, fn, args, kwargs):
        try:
            self._value, self._err = fn(*args, **kwargs), None
        except Exception as e:          # surfaced at .result(), like dask
            self._value, self._err = None, e
        self.cancelled = False

    def result(self):
        if self._err is not None:
            raise self._err
        return self._value

    def done(self):
        return True

    def cancel(self):
        self.cancelled = True


class _FakeDaskClient:
    def __init__(self):
        self.futures = []

    def submit(self, fn, *args, pure=False, **kwargs):
        fut = _FakeDaskFuture(fn, args, kwargs)
        self.futures.append(fut)
        return fut

    def ncores(self):
        return {"worker-0": 2, "worker-1": 1}

    def close(self):
        self.closed = True


class _FakeAsyncResult(_FakeDaskFuture):
    def get(self):
        return self.result()

    def ready(self):
        return True


class _FakeView:
    def apply(self, fn, *args, **kwargs):
        return _FakeAsyncResult(fn, args, kwargs)

    def apply_sync(self, fn, *args, **kwargs):
        return fn(*args, **kwargs)

    def abort(self, *a, **k):
        pass

    def __len__(self):
        return 3


class _FakeIppClient:
    def load_balanced_view(self):
        return _FakeView()

    def abort(self, *a, **k):
        pass

    def close(self):
        self.closed = True


def _adapter_clients():
    from elfi_tpu.parallel.dask_client import Client as DaskAdapter
    from elfi_tpu.parallel.ipyparallel_client import Client as IppAdapter
    return [("dask", DaskAdapter(dask_client=_FakeDaskClient())),
            ("ipyparallel", IppAdapter(ipp_client=_FakeIppClient()))]


def test_adapter_rejection_matches_native(ma2):
    prev = elfi.get_client()
    try:
        elfi.set_client("native")
        ref = elfi.Rejection(ma2["d"], batch_size=100, seed=13).sample(
            20, n_sim=1000, fused=False, bar=False)
        for name, client in _adapter_clients():
            elfi.set_client(client)
            assert client.num_cores == 3
            res = elfi.Rejection(ma2["d"], batch_size=100, seed=13).sample(
                20, n_sim=1000, fused=False, bar=False)
            np.testing.assert_array_equal(
                np.asarray(res.samples_array), np.asarray(ref.samples_array),
                err_msg=name)
    finally:
        elfi.set_client(prev)


def test_adapter_thunks_and_task_protocol():
    for name, client in _adapter_clients():
        # apply() stores a thunk: immediately "ready", farmed at get_result
        tid = client.apply(divmod, 7, 3)
        assert client.is_ready(tid)
        assert client.get_result(tid) == (2, 1)

        assert client.apply_sync(divmod, 9, 4) == (2, 1)

        # remove_task cancels a live handle and is a no-op on thunks
        tid2 = client.apply(divmod, 1, 1)
        client.remove_task(tid2)
        client.remove_task(tid2)            # idempotent

        # a submit that blows up at launch defers the error to get_result
        tid3 = client.submit(None, 0, 0, {}, 16)  # None.run -> AttributeError
        assert client.is_ready(tid3)
        with pytest.raises(Exception):
            client.get_result(tid3)

        client.reset()
        assert not client._tasks, name
