"""Dask adapter backend — attach to an externally-managed
``dask.distributed`` scheduler (reference ``elfi/clients/dask.py:17-111``).

Optional dependency: requires ``dask[distributed]`` to be installed and a
scheduler reachable.  Loaded through the entry-point hook::

    elfi.set_client("elfi_tpu.parallel.dask_client",
                    address="tcp://scheduler:8786")

With no ``address``, ``dask.distributed.Client()`` spins up a local
cluster (dask's default), matching the reference's behavior.

Like the reference's dask client, tasks are shipped as pickled callables;
the engine's determinism contract (a batch is a pure function of
``(seed, batch_index)``) makes results bit-identical to the native
backend and failed/lost tasks replayable.  Intended for farming
HOST-side / external simulators across machines; worker processes compute
on CPU (in-process/threaded workers inherit the master's backend — see
:func:`~elfi_tpu.parallel.backends._run_adapter_batch`).
"""

from __future__ import annotations

import os

import numpy as np

from .backends import BackendBase, _run_adapter_batch

__all__ = ["Client"]

# importable under the historical name (tests ship it to raw workers)
_run_batch = _run_adapter_batch


class Client(BackendBase):
    """BackendBase-protocol adapter over ``dask.distributed.Client``."""

    def __init__(self, address=None, dask_client=None, **kwargs):
        super().__init__()
        if dask_client is None:
            from dask.distributed import Client as DaskClient
            dask_client = DaskClient(address, **kwargs) if address \
                else DaskClient(**kwargs)
        self.dask_client = dask_client

    @property
    def num_cores(self):
        try:
            return max(1, sum(self.dask_client.ncores().values()))
        except Exception:
            return 1

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        overrides = {k: np.asarray(v) for k, v in (overrides or {}).items()}
        return self.dask_client.submit(
            _run_adapter_batch, program, seed, batch_index, overrides,
            batch_size, os.getpid(), pure=False)

    def _materialize(self, handle):
        return handle.result()

    def _handle_ready(self, handle):
        return handle.done()

    def _run_thunk(self, fn, args, kwargs):
        return self.dask_client.submit(fn, *args, **kwargs,
                                       pure=False).result()

    def remove_task(self, task_id):
        handle = self._tasks.pop(task_id, None)
        if handle is not None and not isinstance(handle, tuple):
            try:
                handle.cancel()
            except Exception:
                pass

    def apply_sync(self, fn, *args, **kwargs):
        return self.dask_client.submit(fn, *args, **kwargs,
                                       pure=False).result()

    def close(self):
        try:
            self.dask_client.close()
        except Exception:
            pass
