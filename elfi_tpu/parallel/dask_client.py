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
on CPU.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Client"]


def _run_batch(program, seed, batch_index, overrides, batch_size):
    # runs on the dask worker: force CPU JAX and drop any inherited
    # persistent compile cache BEFORE first backend use (the env var
    # alone does not stop an accelerator plugin loaded via
    # sitecustomize, and foreign XLA:CPU cache entries can SIGILL)
    from elfi_tpu.parallel.backends import _mp_worker_init
    _mp_worker_init()
    import jax
    out = program.run(jax.random.key(seed), batch_index, overrides,
                      batch_size)
    return {k: np.asarray(v) for k, v in out.items()}


class Client:
    """BackendBase-protocol adapter over ``dask.distributed.Client``."""

    def __init__(self, address=None, dask_client=None, **kwargs):
        if dask_client is None:
            from dask.distributed import Client as DaskClient
            dask_client = DaskClient(address, **kwargs) if address \
                else DaskClient(**kwargs)
        self.dask_client = dask_client
        self._tasks = {}
        self._next = 0

    @property
    def num_cores(self):
        try:
            return max(1, sum(self.dask_client.ncores().values()))
        except Exception:
            return 1

    def submit(self, program, seed, batch_index, overrides, batch_size):
        tid = self._next
        self._next += 1
        overrides = {k: np.asarray(v) for k, v in (overrides or {}).items()}
        self._tasks[tid] = self.dask_client.submit(
            _run_batch, program, seed, batch_index, overrides, batch_size,
            pure=False)
        return tid

    def get_result(self, task_id):
        handle = self._tasks.pop(task_id)
        if isinstance(handle, tuple) and handle and handle[0] == "thunk":
            _, fn, args, kwargs = handle
            return self.dask_client.submit(fn, *args, **kwargs,
                                           pure=False).result()
        return handle.result()

    def is_ready(self, task_id):
        handle = self._tasks.get(task_id)
        if isinstance(handle, tuple):
            return True
        return handle is not None and handle.done()

    def remove_task(self, task_id):
        handle = self._tasks.pop(task_id, None)
        if handle is not None and not isinstance(handle, tuple):
            try:
                handle.cancel()
            except Exception:
                pass

    def reset(self):
        for tid in list(self._tasks):
            self.remove_task(tid)

    def apply(self, fn, *args, **kwargs):
        tid = self._next
        self._next += 1
        self._tasks[tid] = ("thunk", fn, args, kwargs)
        return tid

    def apply_sync(self, fn, *args, **kwargs):
        return self.dask_client.submit(fn, *args, **kwargs,
                                       pure=False).result()

    def close(self):
        try:
            self.dask_client.close()
        except Exception:
            pass
