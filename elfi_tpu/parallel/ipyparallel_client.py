"""ipyparallel adapter backend — attach to a running ipcluster
(reference ``elfi/clients/ipyparallel.py:22-121``).

Optional dependency: requires ``ipyparallel`` and a running controller
(``ipcluster start -n 4``).  Loaded through the entry-point hook::

    elfi.set_client("elfi_tpu.parallel.ipyparallel_client")

Batch tasks dispatch through the controller's load-balanced view; the
engine's determinism contract (a batch is a pure function of
``(seed, batch_index)``) keeps results bit-identical to the native
backend.  Intended for farming HOST-side / external simulators; engine
workers compute on CPU.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Client"]


def _run_batch(program, seed, batch_index, overrides, batch_size):
    # force CPU JAX and drop any inherited persistent compile cache
    # BEFORE first backend use (see dask_client._run_batch)
    from elfi_tpu.parallel.backends import _mp_worker_init
    _mp_worker_init()
    import jax
    out = program.run(jax.random.key(seed), batch_index, overrides,
                      batch_size)
    return {k: np.asarray(v) for k, v in out.items()}


class Client:
    """BackendBase-protocol adapter over
    ``ipyparallel.Client().load_balanced_view()``."""

    def __init__(self, ipp_client=None, **kwargs):
        if ipp_client is None:
            import ipyparallel as ipp
            ipp_client = ipp.Client(**kwargs)
        self.ipp_client = ipp_client
        self.view = ipp_client.load_balanced_view()
        self._tasks = {}
        self._next = 0

    @property
    def num_cores(self):
        return max(1, len(self.view))

    def submit(self, program, seed, batch_index, overrides, batch_size):
        tid = self._next
        self._next += 1
        overrides = {k: np.asarray(v) for k, v in (overrides or {}).items()}
        self._tasks[tid] = self.view.apply(
            _run_batch, program, seed, batch_index, overrides, batch_size)
        return tid

    def get_result(self, task_id):
        handle = self._tasks.pop(task_id)
        if isinstance(handle, tuple) and handle and handle[0] == "thunk":
            _, fn, args, kwargs = handle
            return self.view.apply(fn, *args, **kwargs).get()
        return handle.get()

    def is_ready(self, task_id):
        handle = self._tasks.get(task_id)
        if isinstance(handle, tuple):
            return True
        return handle is not None and handle.ready()

    def remove_task(self, task_id):
        handle = self._tasks.pop(task_id, None)
        if handle is not None and not isinstance(handle, tuple) \
                and not handle.ready():
            # ipyparallel can only abort tasks that haven't started
            try:
                self.ipp_client.abort(handle, block=False)
            except Exception:
                pass

    def reset(self):
        try:
            self.view.abort(block=False)
        except Exception:
            pass
        self._tasks.clear()

    def apply(self, fn, *args, **kwargs):
        tid = self._next
        self._next += 1
        self._tasks[tid] = ("thunk", fn, args, kwargs)
        return tid

    def apply_sync(self, fn, *args, **kwargs):
        return self.view.apply_sync(fn, *args, **kwargs)

    def close(self):
        try:
            self.ipp_client.close()
        except Exception:
            pass
