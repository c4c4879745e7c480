"""ipyparallel adapter backend — attach to a running ipcluster
(reference ``elfi/clients/ipyparallel.py:22-121``).

Optional dependency: requires ``ipyparallel`` and a running controller
(``ipcluster start -n 4``).  Loaded through the entry-point hook::

    elfi.set_client("elfi_tpu.parallel.ipyparallel_client")

Batch tasks dispatch through the controller's load-balanced view; the
engine's determinism contract (a batch is a pure function of
``(seed, batch_index)``) keeps results bit-identical to the native
backend.  Intended for farming HOST-side / external simulators; engine
workers compute on CPU (in-process views inherit the master's backend —
see :func:`~elfi_tpu.parallel.backends._run_adapter_batch`).
"""

from __future__ import annotations

import os

import numpy as np

from .backends import BackendBase, _run_adapter_batch

__all__ = ["Client"]

# importable under the historical name (tests ship it to raw workers)
_run_batch = _run_adapter_batch


class Client(BackendBase):
    """BackendBase-protocol adapter over
    ``ipyparallel.Client().load_balanced_view()``."""

    def __init__(self, ipp_client=None, **kwargs):
        super().__init__()
        if ipp_client is None:
            import ipyparallel as ipp
            ipp_client = ipp.Client(**kwargs)
        self.ipp_client = ipp_client
        self.view = ipp_client.load_balanced_view()

    @property
    def num_cores(self):
        return max(1, len(self.view))

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        overrides = {k: np.asarray(v) for k, v in (overrides or {}).items()}
        return self.view.apply(_run_adapter_batch, program, seed,
                               batch_index, overrides, batch_size,
                               os.getpid())

    def _materialize(self, handle):
        return handle.get()

    def _handle_ready(self, handle):
        return handle.ready()

    def _run_thunk(self, fn, args, kwargs):
        return self.view.apply(fn, *args, **kwargs).get()

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

    def apply_sync(self, fn, *args, **kwargs):
        return self.view.apply_sync(fn, *args, **kwargs)

    def close(self):
        try:
            self.ipp_client.close()
        except Exception:
            pass
