"""Multi-host batch farming over DCN via ``jax.distributed``.

The reference scales beyond one machine with ipyparallel/dask task farms
(``elfi/clients/{ipyparallel,dask}.py``) — pickled graphs over TCP/ZeroMQ.
The TPU-native equivalent (SURVEY.md §2.2/§5): every host in a
``jax.distributed`` job runs the SAME inference loop, batch indices are
assigned round-robin by ``process_index``, and each host's results are
exchanged with a ``process_allgather`` over DCN.  Because batches are
pure functions of (seed, batch_index), this is deterministic and needs no
task RPC: the "controller" is the shared counter-based RNG schedule.

Single-process jobs degrade to the native backend, so the same code runs
anywhere.  Multi-host execution requires launching one process per host
with ``jax.distributed.initialize`` (coordinator address etc.) before
constructing the backend.
"""

from __future__ import annotations

import numpy as np

import jax

from .backends import BackendBase

__all__ = ["MultihostBackend"]


class MultihostBackend(BackendBase):
    """SPMD task farm: host ``p`` computes batch indices with
    ``index % num_processes == p``; results are all-gathered over DCN."""

    num_cores = 2

    def __init__(self):
        super().__init__()
        self.process_index = jax.process_index()
        self.num_processes = jax.process_count()
        self.num_cores = max(2, self.num_processes)

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        owner = batch_index % self.num_processes
        if owner == self.process_index:
            result = program.run(jax.random.key(seed), batch_index,
                                 overrides, batch_size)
        else:
            result = None
        return (owner, batch_index, result)

    def _materialize(self, handle):
        if isinstance(handle, tuple) and handle and handle[0] == "thunk":
            _, fn, args, kwargs = handle
            return fn(*args, **kwargs)
        owner, batch_index, result = handle
        if self.num_processes == 1:
            return jax.block_until_ready(result)
        from jax.experimental import multihost_utils
        if result is None:
            # receive the owner's arrays; shapes are known from a local
            # eval_shape of the same program, so build zero placeholders
            raise RuntimeError(
                "MultihostBackend: non-owner host asked to materialize a "
                "batch before the broadcast step; use gather_batch()")
        return jax.block_until_ready(result)

    def gather_batch(self, handle, shapes):
        """All-gather a batch computed by its owner host to every host.

        ``shapes`` is a dict of ShapeDtypeStructs from
        ``jax.eval_shape`` of the program (identical on all hosts).
        """
        from jax.experimental import multihost_utils
        owner, batch_index, result = handle
        if result is None:
            result = {k: np.zeros(v.shape, v.dtype)
                      for k, v in shapes.items()}
        # sum-gather: non-owners contribute zeros
        return multihost_utils.process_allgather(result)
