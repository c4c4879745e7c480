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
        if program.host and self.num_processes > 1:
            # host graphs (external binaries, numpy sims) have no
            # eval_shape, so every host computes the batch redundantly --
            # deterministic (pure function of seed/batch_index) and gather
            # free; per-host parallelism for these comes from the
            # multiprocessing backend within each host
            owner = self.process_index
        if owner == self.process_index:
            result = program.run(jax.random.key(seed), batch_index,
                                 overrides, batch_size)
        else:
            result = None
        return (owner, result, program, overrides, batch_size)

    def _materialize(self, handle):
        if isinstance(handle, tuple) and handle and handle[0] == "thunk":
            _, fn, args, kwargs = handle
            return fn(*args, **kwargs)
        owner, result, program, overrides, batch_size = handle
        if self.num_processes == 1 or (program.host and result is not None):
            return jax.block_until_ready(result)
        # SPMD contract: every host materializes every batch in the same
        # order, so this allgather is collective.  Non-owners contribute
        # zero placeholders shaped by a local eval_shape of the program.
        from jax.experimental import multihost_utils
        import jax.numpy as jnp
        if result is None:
            fn = program.traceable(batch_size)
            shapes = jax.eval_shape(fn, jax.eval_shape(jax.random.key, 0),
                                    jnp.uint32(0), overrides)
            result = {k: np.zeros(v.shape, v.dtype)
                      for k, v in shapes.items()}
        gathered = multihost_utils.process_allgather(result)
        return {k: np.asarray(v)[owner] for k, v in gathered.items()}
