"""Multi-host batch farming over DCN via ``jax.distributed``.

The reference scales beyond one machine with ipyparallel/dask task farms
(``elfi/clients/{ipyparallel,dask}.py``) — pickled graphs over TCP/ZeroMQ.
The TPU-native equivalent (SURVEY.md §2.2/§5): every host in a
``jax.distributed`` job runs the SAME inference loop, batch indices are
assigned round-robin by ``process_index``, and the owner's result is
broadcast to the other hosts over DCN.  Because batches are pure
functions of (seed, batch_index), this is deterministic and needs no
task RPC: the "controller" is the shared counter-based RNG schedule.

Per-batch DCN traffic is O(batch) — the owner's arrays ride a psum-based
one-to-all broadcast (``multihost_utils.broadcast_one_to_all``), NOT an
O(num_hosts x batch) allgather of zero placeholders.

Host-executed graphs (external binaries, numpy simulators — the
expensive case the reference's ipyparallel client exists for) FARM the
same way: host ``p`` runs only its own batch indices through the host
executor (optionally its local process pool) and broadcasts the outputs.
The first batch of a given program is computed redundantly on every host
to discover output shapes (host ops have no ``eval_shape``); subsequent
batches ship only the owner's data.  Set ``farm_host_ops=False`` for the
old compute-everywhere behavior (zero DCN for host data).

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


def _transport_dtype(dtype):
    """psum-friendly dtype for broadcasting (small ints/bools widen)."""
    dtype = np.dtype(dtype)
    if dtype.kind == "b":
        return np.dtype(np.int32)
    if dtype.kind in "iu" and dtype.itemsize < 4:
        return np.dtype(np.int32)
    if dtype.kind == "f" and dtype.itemsize < 4:
        return np.dtype(np.float32)
    return dtype


def _encode_transport(arr, shape, dtype):
    """Lossless broadcast payload. With x64 disabled,
    ``broadcast_one_to_all`` canonicalizes float64/int64 to 32-bit BEFORE
    the psum, destroying low bits/values — so 8-byte dtypes travel as a
    flat uint32 bit view (two words per element) and are reassembled by
    :func:`_decode_transport`."""
    if dtype.itemsize == 8:
        flat = np.ascontiguousarray(arr, dtype).reshape(-1)
        return flat.view(np.uint32)
    return np.asarray(arr, _transport_dtype(dtype))


def _encode_placeholder(shape, dtype):
    if dtype.itemsize == 8:
        return np.zeros(2 * int(np.prod(shape)), np.uint32)
    return np.zeros(shape, _transport_dtype(dtype))


def _decode_transport(arr, shape, dtype):
    if dtype.itemsize == 8:
        return np.ascontiguousarray(arr, np.uint32).view(dtype).reshape(shape)
    return np.asarray(arr).astype(dtype)


class MultihostBackend(BackendBase):
    """SPMD task farm: host ``p`` computes batch indices with
    ``index % num_processes == p``; the owner broadcasts each result."""

    num_cores = 2

    def __init__(self, farm_host_ops=True):
        super().__init__()
        self.process_index = jax.process_index()
        self.num_processes = jax.process_count()
        self.num_cores = max(2, self.num_processes)
        self.farm_host_ops = farm_host_ops
        # (model revision, outputs, overrides, batch_size)
        #   -> {name: (shape, dtype)} for host-op farm broadcasts
        self._host_shapes = {}

    def _host_key(self, program, overrides, batch_size):
        return (program.model.revision, program.outputs,
                tuple(sorted(overrides)), batch_size)

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        owner = batch_index % self.num_processes
        if self.num_processes == 1:
            result = program.run(jax.random.key(seed), batch_index,
                                 overrides, batch_size)
            return ("local", result)
        if program.host:
            key = self._host_key(program, overrides, batch_size)
            if not self.farm_host_ops or key not in self._host_shapes:
                # compute-everywhere round: deterministic per (seed,
                # batch_index), so every host gets identical outputs; also
                # records the output shapes that later farm rounds need
                result = program.run(jax.random.key(seed), batch_index,
                                     overrides, batch_size)
                self._host_shapes[key] = {
                    k: (np.asarray(v).shape, np.asarray(v).dtype)
                    for k, v in result.items()}
                return ("local", result)
            result = None
            if owner == self.process_index:
                result = program.run(jax.random.key(seed), batch_index,
                                     overrides, batch_size)
            return ("bcast_host", owner, result, key)
        result = None
        if owner == self.process_index:
            result = program.run(jax.random.key(seed), batch_index,
                                 overrides, batch_size)
        return ("bcast", owner, result, program, overrides, batch_size)

    def _broadcast(self, owner, result):
        """One-to-all broadcast of the owner's {name: array} dict.

        Collective: every host calls this for every batch in submission
        order (the in-order BatchHandler contract guarantees it)."""
        from jax.experimental import multihost_utils
        out = multihost_utils.broadcast_one_to_all(
            result, is_source=(owner == self.process_index))
        return {k: np.asarray(v) for k, v in out.items()}

    def _materialize(self, handle):
        kind = handle[0]
        if kind == "local":
            return jax.block_until_ready(handle[1])
        if kind == "bcast_host":
            _, owner, result, key = handle
            shapes = self._host_shapes[key]
            if result is None:
                payload = {k: _encode_placeholder(shp, dt)
                           for k, (shp, dt) in shapes.items()}
            else:
                payload = {k: _encode_transport(result[k], shp, dt)
                           for k, (shp, dt) in shapes.items()}
            out = self._broadcast(owner, payload)
            return {k: _decode_transport(out[k], shp, dt)
                    for k, (shp, dt) in shapes.items()}
        # device program
        _, owner, result, program, overrides, batch_size = handle
        if result is None:
            import jax.numpy as jnp
            fn = program.traceable(batch_size)
            shapes = jax.eval_shape(fn, jax.eval_shape(jax.random.key, 0),
                                    jnp.uint32(0), overrides)
            result = {k: np.zeros(v.shape, v.dtype)
                      for k, v in shapes.items()}
        return self._broadcast(owner, result)
