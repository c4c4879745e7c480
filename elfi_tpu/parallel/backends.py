"""Execution backends — the TPU-native re-design of the reference client
layer (``elfi/client.py:195-347``, ``elfi/clients/*``).

The reference farms pickled graphs to process/cluster workers; here the
default path is a single jitted XLA program dispatched asynchronously on the
local device(s), with:

- :class:`NativeBackend` — one device, async dispatch (the jit call returns
  immediately; blocking happens at ``get_result``), so submission pipelining
  overlaps host logic with device compute.
- :class:`ShardedBackend` — the same program pjit-ed over a
  ``jax.sharding.Mesh`` with the batch axis sharded across ICI.
- :class:`MultiprocessingBackend` — process pool for host-only graphs
  (external / native simulators), the analogue of the reference's
  multiprocessing client.

All backends keep the reference's task-queue contract: ``submit`` returns a
task id, ``get_result`` blocks, results are consumed in submission order by
:class:`~elfi_tpu.parallel.batches.BatchHandler`.
"""

from __future__ import annotations

import importlib

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_client", "set_client", "reset_client", "NativeBackend",
           "ShardedBackend", "MultiprocessingBackend"]

_client = None


def get_client():
    """Global backend registry (reference ``elfi/client.py:21-33``)."""
    global _client
    if _client is None:
        _client = NativeBackend()
    return _client


def set_client(client=None, **kwargs):
    """Set the global backend; accepts an instance or a name
    ('native' | 'sharded' | 'multiprocessing')."""
    global _client
    if isinstance(client, str):
        from .cluster import ClusterBackend
        from .multihost import MultihostBackend
        mapping = {"native": NativeBackend, "sharded": ShardedBackend,
                   "multiprocessing": MultiprocessingBackend,
                   "multihost": MultihostBackend,
                   "cluster": ClusterBackend}
        if client in mapping:
            client = mapping[client](**kwargs)
        else:  # entry-point style module with Client attribute
            mod = importlib.import_module(client)
            client = mod.Client(**kwargs)
    _client = client
    return _client


def reset_client():
    global _client
    _client = None


class BackendBase:
    """Task-queue protocol shared by all backends."""

    #: how many batches an inference method may keep in flight
    num_cores = 1

    def __init__(self):
        self._tasks = {}
        self._next = 0

    def submit(self, program, seed, batch_index, overrides, batch_size):
        """Submit one batch: ``seed`` is the integer context seed from which
        every backend derives the identical master key, so results are
        bit-identical across backends for a given seed."""
        tid = self._next
        self._next += 1
        try:
            self._tasks[tid] = self._launch(program, seed, batch_index,
                                            overrides, batch_size)
        except Exception as e:  # defer: surfaces at get_result, where the
            self._tasks[tid] = ("__error__", e)  # BatchHandler retry lives
        return tid

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        raise NotImplementedError

    def get_result(self, task_id):
        handle = self._tasks.pop(task_id)
        if isinstance(handle, tuple) and handle and handle[0] == "__error__":
            raise handle[1]
        if isinstance(handle, tuple) and handle and handle[0] == "thunk":
            _, fn, args, kwargs = handle
            return self._run_thunk(fn, args, kwargs)
        return self._materialize(handle)

    def _materialize(self, handle):
        return handle

    def _run_thunk(self, fn, args, kwargs):
        """Where ``apply()`` thunks execute at ``get_result`` time;
        backends that can farm generic callables override this."""
        return fn(*args, **kwargs)

    def is_ready(self, task_id):
        handle = self._tasks.get(task_id)
        if handle is None or isinstance(handle, tuple):
            return True      # thunk/error records resolve at get_result
        return self._handle_ready(handle)

    def _handle_ready(self, handle):
        return True

    def remove_task(self, task_id):
        self._tasks.pop(task_id, None)

    def reset(self):
        for tid in list(self._tasks):
            self.remove_task(tid)

    def apply(self, fn, *args, **kwargs):
        """Generic task submission (used for farming MCMC chains in the
        reference, ``bolfi.py:541-580``)."""
        tid = self._next
        self._next += 1
        self._tasks[tid] = ("thunk", fn, args, kwargs)
        return tid

    def apply_sync(self, fn, *args, **kwargs):
        return fn(*args, **kwargs)


class NativeBackend(BackendBase):
    """Single-device async-dispatch backend.  ``num_cores=2`` enables
    one-deep submission pipelining: while the device executes batch *i*, the
    host prepares and dispatches batch *i+1*."""

    num_cores = 2

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        return program.run(jax.random.key(seed), batch_index, overrides,
                           batch_size)

    def _materialize(self, handle):
        return jax.block_until_ready(handle)


class ShardedBackend(BackendBase):
    """Batch-axis data parallelism over a device mesh via pjit.

    Every output whose leading axis equals ``batch_size`` is sharded
    ``PartitionSpec('batch')`` across ICI; overrides (e.g. SMC proposal
    draws) are sharded the same way on the way in.  XLA inserts the
    collectives; inference-side reductions (top-k, quantiles) happen on the
    gathered host-side arrays or in fused per-method programs.
    """

    num_cores = 2

    def __init__(self, mesh=None, devices=None, axis_name="batch"):
        super().__init__()
        if mesh is None:
            devices = devices if devices is not None else jax.devices()
            mesh = Mesh(np.asarray(devices), (axis_name,))
        self.mesh = mesh
        self.axis_name = axis_name
        self._compiled = {}

    @property
    def n_devices(self):
        return int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))

    def _sharded_fn(self, program, batch_size, override_names):
        # NOT keyed by id(program): ids are reused after GC, which would
        # silently serve a stale executable for a different program.
        # program.cache_key also carries the adaptive-holder versions,
        # which model.revision alone misses
        key = (program.cache_key, batch_size, override_names)
        if key in self._compiled:
            return self._compiled[key]
        if batch_size % self.n_devices:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size "
                f"{self.n_devices}")
        fn = program.traceable(batch_size)
        batched = NamedSharding(self.mesh, P(self.axis_name))
        replicated = NamedSharding(self.mesh, P())

        def shard_if_batched(x):
            x = jnp.asarray(x)
            return batched if (x.ndim >= 1 and x.shape[0] == batch_size) \
                else replicated

        def wrapped(master_key, batch_index, overrides):
            out = fn(master_key, batch_index, overrides)
            return {k: jax.lax.with_sharding_constraint(
                        jnp.asarray(v), shard_if_batched(v))
                    for k, v in out.items()}

        jitted = jax.jit(wrapped)
        self._compiled[key] = jitted
        return jitted

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        master_key = jax.random.key(seed)
        if program.host:
            return program.run(master_key, batch_index, overrides, batch_size)
        overrides = {k: jax.device_put(
                        jnp.asarray(v),
                        NamedSharding(self.mesh, P(self.axis_name)))
                     for k, v in overrides.items()}
        fn = self._sharded_fn(program, batch_size,
                              tuple(sorted(overrides)))
        return fn(master_key, jnp.asarray(batch_index, jnp.uint32), overrides)

    def _materialize(self, handle):
        return jax.block_until_ready(handle)


def _mp_worker_init():
    """Worker processes compute on host CPU: force the CPU backend before
    JAX initialises (a TPU cannot be shared across processes)."""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    # do NOT inherit the parent's persistent compilation cache: XLA:CPU
    # AOT entries embed machine features, and loading an entry compiled
    # under a different feature set SIGILLs the worker (observed on this
    # box: "+prefer-no-gather ... not supported on the host machine")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
        _jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass


def _run_host_task(program, seed, batch_index, overrides, batch_size):
    out = program.run(jax.random.key(seed), batch_index, overrides,
                      batch_size)
    return {k: np.asarray(v) for k, v in out.items()}


def _run_adapter_batch(program, seed, batch_index, overrides, batch_size,
                       client_pid=None):
    """Worker-side task body shared by the dask/ipyparallel adapters.

    Forces the CPU backend and drops any inherited persistent compile
    cache BEFORE first backend use (the env var alone does not stop an
    accelerator plugin loaded via sitecustomize, and foreign XLA:CPU
    cache entries can SIGILL) — but ONLY when running in a separate
    process.  With a threaded / in-process cluster (dask
    ``processes=False``, an in-process ipyparallel view) the task
    executes inside the master session, and mutating the global JAX
    config there would silently force the master to CPU and disable its
    compile cache for the rest of the session."""
    import os
    if client_pid is None or os.getpid() != client_pid:
        _mp_worker_init()
    out = program.run(jax.random.key(seed), batch_index, overrides,
                      batch_size)
    return {k: np.asarray(v) for k, v in out.items()}


class MultiprocessingBackend(BackendBase):
    """Process-pool task farm for host-only graphs (external/native
    simulators) — analogue of ``elfi/clients/multiprocessing.py``.

    Fault tolerance: a task that exceeds ``task_timeout`` seconds or dies
    with the pool raises at ``get_result``, where the BatchHandler's
    deterministic resubmission replays the batch index exactly; a broken
    pool is rebuilt before the retry."""

    def __init__(self, num_processes=None, task_timeout=600):
        super().__init__()
        import multiprocessing as mp
        self.num_cores = num_processes or mp.cpu_count()
        self.task_timeout = task_timeout
        self._make_pool()

    def _make_pool(self):
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        # spawn (not fork): JAX is multithreaded and fork deadlocks
        self._pool = ProcessPoolExecutor(
            max_workers=self.num_cores, mp_context=mp.get_context("spawn"),
            initializer=_mp_worker_init)

    def _rebuild_pool(self):
        try:
            self._pool.shutdown(wait=False, cancel_futures=True)
        except Exception:
            pass
        self._make_pool()

    def _launch(self, program, seed, batch_index, overrides, batch_size):
        return self._pool.submit(_run_host_task, program, seed, batch_index,
                                 overrides, batch_size)

    def _result(self, future):
        import concurrent.futures as cf
        try:
            return future.result(timeout=self.task_timeout)
        except cf.TimeoutError:
            future.cancel()
            raise RuntimeError(
                f"multiprocessing task exceeded {self.task_timeout}s")
        except cf.process.BrokenProcessPool:
            self._rebuild_pool()
            raise

    def _materialize(self, handle):
        return self._result(handle)

    def _run_thunk(self, fn, args, kwargs):
        return self._result(self._pool.submit(fn, *args, **kwargs))

    def _handle_ready(self, handle):
        return handle.done()

    def remove_task(self, task_id):
        handle = self._tasks.pop(task_id, None)
        if hasattr(handle, "cancel"):
            handle.cancel()
