"""Elastic TCP cluster backend — the externally-managed worker farm.

Reference parity: ``elfi/clients/ipyparallel.py`` / ``dask.py`` attach to
a separately-launched cluster whose worker count can change at runtime.
Here the master (this backend) listens on a TCP socket
(:mod:`multiprocessing.connection`: pickle transport + HMAC auth) and any
number of workers — started whenever, on any reachable machine with the
package installed — connect and pull batch tasks:

    # master
    elfi.set_client(elfi.ClusterBackend())          # or address=(host, port)
    print(elfi.get_client().address)                # give this to workers

    # each worker (started/stopped at ANY time)
    python -m elfi_tpu.worker HOST:PORT

Elasticity and fault tolerance come from the engine's determinism
contract: a batch is a pure function of (seed, batch_index), so tasks of
a worker that disconnects mid-flight are silently reassigned, late
workers immediately receive queued tasks, and with no workers attached
the master simply computes batches itself (so the same script runs with
or without a cluster).  ``num_cores`` tracks the live worker count, which
is what the inference methods use to size their in-flight pipeline — the
reference's dynamic ``num_cores`` behavior.

Workers force the CPU JAX backend (accelerators aren't shareable across
processes); the intended use is farming HOST-side / external simulators,
exactly like the reference's cluster clients.
"""

from __future__ import annotations

import threading
import time
from multiprocessing.connection import Client as _ConnClient, Listener

import numpy as np

import jax

__all__ = ["ClusterBackend", "worker_main"]

_AUTHKEY = b"elfi-tpu-cluster"


class _Worker:
    def __init__(self, conn):
        self.conn = conn
        self.inflight = set()   # task ids assigned and not yet returned


class _Task:
    def __init__(self, payload):
        self.payload = payload
        self.result = None
        self.error = None
        self.done = False
        self.worker = None


class ClusterBackend:
    """Task farm over externally-launched TCP workers (elastic)."""

    def __init__(self, address=("127.0.0.1", 0), authkey=_AUTHKEY,
                 local_fallback=True):
        self._tasks = {}
        self._next = 0
        self._queue = []                 # task ids waiting for a worker
        self._workers = []
        self._joined = []                # connections accepted by the thread
        self._lock = threading.Lock()
        self.local_fallback = local_fallback
        self._authkey = authkey
        self._listener = Listener(tuple(address), authkey=authkey)
        self._accepting = True
        self._acceptor = threading.Thread(target=self._accept_loop,
                                          daemon=True)
        self._acceptor.start()

    @property
    def address(self):
        return self._listener.address

    @property
    def num_cores(self):
        self._absorb_joined()
        return max(2, len(self._workers))

    # -- connection management -------------------------------------------------
    def _accept_loop(self):
        # the acceptor thread ONLY accepts; all connection I/O happens on
        # the caller thread (Connection objects are not thread-safe)
        while self._accepting:
            try:
                conn = self._listener.accept()
            except (OSError, EOFError):
                break
            with self._lock:
                self._joined.append(conn)

    def _absorb_joined(self):
        with self._lock:
            fresh, self._joined = self._joined, []
        for conn in fresh:
            self._workers.append(_Worker(conn))

    def _drop_worker(self, worker):
        """A worker died: resubmit its in-flight tasks (deterministic per
        batch index, so replay is exact)."""
        try:
            worker.conn.close()
        except Exception:
            pass
        self._workers.remove(worker)
        for tid in worker.inflight:
            task = self._tasks.get(tid)
            if task is not None and not task.done:
                task.worker = None
                self._queue.append(tid)

    # -- task plumbing ---------------------------------------------------------
    def submit(self, program, seed, batch_index, overrides, batch_size):
        tid = self._next
        self._next += 1
        overrides = {k: np.asarray(v) for k, v in (overrides or {}).items()}
        task = _Task(("task", tid, program, seed, batch_index, overrides,
                      batch_size))
        self._tasks[tid] = task
        self._queue.append(tid)
        self._pump()
        return tid

    def _pump(self):
        """Assign queued tasks to idle workers and drain results — all
        socket I/O happens here, on the calling thread."""
        self._absorb_joined()
        for worker in list(self._workers):
            try:
                while worker.conn.poll(0):
                    kind, tid, value = worker.conn.recv()
                    worker.inflight.discard(tid)
                    task = self._tasks.get(tid)
                    if task is None:
                        continue
                    if kind == "result":
                        task.result = value
                    else:
                        task.error = RuntimeError(
                            f"cluster worker failed: {value}")
                    task.done = True
            except (EOFError, OSError):
                self._drop_worker(worker)
        idle = [w for w in self._workers if not w.inflight]
        while self._queue and idle:
            tid = self._queue.pop(0)
            task = self._tasks.get(tid)
            if task is None or task.done:
                continue
            worker = idle.pop(0)
            try:
                worker.conn.send(task.payload)
                worker.inflight.add(tid)
                task.worker = worker
            except (OSError, ValueError, EOFError):
                self._drop_worker(worker)
                self._queue.insert(0, tid)

    def _run_local(self, task):
        _, tid, program, seed, batch_index, overrides, batch_size = \
            task.payload
        out = program.run(jax.random.key(seed), batch_index, overrides,
                          batch_size)
        task.result = {k: np.asarray(v) for k, v in out.items()}
        task.done = True

    def is_ready(self, task_id):
        self._pump()
        task = self._tasks.get(task_id)
        return task is not None and task.done

    def get_result(self, task_id):
        # NOTE: the task must stay registered while we wait — _pump matches
        # incoming results against self._tasks by id
        task = self._tasks[task_id]
        if isinstance(task, tuple):          # thunk from apply()
            self._tasks.pop(task_id)
            _, fn, args, kwargs = task
            return fn(*args, **kwargs)
        local_after = time.monotonic() + 0.05
        while not task.done:
            self._pump()
            if task.done:
                break
            if (self.local_fallback and not self._workers
                    and task.worker is None
                    and time.monotonic() > local_after):
                # nobody attached (yet): compute the batch ourselves
                try:
                    self._queue.remove(self._tid_of(task))
                except ValueError:
                    pass
                self._run_local(task)
                break
            time.sleep(0.002)
        self._tasks.pop(task_id, None)
        if task.error is not None:
            raise task.error
        return task.result

    def _tid_of(self, task):
        return task.payload[1]

    def remove_task(self, task_id):
        self._tasks.pop(task_id, None)
        try:
            self._queue.remove(task_id)
        except ValueError:
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
        return fn(*args, **kwargs)

    def close(self):
        self._accepting = False
        # closing the listener does NOT interrupt a blocked accept() on
        # this platform — poke it with a throwaway connection first so
        # the acceptor thread exits instead of leaking
        try:
            _ConnClient(self.address, authkey=self._authkey).close()
        except Exception:
            pass
        self._acceptor.join(timeout=2)
        try:
            self._listener.close()
        except Exception:
            pass
        for worker in self._workers:
            try:
                worker.conn.send(("stop",))
            except Exception:
                pass
            try:
                worker.conn.close()
            except Exception:
                pass
        self._workers.clear()


def worker_main(address, authkey=_AUTHKEY):
    """Worker loop: connect to the master and execute batch tasks until a
    stop message or a dropped connection.  Entry point:
    ``python -m elfi_tpu.worker HOST:PORT``."""
    conn = _ConnClient(tuple(address), authkey=authkey)
    try:
        while True:
            msg = conn.recv()
            if msg[0] == "stop":
                break
            _, tid, program, seed, batch_index, overrides, batch_size = msg
            try:
                out = program.run(jax.random.key(seed), batch_index,
                                  overrides, batch_size)
                conn.send(("result", tid,
                           {k: np.asarray(v) for k, v in out.items()}))
            except Exception as e:      # master retries deterministically
                conn.send(("error", tid, repr(e)))
    except EOFError:
        pass
    finally:
        conn.close()
