"""Elastic TCP cluster backend — the externally-managed worker farm.

Reference parity: ``elfi/clients/ipyparallel.py`` / ``dask.py`` attach to
a separately-launched cluster whose worker count can change at runtime.
Here the master (this backend) listens on a TCP socket
(:mod:`multiprocessing.connection`: pickle transport + HMAC auth) and any
number of workers — started whenever, on any reachable machine with the
package installed — connect and pull batch tasks:

    # master
    elfi.set_client(elfi.ClusterBackend())
    print(elfi.get_client().address)            # "host:port/authkey-hex"

    # each worker (started/stopped at ANY time)
    python -m elfi_tpu.worker HOST:PORT/AUTHKEY

Every master generates its own random authkey (the HMAC challenge secret
of :mod:`multiprocessing.connection`); it is handed out as part of
``.address`` — there is no well-known key that would let a third party
reach the pickle-deserializing listener.

Elasticity and fault tolerance come from the engine's determinism
contract: a batch is a pure function of (seed, batch_index), so tasks of
a worker that disconnects mid-flight are silently reassigned, tasks of a
*hung* worker are reclaimed after ``task_timeout`` seconds, late workers
immediately receive queued tasks, and with no workers attached the
master simply computes batches itself (so the same script runs with or
without a cluster).  ``num_cores`` tracks the live worker count, which
is what the inference methods use to size their in-flight pipeline — the
reference's dynamic ``num_cores`` behavior.

Programs ship to each worker ONCE: tasks reference a compiled program by
key ``(model revision, outputs, override names)`` and carry the program
object only the first time a given worker sees that key, so device-path
graphs re-trace/jit once per worker instead of once per task.

Workers force the CPU JAX backend (accelerators aren't shareable across
processes); the intended use is farming HOST-side / external simulators,
exactly like the reference's cluster clients.
"""

from __future__ import annotations

import logging
import secrets
import threading
import time
from multiprocessing.connection import Client as _ConnClient, Listener

import numpy as np

import jax

from .backends import BackendBase

__all__ = ["ClusterBackend", "worker_main", "parse_address"]

logger = logging.getLogger(__name__)


def parse_address(spec):
    """Parse a ``HOST:PORT[/AUTHKEY-hex]`` handout string into
    ``((host, port), authkey_bytes)``."""
    if "/" in spec:
        hostport, keyhex = spec.split("/", 1)
        authkey = bytes.fromhex(keyhex)
    else:
        hostport, authkey = spec, None
    host, port = hostport.rsplit(":", 1)
    return (host, int(port)), authkey


class _Worker:
    def __init__(self, conn):
        self.conn = conn
        self.inflight = set()   # task ids assigned and not yet returned
        self.shipped = set()    # program keys this worker already holds
        self.reclaimed = set()  # overdue task ids requeued elsewhere


class _Task:
    def __init__(self, program, seed, batch_index, overrides, batch_size):
        self.program = program
        self.seed = seed
        self.batch_index = batch_index
        self.overrides = overrides
        self.batch_size = batch_size
        self.result = None
        self.error = None
        self.done = False
        self.worker = None
        self.assigned_at = None


def _program_key(program):
    # the program's own canonical identity (includes adaptive-holder
    # versions, which model.revision alone misses)
    return program.cache_key


class ClusterBackend(BackendBase):
    """Task farm over externally-launched TCP workers (elastic).

    Subclasses :class:`~elfi_tpu.parallel.backends.BackendBase` for the
    shared task-registry protocol (``apply`` thunks, error records);
    batch submission/result plumbing is custom (queue + worker sockets).
    """

    def __init__(self, address=("127.0.0.1", 0), authkey=None,
                 local_fallback=True, task_timeout=600):
        super().__init__()
        self._queue = []                 # task ids waiting for a worker
        self._workers = []
        self._joined = []                # connections accepted by the thread
        self._lock = threading.Lock()
        self.local_fallback = local_fallback
        self.task_timeout = task_timeout
        self.programs_shipped = 0        # wire payloads that carried a program
        # per-master random HMAC secret: no well-known key guards the
        # pickle-deserializing listener (handed to workers via .address)
        self._authkey = authkey if authkey is not None \
            else secrets.token_bytes(16)
        self._listener = Listener(tuple(address), authkey=self._authkey)
        self._accepting = True
        self._acceptor = threading.Thread(target=self._accept_loop,
                                          daemon=True)
        self._acceptor.start()

    @property
    def address(self):
        """Worker handout string ``host:port/authkey-hex`` — pass to
        ``python -m elfi_tpu.worker``."""
        host, port = self._listener.address
        return f"{host}:{port}/{self._authkey.hex()}"

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
            except Exception:              # failed HMAC challenge etc.
                continue
            with self._lock:
                self._joined.append(conn)

    def _absorb_joined(self):
        with self._lock:
            fresh, self._joined = self._joined, []
        for conn in fresh:
            self._workers.append(_Worker(conn))

    def _drop_worker(self, worker):
        """A worker died or hung: resubmit its in-flight tasks
        (deterministic per batch index, so replay is exact)."""
        try:
            worker.conn.close()
        except Exception:
            pass
        if worker in self._workers:
            self._workers.remove(worker)
        for tid in worker.inflight - worker.reclaimed:
            # reclaimed tids were already requeued by _reclaim_overdue
            task = self._tasks.get(tid)
            if task is not None and not task.done:
                task.worker = None
                task.assigned_at = None
                self._queue.append(tid)

    # -- task plumbing ---------------------------------------------------------
    def submit(self, program, seed, batch_index, overrides, batch_size):
        tid = self._next
        self._next += 1
        overrides = {k: np.asarray(v) for k, v in (overrides or {}).items()}
        task = _Task(program, seed, batch_index, overrides, batch_size)
        self._tasks[tid] = task
        self._queue.append(tid)
        self._pump()
        return tid

    def _send_task(self, worker, tid, task):
        """Wire a task; the program object rides along only the first time
        this worker sees its key (ship-once; workers cache by key)."""
        pkey = _program_key(task.program)
        program = None if pkey in worker.shipped else task.program
        worker.conn.send(("task", tid, pkey, program, task.seed,
                          task.batch_index, task.overrides,
                          task.batch_size))
        if program is not None:
            worker.shipped.add(pkey)
            self.programs_shipped += 1

    def _pump(self):
        """Assign queued tasks to idle workers and drain results — all
        socket I/O happens here, on the calling thread."""
        self._absorb_joined()
        for worker in list(self._workers):
            try:
                while worker.conn.poll(0):
                    kind, tid, value = worker.conn.recv()
                    worker.inflight.discard(tid)
                    worker.reclaimed.discard(tid)
                    task = self._tasks.get(tid)
                    if task is None:
                        continue
                    if kind == "result":
                        task.result = value
                        task.done = True
                    elif kind == "noprog":
                        # the worker's bounded program cache evicted this
                        # key after we marked it shipped — clear the mark
                        # and requeue so the next send carries the program.
                        # Only when THIS worker still owns the assignment:
                        # a late noprog for a task _reclaim_overdue already
                        # requeued (or another worker now runs) would
                        # double-queue it and orphan the live assignment
                        worker.shipped.discard(value)
                        if task.worker is worker and not task.done:
                            task.worker = None
                            task.assigned_at = None
                            self._queue.append(tid)
                    else:
                        # ignore a late error from a superseded assignment
                        # — the reclaimed/replayed run decides the outcome
                        if task.worker is worker and not task.done:
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
                self._send_task(worker, tid, task)
                worker.inflight.add(tid)
                task.worker = worker
                task.assigned_at = time.monotonic()
            except (OSError, ValueError, EOFError):
                self._drop_worker(worker)
                self._queue.insert(0, tid)

    def _reclaim_overdue(self):
        """Requeue tasks whose worker exceeded the deadline — a hung
        (not dead) worker would otherwise stall the master forever.

        The worker is QUARANTINED, not killed: its overdue tasks are
        replayed elsewhere (deterministic per batch index, so whichever
        result arrives first is the same bits), but the connection stays
        open.  A slow-but-alive worker that eventually replies clears its
        in-flight set and rejoins the idle pool; a truly hung one simply
        never becomes idle again.  Killing on timeout would serially
        destroy every worker whenever a legitimate batch outlives
        ``task_timeout``."""
        if self.task_timeout is None:
            return
        now = time.monotonic()
        for worker in list(self._workers):
            overdue = [tid for tid in worker.inflight - worker.reclaimed
                       if (t := self._tasks.get(tid)) is not None
                       and not t.done and t.assigned_at is not None
                       and now - t.assigned_at > self.task_timeout]
            if overdue:
                logger.warning(
                    "cluster worker unresponsive for >%ss on task(s) %s; "
                    "quarantining it and replaying deterministically",
                    self.task_timeout, overdue)
                for tid in overdue:
                    worker.reclaimed.add(tid)
                    task = self._tasks[tid]
                    task.worker = None
                    task.assigned_at = None
                    self._queue.append(tid)

    def _run_local(self, task):
        out = task.program.run(jax.random.key(task.seed), task.batch_index,
                               task.overrides, task.batch_size)
        task.result = {k: np.asarray(v) for k, v in out.items()}
        task.done = True

    def is_ready(self, task_id):
        task = self._tasks.get(task_id)
        if isinstance(task, tuple):          # thunk from apply()
            return True
        self._pump()
        task = self._tasks.get(task_id)
        return task is not None and task.done

    def get_result(self, task_id):
        # NOTE: the task must stay registered while we wait — _pump matches
        # incoming results against self._tasks by id
        task = self._tasks[task_id]
        if isinstance(task, tuple):     # thunk/error record from BackendBase
            return super().get_result(task_id)
        local_after = time.monotonic() + 0.05
        while not task.done:
            self._pump()
            if task.done:
                break
            self._reclaim_overdue()
            responsive = [w for w in self._workers if not w.reclaimed]
            if (self.local_fallback and not responsive
                    and task.worker is None
                    and time.monotonic() > local_after):
                # nobody attached (or everyone quarantined): compute the
                # batch ourselves
                try:
                    self._queue.remove(task_id)
                except ValueError:
                    pass
                self._run_local(task)
                break
            time.sleep(0.002)
        self._tasks.pop(task_id, None)
        if task.error is not None:
            raise task.error
        return task.result

    def remove_task(self, task_id):
        task = self._tasks.pop(task_id, None)
        try:
            self._queue.remove(task_id)
        except ValueError:
            pass
        # a worker still computing the canceled batch must not stay
        # "responsive and busy" forever: mark the assignment reclaimed so
        # it stops suppressing local fallback and the worker rejoins the
        # idle pool when (if) it finally replies — without this, one hung
        # worker holding a canceled task (every SMC round cancels
        # leftovers) stalled get_result indefinitely
        worker = getattr(task, "worker", None)
        if worker is not None:
            worker.reclaimed.add(task_id)

    def close(self):
        self._accepting = False
        # closing the listener does NOT interrupt a blocked accept() on
        # this platform — poke it with a throwaway connection first so
        # the acceptor thread exits instead of leaking
        try:
            _ConnClient(self._listener.address,
                        authkey=self._authkey).close()
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


def worker_main(address, authkey=None, program_cache_size=32):
    """Worker loop: connect to the master and execute batch tasks until a
    stop message or a dropped connection.  Entry point:
    ``python -m elfi_tpu.worker HOST:PORT/AUTHKEY``.

    Programs arrive once per key and are cached (FIFO-bounded), so the
    embedded jit cache persists across tasks — device graphs compile once
    per worker.  If the master references a key this worker has evicted,
    the worker answers ``("noprog", tid, key)`` and the master re-ships
    the program with the requeued task (the master's per-worker
    shipped-set is unbounded; without this reply an evicted key would
    fail every future task for it).
    """
    if isinstance(address, str):
        address, parsed_key = parse_address(address)
        authkey = authkey if authkey is not None else parsed_key
    conn = _ConnClient(tuple(address), authkey=authkey)
    programs = {}                        # program key -> CompiledProgram
    try:
        while True:
            msg = conn.recv()
            if msg[0] == "stop":
                break
            _, tid, pkey, program, seed, batch_index, overrides, \
                batch_size = msg
            if program is not None:
                while len(programs) >= max(1, program_cache_size):
                    programs.pop(next(iter(programs)))   # FIFO bound
                programs[pkey] = program
            elif pkey not in programs:
                conn.send(("noprog", tid, pkey))
                continue
            try:
                prog = programs[pkey]
                out = prog.run(jax.random.key(seed), batch_index,
                               overrides, batch_size)
                reply = ("result", tid,
                         {k: np.asarray(v) for k, v in out.items()})
            except Exception as e:      # master replays deterministically
                reply = ("error", tid, repr(e))
            # send OUTSIDE the compute guard: a broken master pipe must
            # exit the worker cleanly, not masquerade as a task error
            conn.send(reply)
    except (EOFError, OSError):
        # master closed/reset the connection (shutdown, or it quarantined
        # and forgot us): exit cleanly instead of crashing mid-send
        pass
    finally:
        conn.close()
