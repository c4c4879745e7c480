"""Elastic TCP cluster backend (reference ipyparallel/dask parity):
externally-launched workers attach to the master's socket, batch tasks
farm to them, workers may join late, and with nobody attached the master
falls back to computing locally — all bit-identical per seed."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast CI gate


def _spawn_worker(address, cwd=None, **extra_env):
    # address is the master's handout string host:port/authkey-hex
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update({k: str(v) for k, v in extra_env.items()})
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if cwd is not None:  # external-op graphs read/write files in cwd
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, "-m", "elfi_tpu.worker", address],
        cwd=cwd or root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def test_cluster_backend_elastic():
    import elfi_tpu as elfi
    from elfi_tpu.parallel.cluster import ClusterBackend

    # ops must unpickle on the worker side, so use the (picklable)
    # external-operation bridge as the host simulator
    cmd = "echo {0} {seed}"
    sim_single = elfi.tools.external_operation(cmd)
    m = elfi.Model(name="cluster_echo")
    p = elfi.Prior("uniform", 0, 1, model=m, name="p")
    elfi.Simulator(elfi.tools.vectorize(sim_single), p,
                   observed=np.array([0.5, 1.0]), model=m, name="sim")
    elfi.Distance("euclidean", m["sim"], model=m, name="d")

    backend = ClusterBackend()
    prev = elfi.get_client()
    workers = []
    try:
        elfi.set_client(backend)
        # phase 1: no workers attached -> local fallback computes batches
        res0 = elfi.Rejection(m["d"], batch_size=20, seed=5).sample(
            10, n_sim=100, bar=False)
        assert res0.n_samples == 10

        # phase 2: a worker joins late (elasticity); tasks farm to it
        workers = [_spawn_worker(backend.address)]
        deadline = time.monotonic() + 90
        while not (backend._workers or backend._joined) \
                and time.monotonic() < deadline:
            time.sleep(0.1)
        assert backend._workers or backend._joined, "no worker attached"

        res1 = elfi.Rejection(m["d"], batch_size=20, seed=5).sample(
            10, n_sim=100, bar=False)
        # deterministic: farmed result == local-fallback result
        np.testing.assert_array_equal(res0.samples_array,
                                      res1.samples_array)

        # matches the native backend bit-for-bit too
        elfi.set_client("native")
        res2 = elfi.Rejection(m["d"], batch_size=20, seed=5).sample(
            10, n_sim=100, bar=False)
        np.testing.assert_array_equal(res1.samples_array,
                                      res2.samples_array)
    finally:
        elfi.set_client(prev)
        backend.close()
        for w in workers:
            try:
                w.wait(timeout=10)
            except subprocess.TimeoutExpired:
                w.kill()


def test_cluster_device_graph_ships_program_once():
    """A device-path (JAX) graph farms to a worker with the program wired
    once per (worker, program key): subsequent tasks reference it by key,
    so the worker re-uses its cached jitted executable instead of
    re-tracing per task."""
    import elfi_tpu as elfi
    from elfi_tpu.models import ma2
    from elfi_tpu.parallel.cluster import ClusterBackend

    m = ma2.get_model(seed_obs=4)
    backend = ClusterBackend()
    prev = elfi.get_client()
    worker = _spawn_worker(backend.address)
    try:
        deadline = time.monotonic() + 90
        while not (backend._workers or backend._joined) \
                and time.monotonic() < deadline:
            time.sleep(0.1)
        assert backend._workers or backend._joined, "no worker attached"
        elfi.set_client(backend)
        res = elfi.Rejection(m["d"], batch_size=100, seed=11).sample(
            20, n_sim=1000, bar=False)      # 10 batches, 1 worker
        assert backend.programs_shipped == 1
        elfi.set_client("native")
        ref = elfi.Rejection(m["d"], batch_size=100, seed=11).sample(
            20, n_sim=1000, bar=False, fused=False)
        np.testing.assert_array_equal(res.samples_array, ref.samples_array)
    finally:
        elfi.set_client(prev)
        backend.close()
        try:
            worker.wait(timeout=10)
        except subprocess.TimeoutExpired:
            worker.kill()


def test_cluster_worker_program_cache_eviction_reships():
    """The worker's program cache is FIFO-bounded, but the master's
    per-worker shipped-set is not: when the master references an evicted
    key the worker must answer "noprog" and the master must re-ship with
    the requeued task (this used to fail every future task for the
    evicted key)."""
    import elfi_tpu as elfi
    from elfi_tpu.models import ma2
    from elfi_tpu.parallel.cluster import ClusterBackend

    ma = ma2.get_model(seed_obs=4)
    mb = ma2.get_model(seed_obs=5)          # distinct model -> distinct key
    backend = ClusterBackend(local_fallback=False)
    prev = elfi.get_client()
    worker = _spawn_worker(backend.address, ELFI_TPU_WORKER_PROGRAM_CACHE=1)
    try:
        deadline = time.monotonic() + 90
        while not (backend._workers or backend._joined) \
                and time.monotonic() < deadline:
            time.sleep(0.1)
        assert backend._workers or backend._joined, "no worker attached"
        elfi.set_client(backend)

        def run(m, seed):
            return elfi.Rejection(m["d"], batch_size=50, seed=seed).sample(
                10, n_sim=100, bar=False)

        ra1 = run(ma, 11)                   # ships program A
        run(mb, 12)                         # cache=1: evicts A
        ra2 = run(ma, 11)                   # A referenced by key -> noprog
        np.testing.assert_array_equal(ra1.samples_array, ra2.samples_array)
        # A shipped twice (initial + after eviction) + B once
        assert backend.programs_shipped == 3
        elfi.set_client("native")
        ref = run(ma, 11)
        np.testing.assert_array_equal(ra2.samples_array, ref.samples_array)
    finally:
        elfi.set_client(prev)
        backend.close()
        try:
            worker.wait(timeout=10)
        except subprocess.TimeoutExpired:
            worker.kill()


def test_cluster_authkey_is_random_and_required():
    """Every master generates its own HMAC secret; a connection attempt
    with the wrong key must not become a worker."""
    from multiprocessing.connection import Client as ConnClient
    from elfi_tpu.parallel.cluster import ClusterBackend, parse_address

    b1, b2 = ClusterBackend(), ClusterBackend()
    try:
        assert b1._authkey != b2._authkey
        addr, key = parse_address(b1.address)
        assert key == b1._authkey
        with pytest.raises(Exception):
            c = ConnClient(addr, authkey=b"wrong-key-entirely")
            c.close()
        time.sleep(0.2)
        b1._absorb_joined()
        assert not b1._workers
    finally:
        b1.close()
        b2.close()


def test_cluster_is_ready_on_thunk():
    """apply() task ids must be pollable (reference farms MCMC chains via
    apply; is_ready used to crash on the thunk tuple)."""
    from elfi_tpu.parallel.cluster import ClusterBackend
    backend = ClusterBackend()
    try:
        tid = backend.apply(lambda x: x + 1, 1)
        assert backend.is_ready(tid)
        assert backend.get_result(tid) == 2
    finally:
        backend.close()


def test_cluster_worker_death_reassigns():
    """Killing a worker mid-run must not lose tasks: the master replays
    the batch index elsewhere (or locally) with identical results."""
    import elfi_tpu as elfi
    from elfi_tpu.parallel.cluster import ClusterBackend

    cmd = "echo {0} {seed}"
    sim_single = elfi.tools.external_operation(cmd)
    m = elfi.Model(name="cluster_echo_kill")
    p = elfi.Prior("uniform", 0, 1, model=m, name="p")
    elfi.Simulator(elfi.tools.vectorize(sim_single), p,
                   observed=np.array([0.5, 1.0]), model=m, name="sim")
    elfi.Distance("euclidean", m["sim"], model=m, name="d")

    backend = ClusterBackend()
    prev = elfi.get_client()
    worker = _spawn_worker(backend.address)
    try:
        elfi.set_client(backend)
        deadline = time.monotonic() + 60
        while not backend._workers and not backend._joined \
                and time.monotonic() < deadline:
            time.sleep(0.1)
        rej = elfi.Rejection(m["d"], batch_size=20, seed=7)
        # submit a couple of batches, then kill the worker before draining
        rej.set_objective(10, n_sim=100)
        rej.batches.submit(rej.prepare_new_batch(0))
        worker.kill()
        worker.wait()
        rej.batches.submit(rej.prepare_new_batch(1))
        b0, _ = rej.batches.wait_next()     # reassigned (local fallback)
        b1, _ = rej.batches.wait_next()
        assert set(b0) >= {"d", "p"}
        # equality with a clean native run of the same batch indices
        elfi.set_client("native")
        rej2 = elfi.Rejection(m["d"], batch_size=20, seed=7)
        rej2.set_objective(10, n_sim=100)
        rej2.batches.submit(rej2.prepare_new_batch(0))
        rej2.batches.submit(rej2.prepare_new_batch(1))
        n0, _ = rej2.batches.wait_next()
        n1, _ = rej2.batches.wait_next()
        np.testing.assert_array_equal(b0["d"], n0["d"])
        np.testing.assert_array_equal(b1["d"], n1["d"])
    finally:
        elfi.set_client(prev)
        backend.close()
        if worker.poll() is None:
            worker.kill()


def test_cluster_slow_worker_quarantined_not_killed():
    """A worker that exceeds task_timeout is QUARANTINED (its task is
    replayed elsewhere) but its connection survives; when it finally
    replies it rejoins the idle pool.  Killing on timeout would serially
    destroy every worker whenever a batch legitimately outlives the
    deadline."""
    from multiprocessing.connection import Client as ConnClient

    import elfi_tpu as elfi
    from elfi_tpu.parallel.cluster import ClusterBackend, parse_address

    cmd = "echo {0} {seed}"
    sim_single = elfi.tools.external_operation(cmd)
    m = elfi.Model(name="cluster_echo_slow")
    p = elfi.Prior("uniform", 0, 1, model=m, name="p")
    elfi.Simulator(elfi.tools.vectorize(sim_single), p,
                   observed=np.array([0.5, 1.0]), model=m, name="sim")
    elfi.Distance("euclidean", m["sim"], model=m, name="d")

    backend = ClusterBackend(task_timeout=0.5)
    prev = elfi.get_client()
    # a fake in-process "worker" that accepts its task but never replies
    addr, key = parse_address(backend.address)
    hung = ConnClient(tuple(addr), authkey=key)
    try:
        elfi.set_client(backend)
        deadline = time.monotonic() + 30
        backend._pump()
        while not backend._workers and time.monotonic() < deadline:
            time.sleep(0.05)
            backend._pump()
        assert len(backend._workers) == 1

        rej = elfi.Rejection(m["d"], batch_size=20, seed=11)
        res = rej.sample(10, n_sim=40, bar=False)   # must not stall
        assert res.n_samples == 10

        # the slow worker was quarantined, NOT dropped
        assert len(backend._workers) == 1
        w = backend._workers[0]
        assert w.reclaimed, "task was never reclaimed from the hung worker"
        assert w.inflight, "quarantined worker should keep its in-flight id"

        # equality with a clean native run (replayed batches are exact)
        elfi.set_client("native")
        res2 = elfi.Rejection(m["d"], batch_size=20, seed=11).sample(
            10, n_sim=40, bar=False)
        np.testing.assert_array_equal(res.samples_array, res2.samples_array)
        elfi.set_client(backend)

        # the worker finally replies -> it rejoins the idle pool
        assert hung.poll(5), "no task ever reached the fake worker"
        msg = hung.recv()
        assert msg[0] == "task"
        tid = msg[1]
        hung.send(("result", tid, {}))
        deadline = time.monotonic() + 10
        while w.inflight and time.monotonic() < deadline:
            backend._pump()
            time.sleep(0.02)
        assert not w.inflight and not w.reclaimed
    finally:
        elfi.set_client(prev)
        try:
            hung.close()
        except Exception:
            pass
        backend.close()


def test_cluster_canceled_inflight_task_does_not_stall_master():
    """remove_task on an in-flight batch (BatchHandler.cancel_pending does
    exactly this at every SMC round advance) must not leave a hung worker
    counted as responsive-and-busy forever: the canceled assignment is
    marked reclaimed, so the next task completes via local fallback
    instead of spinning until the worker replies."""
    from multiprocessing.connection import Client as ConnClient

    import elfi_tpu as elfi
    from elfi_tpu.compile.compiler import compile_program
    from elfi_tpu.models import ma2
    from elfi_tpu.parallel.cluster import ClusterBackend, parse_address

    m = ma2.get_model(seed_obs=4)
    prog = compile_program(m, ("d",))
    backend = ClusterBackend(task_timeout=0.5)
    addr, key = parse_address(backend.address)
    hung = ConnClient(tuple(addr), authkey=key)   # accepts, never replies
    try:
        deadline = time.monotonic() + 30
        backend._pump()
        while not backend._workers and time.monotonic() < deadline:
            time.sleep(0.05)
            backend._pump()
        assert len(backend._workers) == 1

        tid1 = backend.submit(prog, 3, 0, {}, 10)
        deadline = time.monotonic() + 10
        while backend._tasks[tid1].worker is None \
                and time.monotonic() < deadline:
            backend._pump()
            time.sleep(0.02)
        assert backend._tasks[tid1].worker is not None, "never assigned"

        backend.remove_task(tid1)                 # the round-advance cancel
        tid2 = backend.submit(prog, 3, 1, {}, 10)
        t0 = time.monotonic()
        res = backend.get_result(tid2)            # must not spin forever
        assert time.monotonic() - t0 < 10
        assert np.asarray(res["d"]).shape == (10,)
    finally:
        try:
            hung.close()
        except Exception:
            pass
        backend.close()


def test_cluster_bdm_external_farm(tmp_path):
    """The reference's flagship external-simulator workflow
    (``/root/reference/docs/usage/external.rst:355-371``): the native C++
    BDM binary, file-handshake hooks and all, farmed over the elastic
    cluster — and bit-identical to the local fallback per seed.  The
    measured wall for this config is recorded in ``docs/external.md``
    (single-core box: workers time-slice, so the figure is workflow
    overhead, not a speedup claim)."""
    import shutil

    import elfi_tpu as elfi
    from elfi_tpu.models import bdm
    from elfi_tpu.parallel.cluster import ClusterBackend

    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    cwd = os.getcwd()
    workers = []
    backend = None
    prev = elfi.get_client()
    try:
        os.chdir(tmp_path)
        if bdm.ensure_executable(str(tmp_path)) is None:
            pytest.skip("could not compile bdm")
        m = bdm.get_model()

        backend = ClusterBackend()
        elfi.set_client(backend)
        # local fallback (no workers attached) computes every batch
        t0 = time.perf_counter()
        res_local = elfi.Rejection(m["d"], batch_size=50, seed=7).sample(
            50, n_sim=1000, bar=False)
        wall_local = time.perf_counter() - t0

        workers = [_spawn_worker(backend.address, cwd=str(tmp_path))
                   for _ in range(2)]
        deadline = time.monotonic() + 90
        while len(backend._workers) + len(backend._joined) < 2 \
                and time.monotonic() < deadline:
            time.sleep(0.1)
        assert backend._workers or backend._joined, "no worker attached"

        t0 = time.perf_counter()
        res_farm = elfi.Rejection(m["d"], batch_size=50, seed=7).sample(
            50, n_sim=1000, bar=False)
        wall_farm = time.perf_counter() - t0
        print(f"bdm farm: local={wall_local:.2f}s "
              f"farmed(2 workers)={wall_farm:.2f}s")

        # deterministic farm: byte-identical to the local fallback
        np.testing.assert_array_equal(res_local.samples_array,
                                      res_farm.samples_array)
        assert np.all(res_farm.samples["alpha"] >= 0.005)
    finally:
        elfi.set_client(prev)
        if backend is not None:
            backend.close()
        for w in workers:
            try:
                w.wait(timeout=10)
            except subprocess.TimeoutExpired:
                w.kill()
        os.chdir(cwd)
