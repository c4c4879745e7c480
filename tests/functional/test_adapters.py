"""Worker-side task function shared by the dask/ipyparallel adapters:
it must force the CPU backend and drop any inherited persistent compile
cache BEFORE first JAX backend use (the JAX_PLATFORMS env var alone does
not stop an accelerator plugin loaded via sitecustomize — CLAUDE.md), and
produce batches bit-identical to the native backend."""

import os
import pickle
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast CI gate


@pytest.mark.parametrize("module", ["dask_client", "ipyparallel_client"])
def test_adapter_run_batch_forces_cpu_and_matches_native(module, tmp_path):
    import jax

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2

    # parent compiles and pickles the program, exactly as the adapters
    # ship it to a dask/ipyparallel worker
    m = ma2.get_model(seed_obs=4)
    program = elfi.compile.compile_program(m, ("d", "t1", "t2"))
    prog_file = tmp_path / "program.pkl"
    with open(prog_file, "wb") as f:
        pickle.dump(program, f)

    # fresh subprocess WITHOUT pre-forcing cpu (unlike conftest): on the
    # worker, _run_batch is the first thing to touch a JAX backend and
    # must itself neutralize any accelerator plugin
    script = textwrap.dedent(f"""
        import pickle, sys
        from elfi_tpu.parallel.{module} import _run_batch

        with open(sys.argv[1], "rb") as f:
            program = pickle.load(f)
        out = _run_batch(program, 3, 0, {{}}, 50)

        import jax
        assert jax.default_backend() == "cpu", jax.default_backend()
        assert jax.config.jax_compilation_cache_dir in (None, ""), \\
            jax.config.jax_compilation_cache_dir
        with open(sys.argv[2], "wb") as f:
            pickle.dump(out, f)
    """)
    out_file = tmp_path / "batch.pkl"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # what a vanilla dask worker inherits
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", script, str(prog_file), str(out_file)],
        cwd=root, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr

    with open(out_file, "rb") as f:
        out = pickle.load(f)
    ref = program.run(jax.random.key(3), 0, {}, 50)
    for k in ("d", "t1", "t2"):
        np.testing.assert_array_equal(out[k], np.asarray(ref[k]))


def test_in_process_worker_leaves_master_state_alone():
    """With a threaded/in-process cluster (dask ``processes=False``, an
    in-process ipyparallel view) the task body executes inside the master
    session: it must NOT force the master to CPU or drop its compile
    cache.  The pid guard scopes the worker-env hardening to real worker
    processes."""
    import jax

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2
    from elfi_tpu.parallel.backends import _run_adapter_batch

    m = ma2.get_model(seed_obs=4)
    program = elfi.compile.compile_program(m, ("d",))
    env_before = os.environ.get("JAX_PLATFORMS")
    cache_before = jax.config.jax_compilation_cache_dir
    out = _run_adapter_batch(program, 3, 0, {}, 16,
                             client_pid=os.getpid())
    assert out["d"].shape == (16,)
    assert os.environ.get("JAX_PLATFORMS") == env_before
    assert jax.config.jax_compilation_cache_dir == cache_before
