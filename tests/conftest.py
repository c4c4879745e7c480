"""Shared fixtures.

Tests run on a VIRTUAL 8-device CPU mesh (set before JAX initialises) so
multi-device sharding paths are exercised without TPU hardware — the
driver separately dry-runs the multichip path, and bench.py runs on the
real chip.  The ``client`` fixture parametrizes inference tests over every
backend, mirroring the reference's multi-backend trick
(``/root/reference/tests/conftest.py:35-64``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Must run before any backend is initialised.  The env var alone is not
# enough on machines where a sitecustomize force-registers a TPU plugin.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NO persistent compile cache for the CPU suite: XLA:CPU AOT entries are
# unreliable to LOAD on this box — a long pytest process re-reading an
# entry (even one written by an identical CPU process) segfaults inside
# compilation_cache.get_executable_and_time ("machine feature ...
# prefer-no-gather is not supported" / SIGILL-class loader bug).
# Within-session reuse is covered by jit's in-memory cache; the TPU-side
# cache (bench) stays on via setup_performance_cache's per-platform dir.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import elfi_tpu as elfi  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--client", action="store", default=None,
                     help="Run tests against a single backend "
                          "(native/sharded/multiprocessing)")


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A single pytest process that accumulates the whole suite's compiled
    XLA:CPU programs eventually SEGFAULTS inside the CPU compiler/loader
    (reproduced deterministically at the ~200-program mark, at cache-read
    AND at fresh-compile sites; never reproducible for any single module).
    Clearing jax's in-memory caches per module keeps the process inside
    the regime where XLA:CPU is reliable; programs recompile on next use,
    which individual modules do anyway.

    ``ELFI_TPU_CLEAR_CACHES=0`` disables the workaround — used by the CI
    job that runs each test module in its own pytest process (no single
    process ever nears the ~200-program mark there)."""
    yield
    if os.environ.get("ELFI_TPU_CLEAR_CACHES", "1") != "0":
        import jax as _jax
        _jax.clear_caches()


@pytest.fixture(scope="session", params=["native", "sharded"])
def client(request):
    """Session-scoped backend instance; skips backends that fail to
    construct (reference ``tests/conftest.py:35-52``).

    The multiprocessing backend is exercised by its own dedicated tests
    (``tests/functional/test_multiprocessing.py``) rather than the full
    matrix: spawn-based workers re-import JAX, far too slow to parametrize
    every test over on a single-core CI box.
    """
    only = request.config.getoption("--client")
    if only and request.param != only:
        pytest.skip(f"--client={only}")
    try:
        if request.param == "native":
            c = elfi.NativeBackend()
        else:
            c = elfi.ShardedBackend()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"Could not construct {request.param} backend: {e}")
    yield c


@pytest.fixture
def with_all_clients(client):
    """Swap the global client around a test (reference
    ``tests/conftest.py:57-64``)."""
    pre = elfi.get_client()
    elfi.set_client(client)
    yield client
    elfi.set_client(pre)


@pytest.fixture
def ma2():
    from elfi_tpu.models import ma2 as ma2mod
    return ma2mod.get_model(seed_obs=4)


@pytest.fixture
def simple_model():
    """3-node prior chain (reference ``tests/conftest.py:84-90``)."""
    import jax.numpy as jnp
    m = elfi.Model(name="simple")
    elfi.Constant(10, model=m, name="tau")
    elfi.Prior("uniform", 0, m["tau"], model=m, name="k1")
    elfi.Prior("norm", m["k1"], size=(3,), model=m, name="k2")
    return m


@pytest.fixture
def multivariate_model():
    """Multivariate prior + simulator (reference
    ``tests/conftest.py:229-236``)."""
    import jax.numpy as jnp

    def fn(t1, batch_size, key):
        return jnp.sum(t1, axis=1, keepdims=True) \
            + 0.1 * __import__("jax").random.normal(key, (batch_size, 1))

    m = elfi.Model(name="mv")
    elfi.Prior("multivariate_normal", [0.5, 0.5], [[.5, 0], [0, .5]],
               model=m, name="t1")
    elfi.Simulator(fn, m["t1"], observed=np.array([1.0]), model=m, name="sim")
    elfi.Summary(lambda x: x[:, 0], m["sim"], model=m, name="S")
    elfi.Distance("euclidean", m["S"], model=m, name="d")
    return m


@pytest.fixture(autouse=True)
def reset_default_model():
    yield
    elfi.set_default_model(None)
