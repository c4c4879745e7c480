"""Driver entry-point contract (``__graft_entry__``): the single-chip
compile check and the multi-chip dryrun must work in FRESH processes
under every environment the driver (or an operator shell) may supply.

The regression this pins: some shells on this box export
``JAX_PLATFORMS=axon`` (the remote-attached single-chip plugin) ambiently;
``dryrun_multichip`` must still build its virtual CPU mesh there instead
of failing with "found 1 device"."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run(code, env_overrides, unset=()):
    env = dict(os.environ)
    for k in unset:
        env.pop(k, None)
    env.update(env_overrides)
    # force-CPU for speed/isolation is the PROGRAM's job, not the env's —
    # that is exactly the contract under test
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)


@pytest.mark.parametrize("env,unset", [
    ({}, ("JAX_PLATFORMS",)),                      # driver default
    ({"JAX_PLATFORMS": "cpu",
      "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}, ()),
    ({"JAX_PLATFORMS": "axon"}, ()),               # ambient tunnel plugin
], ids=["unset", "driver-cpu-flags", "ambient-axon"])
def test_dryrun_multichip_under_env(env, unset):
    r = _run("from __graft_entry__ import dryrun_multichip; "
             "dryrun_multichip(8); print('DRYRUN_OK')", env, unset)
    assert r.returncode == 0 and "DRYRUN_OK" in r.stdout, \
        (r.stdout + r.stderr)[-2000:]


def test_entry_compiles_single_device():
    # keep it off the (possibly tunnel-attached) accelerator: the contract
    # is "jittable on one chip"; CPU proves jittability fast
    code = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from __graft_entry__ import entry\n"
            "fn, args = entry()\n"
            "out = jax.jit(fn)(*args)\n"
            "assert set(out) == {'d', 't1', 't2'}\n"
            "assert all(v.shape == (1024,) for v in out.values())\n"
            "print('ENTRY_OK')")
    r = _run(code, {}, ("JAX_PLATFORMS", "XLA_FLAGS"))
    assert r.returncode == 0 and "ENTRY_OK" in r.stdout, \
        (r.stdout + r.stderr)[-2000:]
