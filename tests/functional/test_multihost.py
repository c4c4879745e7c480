"""Multi-host DCN farming: a REAL 2-process ``jax.distributed`` job on CPU
(reference scales out with ipyparallel/dask task farms; here each host owns
batch indices round-robin and results allgather — SURVEY.md §2.2/§5).

The child processes run the same Rejection inference SPMD; the test
asserts both hosts produce the identical result, equal to a single-process
native run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast CI gate

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
import numpy as np
import elfi_tpu as elfi
from elfi_tpu.models import ma2
from elfi_tpu.parallel.multihost import MultihostBackend

elfi.set_client(MultihostBackend())
assert elfi.get_client().num_processes == 2
m = ma2.get_model(seed_obs=4)
res = elfi.Rejection(m["d"], batch_size=200, seed=17).sample(
    20, n_sim=1000, bar=False)
np.save(sys.argv[3], res.samples_array)

# host-op FARM mode: each host must simulate only its own batch indices
# (plus the shared shape-discovery batch); outputs broadcast owner->all
CALLS = {"n": 0}

def hostsim(t, batch_size=1, random_state=None, **kw):
    CALLS["n"] += 1
    return np.atleast_1d(t)[:, None] + random_state.normal(
        size=(batch_size, 3))

mh = elfi.Model(name="farm")
p = elfi.Prior("uniform", 0, 1, model=mh, name="p")
sim = elfi.Simulator(hostsim, p, observed=0.5 * np.ones(3), host=True,
                     model=mh, name="sim")
d = elfi.Distance("euclidean", sim, model=mh, name="d")
res2 = elfi.Rejection(mh["d"], batch_size=50, seed=23).sample(
    10, n_sim=400, bar=False)   # 8 batches
# 1 discovery batch on every host + 7 remaining farmed round-robin
assert 1 + 3 <= CALLS["n"] <= 1 + 4, CALLS["n"]
np.save(sys.argv[3].replace(".npy", "_farm.npy"), res2.samples_array)

# raw-batch float64 transport check: batch 0 is the shape-discovery
# round (computed everywhere), batches 1/2 are farmed one way each —
# the broadcast must deliver the float64 sim outputs bit-exactly
rejb = elfi.Rejection(mh["d"], batch_size=50, seed=29,
                      output_names=["sim"])
rejb.set_objective(10, n_sim=400)
for i in range(3):
    rejb.batches.submit(rejb.prepare_new_batch(i))
raw = [rejb.batches.wait_next()[0]["sim"] for _ in range(3)]
assert all(r.dtype == np.float64 for r in raw), [r.dtype for r in raw]
np.save(sys.argv[3].replace(".npy", "_farm_sim.npy"), np.stack(raw))
print("WORKER_OK")
"""


def test_two_process_multihost(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    outs = [str(tmp_path / f"out{i}.npy") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(i), outs[i]],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(out.decode())
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0 and "WORKER_OK" in log, \
            f"worker {i} failed:\n{log[-3000:]}"

    a, b = np.load(outs[0]), np.load(outs[1])
    np.testing.assert_array_equal(a, b)  # both hosts see the same result
    fa = np.load(outs[0].replace(".npy", "_farm.npy"))
    fb = np.load(outs[1].replace(".npy", "_farm.npy"))
    np.testing.assert_array_equal(fa, fb)  # farmed host-op results agree

    # equal to the single-process native run
    import elfi_tpu as elfi
    from elfi_tpu.models import ma2
    m = ma2.get_model(seed_obs=4)
    ref = elfi.Rejection(m["d"], batch_size=200, seed=17).sample(
        20, n_sim=1000, bar=False, fused=False)
    np.testing.assert_array_equal(ref.samples_array, a)

    # farmed float64 host-op results must be BIT-identical to a native
    # single-process run: the DCN broadcast encodes 8-byte dtypes as
    # uint32 pairs, so no precision is lost to x64-off canonicalization
    def hostsim(t, batch_size=1, random_state=None, **kw):
        return np.atleast_1d(t)[:, None] + random_state.normal(
            size=(batch_size, 3))

    mh = elfi.Model(name="farm_native")
    p = elfi.Prior("uniform", 0, 1, model=mh, name="p")
    elfi.Simulator(hostsim, p, observed=0.5 * np.ones(3), host=True,
                   model=mh, name="sim")
    elfi.Distance("euclidean", mh["sim"], model=mh, name="d")
    nat = elfi.Rejection(mh["d"], batch_size=50, seed=23).sample(
        10, n_sim=400, bar=False)
    np.testing.assert_array_equal(nat.samples_array, fa)

    # raw-batch float64 transport: both hosts' farmed batches must be
    # BIT-identical to native computation (uint32-pair DCN encoding —
    # x64-off canonicalization would corrupt the low mantissa bits)
    rejb = elfi.Rejection(mh["d"], batch_size=50, seed=29,
                      output_names=["sim"])
    rejb.set_objective(10, n_sim=400)
    for i in range(3):
        rejb.batches.submit(rejb.prepare_new_batch(i))
    nat_raw = np.stack([rejb.batches.wait_next()[0]["sim"]
                        for _ in range(3)])
    assert nat_raw.dtype == np.float64
    for out in outs:
        farm_raw = np.load(out.replace(".npy", "_farm_sim.npy"))
        np.testing.assert_array_equal(nat_raw, farm_raw)
