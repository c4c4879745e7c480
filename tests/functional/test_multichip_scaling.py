"""Multi-chip scaling properties on the virtual 8-device CPU mesh
(VERDICT r2 #6): beyond toy-size parity, assert that at realistic batch
sizes the batch axis is REALLY sharded 1/n_dev per device (not silently
replicated) and that the fused sharded path stays bit-identical to the
native path.  The driver's ``dryrun_multichip`` covers compile+execute;
these tests pin the layout contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from elfi_tpu.models import ma2

pytestmark = pytest.mark.slow

BATCH = 1 << 16          # 65536 — bench-scale per-pass batch


@pytest.fixture(scope="module")
def backend():
    from elfi_tpu.parallel.backends import ShardedBackend
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return ShardedBackend()


def test_batch_outputs_sharded_one_over_ndev(backend):
    """Every per-simulation output of a sharded batch dispatch holds
    exactly batch/n_dev rows per device — per-device memory is
    O(batch / n_dev), the ICI data-parallel contract (SURVEY §7)."""
    from elfi_tpu.compile.compiler import compile_program

    n_dev = backend.n_devices
    m = ma2.get_model(seed_obs=4)
    prog = compile_program(m, ("d", "t1", "t2"))
    tid = backend.submit(prog, 0, 0, {}, BATCH)
    out = backend.get_result(tid)
    assert set(out) == {"d", "t1", "t2"}
    for k, v in out.items():
        assert v.shape[0] == BATCH
        assert len(v.sharding.device_set) == n_dev, \
            f"{k} not distributed over the mesh"
        shard_shapes = {s.data.shape for s in v.addressable_shards}
        assert shard_shapes == {(BATCH // n_dev,) + v.shape[1:]}, \
            f"{k} per-device shard is not batch/n_dev: {shard_shapes}"


def test_fused_sharded_rejection_parity_at_scale(backend):
    """Fused sharded rejection == native fused result at bench-scale
    batch (toy-size parity is covered in test_rejection.py:79-96)."""
    m = ma2.get_model(seed_obs=4)
    prev = elfi.get_client()
    try:
        elfi.set_client(backend)
        res_s = elfi.Rejection(m["d"], batch_size=BATCH, seed=21).sample(
            500, n_sim=BATCH * 4, bar=False)
        elfi.set_client("native")
        res_n = elfi.Rejection(m["d"], batch_size=BATCH, seed=21).sample(
            500, n_sim=BATCH * 4, bar=False)
        np.testing.assert_array_equal(res_s.samples_array,
                                      res_n.samples_array)
    finally:
        elfi.set_client(prev)


def test_bsl_round_batch_sharded_one_over_ndev(backend):
    """The fused BSL chain's per-round simulation batch carries a
    batch-axis sharding constraint over the mesh, and GSPMD actually
    honours it: every constrained per-simulation array is laid out
    n_sim_round/n_dev per device (VERDICT r3 weak #6 — the batch used to
    replicate on a mesh)."""
    n_dev = backend.n_devices
    B = 16 * n_dev
    recorded = []
    orig = jax.lax.with_sharding_constraint

    def spy(x, s):
        y = orig(x, s)
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B:
            def record(sh, shape=x.shape):
                recorded.append((shape, sh))
            jax.debug.inspect_array_sharding(y, callback=record)
        return y

    m = ma2.get_model(seed_obs=4)
    prev = elfi.get_client()
    try:
        elfi.set_client(backend)
        jax.lax.with_sharding_constraint = spy
        bsl = elfi.BSL(m, n_sim_round=B, feature_names=["S1", "S2"],
                       seed=11)
        res = bsl.sample(20, sigma_proposals=np.diag([0.05, 0.05]),
                         params0=np.array([[0.6, 0.2]]), burn_in=4,
                         fused=True, bar=False)
    finally:
        jax.lax.with_sharding_constraint = orig
        elfi.set_client(prev)
    assert np.all(np.isfinite(res.samples_array))
    assert recorded, "no per-round batch arrays were shard-constrained"
    for shape, sh in recorded:
        assert len(sh.device_set) == n_dev, \
            f"round batch {shape} not distributed over the mesh: {sh}"
        assert sh.shard_shape(shape)[0] == B // n_dev, \
            f"round batch {shape} per-device shard is not B/n_dev"


def test_sharded_program_memory_scales(backend):
    """The compiled sharded program's per-device temp/output footprint is
    ~1/n_dev of the single-device program's (XLA memory analysis where
    the backend provides it)."""
    from elfi_tpu.compile.compiler import compile_program

    m = ma2.get_model(seed_obs=4)
    prog = compile_program(m, ("d", "t1", "t2"))
    fn = backend._sharded_fn(prog, BATCH, ())
    compiled = fn.lower(jax.random.key(0), jnp.uint32(0), {}).compile()
    single = jax.jit(prog.traceable(BATCH)).lower(
        jax.random.key(0), jnp.uint32(0), {}).compile()
    try:
        mem_sharded = compiled.memory_analysis().output_size_in_bytes
        mem_single = single.memory_analysis().output_size_in_bytes
    except Exception:
        pytest.skip("backend lacks memory analysis")
    if not mem_single:
        pytest.skip("memory analysis empty on this backend")
    # per-device outputs must be ~1/n_dev of the unsharded program's
    assert mem_sharded <= mem_single / backend.n_devices * 1.5
