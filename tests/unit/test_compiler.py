import numpy as np
import pytest

import jax
import jax.numpy as jnp

import elfi_tpu as elfi
from elfi_tpu.compile.compiler import compile_program


def test_reduce_to_needed_nodes(ma2):
    prog = compile_program(ma2, ("S1",))
    assert "d" not in prog.order
    assert "S2" not in prog.order
    assert set(prog.order) >= {"t1", "t2", "MA2", "S1"}


def test_override_skips_ancestors(ma2):
    prog = compile_program(ma2, ("d",), override_names=("S1", "S2"))
    # simulator and priors are not needed when summaries are overridden
    assert "MA2" not in prog.order
    assert "t1" not in prog.order


def test_observed_values_cached(ma2):
    prog = compile_program(ma2, ("d",))
    v1 = prog.observed_value("S1")
    v2 = prog.observed_value("S1")
    assert v1 is v2
    assert np.asarray(v1).shape == (1,)


def test_program_cache_invalidation(ma2):
    p1 = compile_program(ma2, ("d",))
    p2 = compile_program(ma2, ("d",))
    assert p1 is p2
    ma2.update_node("d", dummy=1)
    p3 = compile_program(ma2, ("d",))
    assert p3 is not p1


def test_meta_injection():
    m = elfi.Model()
    elfi.Prior("uniform", 0, 1, model=m, name="p")

    def op(p, meta):
        return p + 0.0 * meta["batch_index"]

    elfi.Operation(op, m["p"], uses_meta=True, model=m, name="with_meta")
    out = m.generate(batch_size=3, outputs=["with_meta"])
    assert out["with_meta"].shape == (3,)


def test_batch_index_changes_draws(ma2):
    prog = compile_program(ma2, ("t1",))
    key = jax.random.key(0)
    a = prog.run(key, 0, {}, batch_size=5)["t1"]
    b = prog.run(key, 1, {}, batch_size=5)["t1"]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_host_flag_detection():
    m = elfi.Model()
    elfi.Prior("uniform", 0, 1, model=m, name="p")

    def host_sim(p, batch_size, random_state):
        return random_state.rand(batch_size, 3) + np.asarray(p)[:, None]

    elfi.Simulator(host_sim, m["p"], host=True, observed=np.zeros(3),
                   model=m, name="sim")
    prog = compile_program(m, ("sim",))
    assert prog.host
    out = m.generate(batch_size=4, outputs=["sim"], seed=1)
    assert out["sim"].shape == (4, 3)
    # determinism on host path too
    out2 = m.generate(batch_size=4, outputs=["sim"], seed=1)
    np.testing.assert_array_equal(out["sim"], out2["sim"])


def test_serialization_roundtrip(ma2, tmp_path):
    import pickle
    prog = compile_program(ma2, ("d",))
    prog.run(jax.random.key(0), 0, {}, batch_size=4)  # warm caches
    blob = pickle.dumps(prog)
    prog2 = pickle.loads(blob)
    a = prog.run(jax.random.key(3), 0, {}, batch_size=4)["d"]
    b = prog2.run(jax.random.key(3), 0, {}, batch_size=4)["d"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_undeclared_override_raises(ma2):
    """Regression guard: passing overrides the program was not compiled
    with must fail loudly instead of being silently ignored."""
    import jax
    import jax.numpy as jnp
    import pytest
    from elfi_tpu.compile.compiler import compile_program

    prog = compile_program(ma2, ("d",))
    fn = prog.traceable(8)
    with pytest.raises(ValueError, match="not declared"):
        fn(jax.random.key(0), jnp.uint32(0), {"t1": jnp.zeros(8)})
    # the direct run() entry point must enforce the same guard (it used to
    # silently filter undeclared overrides out)
    with pytest.raises(ValueError, match="not declared"):
        prog.run(jax.random.key(0), 0, {"t1": jnp.zeros(8)}, batch_size=8)


def test_unknown_override_name_raises_at_compile():
    """A typo'd override name is declared (passes the runtime guards) yet
    never consumed by the trace — it must fail at compile, not silently
    simulate the un-overridden graph."""
    from elfi_tpu.models import ma2
    from elfi_tpu.compile.compiler import compile_program

    m = ma2.get_model(seed_obs=4)
    with pytest.raises(ValueError, match="Unknown override node"):
        compile_program(m, ("d",), override_names=("t1_typo",))
    with pytest.raises(ValueError, match="Unknown override node"):
        m.generate(4, outputs=["t1"], with_values={"t1_typo": 0.5})


def test_program_cache_tracks_shared_adaptive_state():
    """The adaptive-distance weights holder is shared across model
    copies; mutating it through a COPY must invalidate programs compiled
    against the ORIGINAL (whose revision does not change)."""
    import elfi_tpu as elfi
    from elfi_tpu.models import ma2
    from elfi_tpu.compile.compiler import compile_program

    m = ma2.get_model(seed_obs=4)
    elfi.AdaptiveDistance(m["S1"], m["S2"], model=m, name="ad")
    prog1 = compile_program(m, ("ad",))
    copy = m.copy()
    node = copy["ad"]
    node.init_adaptation_round()
    node.add_data(np.random.rand(16), np.random.rand(16))
    node.update_distance()            # bumps the COPY's revision only
    prog2 = compile_program(m, ("ad",))
    assert prog2 is not prog1         # version keying caught the mutation
    out = prog2.run(jax.random.key(0), 0, {}, batch_size=8)
    assert np.asarray(out["ad"]).shape == (8, 2)   # two distance columns


def test_host_scalar_override_broadcasts_like_traced():
    """run_host must materialize a scalar override as (batch_size,), the
    same shape the traced path broadcasts to — host ops that index per
    batch member crash or mis-shape on a bare scalar."""
    import elfi_tpu as elfi
    from elfi_tpu.compile.compiler import compile_program

    m = elfi.Model(name="host_scalar_override")
    elfi.Prior("uniform", 0, 1, model=m, name="mu")

    def sim(mu, batch_size=1, random_state=None, **kw):
        mu = np.asarray(mu)
        assert mu.shape == (batch_size,), mu.shape
        return mu[:, None] + random_state.rand(batch_size, 3)

    elfi.Simulator(sim, m["mu"], host=True,
                   observed=np.array([.5, .5, .5]), model=m, name="sim")
    prog = compile_program(m, ("sim", "mu"), override_names=("mu",))
    out = prog.run(jax.random.key(0), 0, {"mu": 0.25}, batch_size=6)
    assert np.asarray(out["mu"]).shape == (6,)
    assert np.asarray(out["sim"]).shape == (6, 3)
