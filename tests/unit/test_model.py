import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import elfi_tpu as elfi


def test_node_construction_and_generate(ma2):
    out = ma2.generate(batch_size=7, outputs=["t1", "t2", "MA2", "S1", "d"])
    assert out["t1"].shape == (7,)
    assert out["MA2"].shape == (7, 100)
    assert out["S1"].shape == (7,)
    assert out["d"].shape == (7,)
    assert np.all(out["d"] >= 0)


def test_auto_naming():
    m = elfi.Model()
    tau = elfi.Prior("uniform", 0, 1, model=m)
    assert tau.name == "tau"
    assert "tau" in m


def test_constant_wrapping(ma2):
    # raw scalars passed as parents become Constant nodes
    parents = ma2.dag.parents("t1")
    assert len(parents) == 1
    assert ma2.dag.get_state(parents[0])["kind"] == "constant"


def test_parameter_names_sorted(ma2):
    assert ma2.parameter_names == ["t1", "t2"]


def test_observed_required_for_distance():
    m = elfi.Model()
    p = elfi.Prior("uniform", 0, 1, model=m, name="p")
    sim = elfi.Simulator(
        lambda p, batch_size, key: p[:, None] +
        jax.random.normal(key, (batch_size, 3)),
        p, model=m, name="sim")  # no observed
    s = elfi.Summary(lambda x: jnp.mean(x, axis=1), sim, model=m, name="s")
    elfi.Distance("euclidean", s, model=m, name="d")
    with pytest.raises(ValueError, match="observed"):
        m.generate(batch_size=2, outputs=["d"])


def test_generate_with_values(ma2):
    vals = {"t1": np.full(5, 0.6, np.float32),
            "t2": np.full(5, 0.2, np.float32)}
    out = ma2.generate(batch_size=5, outputs=["t1", "d"], with_values=vals)
    np.testing.assert_allclose(out["t1"], 0.6)


def test_generate_seed_determinism(ma2):
    a = ma2.generate(batch_size=4, outputs=["d"], seed=11)
    b = ma2.generate(batch_size=4, outputs=["d"], seed=11)
    c = ma2.generate(batch_size=4, outputs=["d"], seed=12)
    np.testing.assert_array_equal(a["d"], b["d"])
    assert not np.allclose(a["d"], c["d"])


def test_node_streams_differ(ma2):
    out = ma2.generate(batch_size=100, outputs=["t1", "t2"], seed=3)
    assert not np.allclose(out["t1"], out["t2"])


def test_model_copy_independent(ma2):
    m2 = ma2.copy()
    m2.remove_node("d")
    assert "d" in ma2
    assert "d" not in m2


def test_save_load(tmp_path, ma2):
    path = ma2.save(prefix=str(tmp_path))
    m2 = elfi.Model.load(path)
    assert sorted(m2.nodes) == sorted(ma2.nodes)
    out = m2.generate(batch_size=3, outputs=["d"], seed=5)
    out1 = ma2.generate(batch_size=3, outputs=["d"], seed=5)
    np.testing.assert_array_equal(out["d"], out1["d"])


def test_become(ma2):
    # replace the distance with a cityblock distance in place
    new_d = elfi.Distance("cityblock", ma2["S1"], ma2["S2"], model=ma2,
                          name="dnew")
    ma2["d"].become(new_d)
    assert "dnew" not in ma2
    out = ma2.generate(batch_size=4, outputs=["d", "S1", "S2"], seed=1)
    prog_obs = np.abs(out["S1"] - out["S1"]).sum()  # sanity: runs
    assert out["d"].shape == (4,)


def test_node_reference_getitem(ma2):
    node = ma2["t1"]
    assert isinstance(node, elfi.Prior)
    assert node.name == "t1"
    with pytest.raises(KeyError):
        ma2["nope"]


def test_rv_size():
    m = elfi.Model()
    elfi.Prior("norm", 0, 1, size=(3,), model=m, name="k")
    out = m.generate(batch_size=5, outputs=["k"])
    assert out["k"].shape == (5, 3)


def test_operation_node():
    m = elfi.Model()
    elfi.Prior("uniform", 0, 1, model=m, name="a")
    elfi.Operation(lambda a: a * 2, m["a"], model=m, name="twice")
    out = m.generate(batch_size=10, outputs=["a", "twice"], seed=0)
    np.testing.assert_allclose(out["twice"], out["a"] * 2, rtol=1e-6)


def test_default_model_registry():
    m = elfi.new_model("fresh")
    assert elfi.get_default_model() is m
    p = elfi.Prior("uniform", 0, 1, name="p")
    assert p.model is m


def test_import_does_not_initialize_jax_backend():
    """Importing the package must not initialise any JAX backend: cluster
    workers (`python -m elfi_tpu.worker`) import elfi_tpu BEFORE they can
    force the CPU platform, and an import-time init would hand every
    worker the registered accelerator plugin (observed: axon TPU grabbed
    by module-level jnp constants in ops/special.py)."""
    code = ("import jax._src.xla_bridge as xb\n"
            "import elfi_tpu\n"
            "assert not xb._backends, list(xb._backends)\n"
            "print('LAZY_OK')\n")
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0 and "LAZY_OK" in out.stdout, \
        out.stdout + out.stderr


class TestModelPriorBox:
    """ModelPrior.box(): uniform-box detection feeding the stable sampler
    targets (methods/posteriors.py)."""

    def test_uniform_box_detected(self):
        import elfi_tpu as elfi
        from elfi_tpu.model.extensions import ModelPrior

        m = elfi.Model(name="box_m")
        elfi.Prior("uniform", 3, 2, model=m, name="a")
        elfi.Prior("uniform", -1, 4, model=m, name="b")
        elfi.Simulator(lambda a, b, batch_size, key: a + b,
                       m["a"], m["b"], observed=0.0, model=m, name="S")
        box = ModelPrior(m, parameter_names=["a", "b"]).box()
        assert box is not None
        lo, hi, logconst = box
        np.testing.assert_allclose(lo, [3.0, -1.0])
        np.testing.assert_allclose(hi, [5.0, 3.0])
        np.testing.assert_allclose(logconst, -np.log(2.0) - np.log(4.0))

    def test_default_uniform_is_unit_box(self):
        import elfi_tpu as elfi
        from elfi_tpu.model.extensions import ModelPrior

        m = elfi.Model(name="box_unit")
        elfi.Prior("uniform", model=m, name="a")
        box = ModelPrior(m, parameter_names=["a"]).box()
        lo, hi, logconst = box
        np.testing.assert_allclose(lo, [0.0])
        np.testing.assert_allclose(hi, [1.0])
        assert logconst == 0.0

    def test_non_uniform_returns_none(self):
        import elfi_tpu as elfi
        from elfi_tpu.model.extensions import ModelPrior

        m = elfi.Model(name="box_norm")
        elfi.Prior("norm", 0, 1, model=m, name="a")
        assert ModelPrior(m, parameter_names=["a"]).box() is None

    def test_hierarchical_returns_none(self):
        import elfi_tpu as elfi
        from elfi_tpu.model.extensions import ModelPrior

        m = elfi.Model(name="box_hier")
        elfi.Prior("uniform", 0, 1, model=m, name="a")
        elfi.Prior("uniform", m["a"], 1, model=m, name="b")
        assert ModelPrior(m, parameter_names=["a", "b"]).box() is None

    def test_box_logpdf_matches_traced(self):
        import jax.numpy as jnp

        import elfi_tpu as elfi
        from elfi_tpu.model.extensions import ModelPrior

        m = elfi.Model(name="box_parity")
        elfi.Prior("uniform", 3, 2, model=m, name="a")
        elfi.Prior("uniform", -1, 4, model=m, name="b")
        prior = ModelPrior(m, parameter_names=["a", "b"])
        lo, hi, logconst = prior.box()
        xs = np.array([[3.5, 0.0], [4.9, 2.9], [2.9, 0.0], [3.5, 3.1]],
                      np.float32)
        expected = prior.logpdf(xs)
        in_box = np.all((xs >= lo) & (xs <= hi), axis=1)
        got = np.where(in_box, logconst, -np.inf)
        np.testing.assert_allclose(got, expected, rtol=1e-6)
