"""Seeded-determinism tests: same seed => identical outputs, different
seed => different (reference ``tests/functional/test_consistency.py``)."""

import numpy as np
import pytest

import jax.numpy as jnp

import elfi_tpu as elfi


def equal_sample(a, b):
    return all(np.array_equal(np.asarray(a.outputs[k]),
                              np.asarray(b.outputs[k]))
               for k in a.outputs)


def test_rejection_consistency(ma2):
    kw = dict(batch_size=64, seed=123)
    a = elfi.Rejection(ma2["d"], **kw).sample(16, n_sim=256, bar=False)
    b = elfi.Rejection(ma2["d"], **kw).sample(16, n_sim=256, bar=False)
    c = elfi.Rejection(ma2["d"], batch_size=64, seed=124).sample(
        16, n_sim=256, bar=False)
    assert equal_sample(a, b)
    assert not equal_sample(a, c)


def test_smc_consistency(ma2):
    a = elfi.SMC(ma2["d"], batch_size=100, seed=5).sample(
        20, quantiles=[0.5, 0.5], bar=False)
    b = elfi.SMC(ma2["d"], batch_size=100, seed=5).sample(
        20, quantiles=[0.5, 0.5], bar=False)
    assert equal_sample(a, b)
    np.testing.assert_array_equal(a.weights, b.weights)


def test_bolfi_consistency(ma2):
    elfi.Operation(jnp.log, ma2["d"], model=ma2, name="log_d")

    def run(seed):
        bolfi = elfi.BOLFI(ma2["log_d"], batch_size=1, initial_evidence=12,
                           bounds={"t1": (-2, 2), "t2": (-1, 1)}, seed=seed)
        bolfi.fit(n_evidence=16, bar=False)
        return bolfi.target_model

    g1, g2 = run(9), run(9)
    np.testing.assert_allclose(g1.X, g2.X, rtol=1e-6)
    np.testing.assert_allclose(g1.Y, g2.Y, rtol=1e-6)


def test_bsl_consistency(ma2):
    a = elfi.BSL(ma2, n_sim_round=100, seed=2).sample(
        5, sigma_proposals=np.eye(2) * .1, bar=False)
    b = elfi.BSL(ma2, n_sim_round=100, seed=2).sample(
        5, sigma_proposals=np.eye(2) * .1, bar=False)
    assert equal_sample(a, b)


def test_generate_stable_under_recompiles(ma2):
    """Adding an unrelated node must not change existing node streams
    (counter-based per-node RNG, unlike the reference's shared state)."""
    before = ma2.generate(batch_size=8, outputs=["t1", "d"], seed=42)
    elfi.Summary(lambda x: jnp.max(x, axis=1), ma2["MA2"], model=ma2,
                 name="extra_summary")
    after = ma2.generate(batch_size=8, outputs=["t1", "d"], seed=42)
    np.testing.assert_array_equal(before["t1"], after["t1"])
    np.testing.assert_array_equal(before["d"], after["d"])
