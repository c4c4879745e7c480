"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elfi_tpu.ops.pallas_kernels import ma2_distance, on_tpu

# the TPU PRNG primitives have no CPU interpret rules; execution tests run
# on hardware only (bench.py exercises them every round)
requires_tpu = pytest.mark.skipif(not on_tpu(),
                                  reason="TPU PRNG primitives need TPU")


@requires_tpu
def test_ma2_distance_statistics():
    """Kernel distance distribution matches the XLA MA2 path at the same
    parameters (different RNG streams; statistical agreement)."""
    from elfi_tpu.models.ma2 import MA2, autocov
    y = np.asarray(MA2(jnp.asarray([0.6]), jnp.asarray([0.2]), n_obs=100,
                       batch_size=1, key=jax.random.key(6)))[0]
    obs = np.array([float(autocov(y[None])[0]),
                    float(autocov(y[None], 2)[0])])
    B = 4096
    t1 = jnp.full((B,), 0.6)
    t2 = jnp.full((B,), 0.2)
    d_k = np.asarray(ma2_distance(t1, t2, obs, batch_size=B,
                                  key=jax.random.key(0)))
    x = MA2(t1, t2, n_obs=100, batch_size=B, key=jax.random.key(1))
    d_x = np.asarray(jnp.sqrt((autocov(x) - obs[0]) ** 2
                              + (autocov(x, 2) - obs[1]) ** 2))
    assert abs(d_k.mean() - d_x.mean()) < 0.02
    assert abs(d_k.std() - d_x.std()) < 0.02


@requires_tpu
def test_ma2_distance_deterministic():
    obs = np.array([1.0, 0.4])
    B = 4096
    t1 = jnp.full((B,), 0.5)
    a = np.asarray(ma2_distance(t1, t1, obs, batch_size=B,
                                key=jax.random.key(3)))
    b = np.asarray(ma2_distance(t1, t1, obs, batch_size=B,
                                key=jax.random.key(3)))
    c = np.asarray(ma2_distance(t1, t1, obs, batch_size=B,
                                key=jax.random.key(4)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_batch_size_validation():
    with pytest.raises(ValueError):
        ma2_distance(jnp.zeros(100), jnp.zeros(100), np.zeros(2),
                     batch_size=100, key=jax.random.key(0), interpret=True)


def test_bitonic_sort_rows_matches_np_sort():
    """The in-kernel sublane sorting network is plain jnp and testable on
    CPU: it must equal np.sort along axis 0, including +inf pads."""
    from elfi_tpu.ops.pallas_kernels import _bitonic_sort_rows

    rng = np.random.RandomState(0)
    y = rng.randn(64, 8).astype(np.float32)
    y[50:, :] = np.inf                       # the n_obs=50 padding pattern
    got = np.asarray(_bitonic_sort_rows(jnp.asarray(y), 64))
    np.testing.assert_array_equal(got, np.sort(y, axis=0))
    # non-padded full-height case
    y2 = rng.randn(64, 16).astype(np.float32)
    got2 = np.asarray(_bitonic_sort_rows(jnp.asarray(y2), 64))
    np.testing.assert_array_equal(got2, np.sort(y2, axis=0))


@requires_tpu
def test_gnk_distance_statistics():
    """Kernel distance distribution matches the XLA g-and-k path at the
    same parameters (different RNG streams; statistical agreement)."""
    from elfi_tpu.models.gnk import GNK, ss_order, euclidean_multiss
    from elfi_tpu.ops.pallas_kernels import gnk_distance

    y = np.asarray(GNK(jnp.asarray([3.0]), jnp.asarray([1.0]),
                       jnp.asarray([2.0]), jnp.asarray([0.5]), n_obs=50,
                       batch_size=1, key=jax.random.key(1)))[0]
    obs_sorted = np.sort(y.ravel())
    B = 2048
    params = [jnp.full((B,), v) for v in (3.0, 1.0, 2.0, 0.5)]
    d_k = np.asarray(gnk_distance(*params, obs_sorted, n_obs=50,
                                  batch_size=B, key=jax.random.key(0)))
    x = GNK(*params, n_obs=50, batch_size=B, key=jax.random.key(2))
    d_x = np.asarray(euclidean_multiss(ss_order(x),
                                       observed=[np.sort(y, axis=0)[None]]))
    assert np.all(np.isfinite(d_k))
    assert abs(d_k.mean() - d_x.mean()) < 0.15 * d_x.mean()
    assert abs(np.median(d_k) - np.median(d_x)) < 0.15 * np.median(d_x)


@requires_tpu
def test_gnk_distance_deterministic():
    from elfi_tpu.ops.pallas_kernels import gnk_distance

    B = 2048
    obs = np.sort(np.random.RandomState(0).randn(50)).astype(np.float32)
    params = [jnp.full((B,), v) for v in (3.0, 1.0, 2.0, 0.5)]
    a = np.asarray(gnk_distance(*params, obs, batch_size=B,
                                key=jax.random.key(3)))
    b = np.asarray(gnk_distance(*params, obs, batch_size=B,
                                key=jax.random.key(3)))
    c = np.asarray(gnk_distance(*params, obs, batch_size=B,
                                key=jax.random.key(4)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_gnk_batch_size_validation():
    from elfi_tpu.ops.pallas_kernels import gnk_distance

    with pytest.raises(ValueError):
        gnk_distance(1.0, 1.0, 1.0, 1.0, np.zeros(50), batch_size=100,
                     key=jax.random.key(0), interpret=True)
