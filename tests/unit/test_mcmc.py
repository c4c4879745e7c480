import numpy as np
import pytest

import jax.numpy as jnp

from elfi_tpu.methods import mcmc


def std_normal(x):
    return -0.5 * jnp.sum(x ** 2)


def test_nuts_standard_normal():
    chains = mcmc.nuts_chains(1200, np.zeros((2, 2)) + 0.5, std_normal,
                              seed=0)
    post = chains[:, 600:, :].reshape(-1, 2)
    np.testing.assert_allclose(post.mean(0), 0, atol=0.12)
    np.testing.assert_allclose(post.std(0), 1.0, atol=0.15)


def test_nuts_deterministic():
    a = mcmc.nuts(200, np.array([0.5]), std_normal, seed=3)
    b = mcmc.nuts(200, np.array([0.5]), std_normal, seed=3)
    c = mcmc.nuts(200, np.array([0.5]), std_normal, seed=4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_nuts_bad_init_raises():
    def target(x):
        return jnp.where(x[0] > 0, -x[0], -jnp.inf)[()]
    with pytest.raises(ValueError):
        mcmc.nuts(100, np.array([-1.0]), target, seed=0)


def test_metropolis_normal():
    s = mcmc.metropolis(8000, np.array([0.0]),
                        lambda x: -0.5 * jnp.sum(x ** 2) / 0.25,
                        np.array([0.4]), warmup=500, seed=1)
    assert abs(s.mean()) < 0.1
    np.testing.assert_allclose(s.std(), 0.5, atol=0.08)


def test_ess_iid():
    rng = np.random.RandomState(0)
    chains = rng.randn(2, 2000)
    ess = mcmc.eff_sample_size(chains)
    assert 2500 < ess < 5500  # iid -> close to 4000


def test_ess_correlated_smaller():
    rng = np.random.RandomState(0)
    x = rng.randn(3000)
    y = np.convolve(x, np.ones(10) / 10, mode="same")  # autocorrelated
    assert mcmc.eff_sample_size(y[None]) < mcmc.eff_sample_size(x[None])


def test_gelman_rubin():
    rng = np.random.RandomState(0)
    good = rng.randn(4, 1000)
    assert mcmc.gelman_rubin_statistic(good) < 1.05
    bad = good + np.arange(4)[:, None] * 3
    assert mcmc.gelman_rubin_statistic(bad) > 1.5


def test_nuts_chains_sharded_equals_single():
    """Sharding the chain axis over the mesh must not change the draws."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from elfi_tpu.methods.mcmc import nuts_chains

    def target(x):
        return -0.5 * jnp.sum(x * x)

    x0s = np.linspace(-1, 1, 8)[:, None] * np.ones((8, 2))
    a = nuts_chains(200, x0s, target, seed=3)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("chains",))
    b = nuts_chains(200, x0s, target, seed=3, mesh=mesh)
    b2 = nuts_chains(200, x0s, target, seed=3, mesh=mesh)
    # deterministic per (seed, mesh); across partitionings equivalence is
    # statistical (NUTS amplifies compilation-level float differences)
    np.testing.assert_array_equal(b, b2)
    for chains in (a, b):
        flat = chains[:, 100:, :].reshape(-1, 2)
        assert np.all(np.abs(flat.mean(0)) < 0.15)
        assert np.all(np.abs(flat.std(0) - 1) < 0.2)


def test_nuts_target_args_matches_closure():
    """Data passed via target_args must give the same chain as a closure
    baking the same data in (the args form is what keeps one compiled
    program serving every BOLFI fit)."""
    mu = np.array([0.7, -0.3], np.float32)

    def target_closure(x):
        return -0.5 * jnp.sum((x - jnp.asarray(mu)) ** 2)

    def target_args(x, mu_):
        return -0.5 * jnp.sum((x - mu_) ** 2)

    x0s = np.zeros((2, 2), np.float32)
    a = mcmc.nuts_chains(300, x0s, target_closure, seed=5)
    b = mcmc.nuts_chains(300, x0s, target_args, seed=5,
                         target_args=(jnp.asarray(mu),))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_nuts_chains_one_compile_across_datasets():
    """A stable target with varying target_args must reuse ONE compiled
    program — the regression that made every BOLFI sample() pay a full
    remote XLA compile (data was closed over, not passed)."""

    def target(x, mu_):
        return -0.5 * jnp.sum((x - mu_) ** 2)

    x0s = np.zeros((2, 2), np.float32)
    mcmc.nuts_chains(150, x0s, target, seed=1,
                     target_args=(jnp.ones(2),))
    before = mcmc._nuts_chains_jit._cache_size()
    out = mcmc.nuts_chains(150, x0s, target, seed=1,
                           target_args=(-jnp.ones(2),))
    assert mcmc._nuts_chains_jit._cache_size() == before
    # and the new data actually flowed through
    assert abs(out[:, 75:, :].mean() + 1.0) < 0.2


def test_nuts_scales_preconditioning():
    """A diagonal mass matrix (scales=) must fix mixing on anisotropic
    targets: with a 100x SD spread the identity-mass sampler's wide
    dimension barely moves, the preconditioned one matches both SDs."""
    sd = jnp.asarray([0.1, 10.0])

    def target(x):
        return -0.5 * jnp.sum((x / sd) ** 2)

    x0s = np.zeros((4, 2), np.float32)
    ch = mcmc.nuts_chains(1500, x0s, target, n_adapt=750, seed=7,
                          scales=np.array([0.1, 10.0], np.float32))
    post = ch[:, 750:, :].reshape(-1, 2)
    np.testing.assert_allclose(post.std(0), [0.1, 10.0], rtol=0.15)
    ess = mcmc.eff_sample_size(ch[:, 750:, :])
    assert np.all(ess > 500)


def test_nuts_scales_none_bit_identical():
    """scales=None must leave the sampler stream untouched (the BOLFI/BSL
    parity invariants depend on the default path not re-rolling)."""
    a = mcmc.nuts(200, np.array([0.5]), std_normal, seed=3)
    b = mcmc.nuts(200, np.array([0.5]), std_normal, seed=3, scales=None)
    np.testing.assert_array_equal(a, b)


def test_metropolis_target_args():
    s = mcmc.metropolis_chains(
        4000, np.zeros((2, 1), np.float32),
        lambda x, v: -0.5 * jnp.sum(x ** 2) / v, np.array([0.4]),
        warmup=500, seed=1, target_args=(jnp.float32(0.25),))
    np.testing.assert_allclose(np.asarray(s).std(), 0.5, atol=0.08)
