"""Benchmark driver: MA2 rejection-ABC simulations/sec on one chip.

Mirrors the reference's canonical benchmark (``scripts/MA2_run.py``:
batch_size=10000, N=1000 samples, quantile=0.01) at TPU-scale batch sizes
through the fused lax.scan rejection path.  Prints ONE JSON line.

Baseline: reference multiprocessing client does ~254k sims/s on MA2
(BASELINE.md, ``docs/usage/parallelization.rst:64-73``).  The warmup run
uses the identical chunk shapes as the measured run so the measurement is
steady-state execution, not XLA compilation.
"""

import json
import os
import time

import numpy as np

BASELINE_SIMS_PER_S = 254_000


def _bench_bolfi_ricker():
    """North-star #2: BOLFI to posterior on Ricker, target < 60 s
    (fused device BO loop + vmapped NUTS; priors match surrogate bounds as
    in the reference BOLFI recipe)."""
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    import elfi_tpu as elfi
    from elfi_tpu.models.ricker import (chi_squared, num_zeros,
                                        stochastic_ricker)

    sim = partial(stochastic_ricker, n_obs=50)
    y_obs = np.asarray(sim(jnp.asarray([3.8]), jnp.asarray([0.3]),
                           jnp.asarray([10.0]), batch_size=1,
                           key=jax.random.key(4)))[0]
    m = elfi.Model(name="ricker_bolfi")
    elfi.Prior("uniform", 3, 2, model=m, name="t1")
    elfi.Prior("uniform", 0.05, 0.75, model=m, name="t2")
    elfi.Prior("uniform", 4, 12, model=m, name="t3")
    elfi.Simulator(sim, m["t1"], m["t2"], m["t3"], observed=y_obs, model=m,
                   name="Ricker")
    s1 = elfi.Summary(lambda x: jnp.mean(x, axis=1), m["Ricker"], model=m,
                      name="Mean")
    s2 = elfi.Summary(lambda x: jnp.var(x, axis=1), m["Ricker"], model=m,
                      name="Var")
    s3 = elfi.Summary(num_zeros, m["Ricker"], model=m, name="n0")
    elfi.Discrepancy(chi_squared, s1, s2, s3, model=m, name="d")
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d")

    t0 = time.perf_counter()
    bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=30,
                       update_interval=10,
                       bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                               "t3": (4, 16)},
                       acq_noise_var=0.05, seed=1)
    bolfi.fit(n_evidence=150, bar=False)
    res = bolfi.sample(1000, n_chains=4, bar=False)
    wall = time.perf_counter() - t0
    means = {k: round(float(np.ravel(v)[0]), 3)
             for k, v in res.sample_means.items()}
    return round(wall, 2), means


def _bench_smc_gauss2d():
    """2D-Gauss SMC-ABC (BASELINE.md config): fused device rounds."""
    import numpy as np

    import elfi_tpu as elfi
    from elfi_tpu.models import gauss

    m = gauss.get_model(n_obs=50, true_params=[4.0, 2.0], nd_mean=True,
                        cov_matrix=np.eye(2))
    elfi.SMC(m["d"], batch_size=16384, seed=3).sample(
        2000, thresholds=[2.0, 1.0, 0.5, 0.3], bar=False)   # warmup/compile
    smc = elfi.SMC(m["d"], batch_size=16384, seed=4)
    t0 = time.perf_counter()
    res = smc.sample(2000, thresholds=[2.0, 1.0, 0.5, 0.3], bar=False)
    wall = time.perf_counter() - t0
    means = {k: round(float(np.ravel(v)[0]), 3)
             for k, v in res.sample_means.items()}
    return round(wall, 2), means


def _bench_bsl_ma2():
    """MA2 BSL with Warton shrinkage (BASELINE.md config): the whole
    1000-iteration MH chain (proposals, per-round 500-sim batches,
    synthetic likelihood, accepts) runs as ONE jitted lax.scan."""
    import numpy as np

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2

    m = ma2.get_model(seed_obs=4)
    lik = elfi.methods.bsl.standard_likelihood(shrinkage="warton",
                                               penalty=0.3)
    kw = dict(n_sim_round=500, feature_names=["S1", "S2"], likelihood=lik)
    elfi.BSL(m, seed=3, **kw).sample(       # warmup/compile
        1000, sigma_proposals=np.diag([.05, .05]),
        params0=np.array([[.6, .2]]), burn_in=200, bar=False)
    bsl = elfi.BSL(m, seed=4, **kw)
    t0 = time.perf_counter()
    res = bsl.sample(1000, sigma_proposals=np.diag([.05, .05]),
                     params0=np.array([[.6, .2]]), burn_in=200, bar=False)
    wall = time.perf_counter() - t0
    means = {k: round(float(np.ravel(v)[0]), 3)
             for k, v in res.sample_means.items()}
    return round(wall, 2), means


def main():
    import jax
    from elfi_tpu.utils import setup_performance_cache
    try:
        setup_performance_cache(os.path.join(
            os.path.dirname(__file__) or ".", ".jax_cache"))
    except Exception:
        pass
    import elfi_tpu as elfi
    from elfi_tpu.models import ma2, ma2_pallas

    # BOLFI first (threefry: jax.random.poisson needs it) ...
    bolfi_s, bolfi_means = _bench_bolfi_ricker()
    smc_s, smc_means = _bench_smc_gauss2d()
    bsl_s, bsl_means = _bench_bsl_ma2()

    # ... then the rejection benchmark with the hardware RNG (~1.4x faster
    # normal generation than threefry on TPU; still fully deterministic
    # per (seed, batch_index))
    jax.config.update("jax_default_prng_impl", "rbg")

    batch_size = 1 << 17          # 131072 sims per graph pass (VMEM sweet spot)
    n_samples = 5000
    n_sim = 2048 * batch_size     # ~268M simulations per run (amortizes the
    #                               ~0.2s dispatch+fetch floor of the tunnel)

    m = ma2.get_model(seed_obs=4)

    # warmup: identical shapes/chunk lengths -> compile happens here
    elfi.Rejection(m["d"], batch_size=batch_size, seed=0).sample(
        n_samples, n_sim=n_sim, bar=False)

    rej = elfi.Rejection(m["d"], batch_size=batch_size, seed=1)
    t0 = time.perf_counter()
    res = rej.sample(n_samples, n_sim=n_sim, bar=False)
    wall = time.perf_counter() - t0

    # variant with the fused Pallas sim+summaries+distance kernel
    mp = ma2_pallas.get_model(seed_obs=4)
    elfi.Rejection(mp["d"], batch_size=batch_size, seed=0).sample(
        n_samples, n_sim=n_sim, bar=False)
    t1 = time.perf_counter()
    elfi.Rejection(mp["d"], batch_size=batch_size, seed=1).sample(
        n_samples, n_sim=n_sim, bar=False)
    wall_pallas = time.perf_counter() - t1

    sims_per_s = n_sim / wall
    result = {
        "metric": "MA2 rejection-ABC simulations/sec/chip",
        "value": round(sims_per_s, 1),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_s / BASELINE_SIMS_PER_S, 2),
        "detail": {
            "pallas_kernel_sims_per_s": round(n_sim / wall_pallas, 1),
            "bolfi_ricker_total_s": bolfi_s,
            "bolfi_ricker_posterior_means": bolfi_means,
            "bolfi_ricker_target_s": 60.0,
            "smc_gauss2d_total_s": smc_s,
            "smc_gauss2d_posterior_means": smc_means,
            "bsl_ma2_warton_1000iter_total_s": bsl_s,
            "bsl_ma2_posterior_means": bsl_means,
            "n_sim": n_sim,
            "wall_s": round(wall, 3),
            "batch_size": batch_size,
            "n_samples": n_samples,
            "posterior_mean_t1": float(np.mean(res.samples["t1"])),
            "posterior_mean_t2": float(np.mean(res.samples["t2"])),
            "threshold": float(np.ravel(res.threshold)[-1]),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
