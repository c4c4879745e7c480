"""Accuracy evidence for the BOLFI-Ricker bench budget (CLAUDE.md: refit
cadence / evidence changes require a fresh multi-seed accuracy check).

Runs the bench's Ricker BOLFI fit at a given n_evidence across several
seeds and reports the per-parameter deviation from the rejection ground
truth in ground-truth-SD units (bench gate: < 2 SD).

Usage: python scripts/bolfi_ricker_accuracy.py [n_evidence] [update_interval]
       [seeds...]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def build_model():
    import elfi_tpu as elfi
    from elfi_tpu.models.ricker import (chi_squared, num_zeros,
                                        stochastic_ricker)

    sim = partial(stochastic_ricker, n_obs=50)
    y_obs = np.asarray(sim(jnp.asarray([3.8]), jnp.asarray([0.3]),
                           jnp.asarray([10.0]), batch_size=1,
                           key=jax.random.key(4)))[0]
    m = elfi.Model(name="ricker_bolfi_acc")
    elfi.Prior("uniform", 3, 2, model=m, name="t1")
    elfi.Prior("uniform", 0.05, 0.75, model=m, name="t2")
    elfi.Prior("uniform", 4, 12, model=m, name="t3")
    elfi.Simulator(sim, m["t1"], m["t2"], m["t3"], observed=y_obs, model=m,
                   name="Ricker")
    elfi.Summary(lambda x: jnp.mean(x, axis=1), m["Ricker"], model=m,
                 name="Mean")
    elfi.Summary(lambda x: jnp.var(x, axis=1), m["Ricker"], model=m,
                 name="Var")
    elfi.Summary(num_zeros, m["Ricker"], model=m, name="n0")
    elfi.Discrepancy(chi_squared, m["Mean"], m["Var"], m["n0"], model=m,
                     name="d")
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d")
    return m


def main():
    import elfi_tpu as elfi

    n_evidence = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    update_interval = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    seeds = [int(s) for s in sys.argv[3:]] or [1, 2, 3, 4]
    m = build_model()

    # ground-truth pool MUST match bench.py's (seed 9, 2^22 sims): the
    # gate arithmetic is in gt-SD units and a 2^20 pool's looser posterior
    # SD (t3: 1.11 vs 0.94) once passed a study that the bench then failed
    t0 = time.perf_counter()
    gt = elfi.Rejection(m["d"], batch_size=1 << 14, seed=9).sample(
        2000, n_sim=1 << 22, bar=False)
    gt_means = {k: float(np.mean(v)) for k, v in gt.samples.items()}
    gt_sds = {k: float(np.std(v)) for k, v in gt.samples.items()}
    print(f"ground truth ({time.perf_counter() - t0:.1f}s): "
          f"means={ {k: round(v, 3) for k, v in gt_means.items()} } "
          f"sds={ {k: round(v, 3) for k, v in gt_sds.items()} }",
          flush=True)

    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}
    worst = 0.0
    for seed in seeds:
        t0 = time.perf_counter()
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                           update_interval=update_interval,
                           bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                                   "t3": (4, 16)},
                           acq_noise_var=noise, seed=seed)
        bolfi.fit(n_evidence=n_evidence, bar=False)
        res = bolfi.sample(1000, n_chains=4, bar=False)
        wall = time.perf_counter() - t0
        means = {k: float(np.ravel(v)[0]) for k, v in res.sample_means.items()}
        devs = {k: abs(means[k] - gt_means[k]) / gt_sds[k] for k in gt_sds}
        worst = max(worst, max(devs.values()))
        status = "OK " if max(devs.values()) < 2.0 else "FAIL"
        print(f"seed={seed} n_ev={n_evidence} ui={update_interval} "
              f"{status} wall={wall:.1f}s "
              f"means={ {k: round(v, 3) for k, v in means.items()} } "
              f"dev_sd={ {k: round(v, 2) for k, v in devs.items()} }",
              flush=True)
    print(f"worst deviation: {worst:.2f} sd (gate: 2.0)")


if __name__ == "__main__":
    main()
