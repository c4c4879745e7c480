"""Phase breakdown of the bench's BOLFI-Ricker run on the real TPU.

Times the warm (second-run) fit and NUTS sample separately, plus the
fit's init/segment/refit sub-phases, to direct optimization at the
dominant cost (VERDICT r4 item 3: push total back toward ~16 s).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bolfi_profile.py [seed...]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import elfi_tpu as elfi
    from elfi_tpu.utils import setup_performance_cache
    from elfi_tpu.models.ricker import (chi_squared, num_zeros,
                                        stochastic_ricker)

    setup_performance_cache(".jax_cache")
    seeds = [int(s) for s in sys.argv[1:]] or [1]

    sim = partial(stochastic_ricker, n_obs=50)
    y_obs = np.asarray(sim(jnp.asarray([3.8]), jnp.asarray([0.3]),
                           jnp.asarray([10.0]), batch_size=1,
                           key=jax.random.key(4)))[0]
    m = elfi.Model(name="ricker_prof")
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

    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}

    def run(seed, label):
        t0 = time.perf_counter()
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                           update_interval=20,
                           bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                                   "t3": (4, 16)},
                           acq_noise_var=noise, seed=seed)
        bolfi.fit(n_evidence=500, bar=False)
        t_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = bolfi.sample(1000, n_chains=4, bar=False)
        t_sample = time.perf_counter() - t0
        print(f"{label} seed={seed}: fit={t_fit:.2f}s sample={t_sample:.2f}s "
              f"total={t_fit + t_sample:.2f}s "
              f"means={ {k: round(float(np.ravel(v)[0]), 3) for k, v in res.sample_means.items()} }",
              flush=True)
        return t_fit, t_sample

    run(2, "warmup")          # compiles everything at identical shapes
    for seed in seeds:
        run(seed, "warm")


if __name__ == "__main__":
    main()
