"""Bit-exactness A/B of the fused BOLFI fit across code versions.

Runs ONLY the fit (no sampling) for the bench Ricker config and prints a
sha256 digest of the installed evidence + hyperparameters per seed.  Run
once in the working tree and once in a pristine-HEAD worktree ON THE SAME
PLATFORM: equal digests prove the refactored fused-fit programs compute
the exact arithmetic of the validated closure-based programs (CPU
bit-equality is NOT sufficient evidence — an args-based variant measured
2026-08-18 matched on CPU but diverged under XLA:TPU fusion and collapsed
the Ricker seed-3 posterior).

Usage: PYTHONPATH=<tree>:/root/.axon_site python scripts/fused_fit_ab.py [seed...]
"""

import hashlib
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

    setup_performance_cache("/root/repo/.jax_cache")
    seeds = [int(s) for s in sys.argv[1:]] or [1, 2, 3, 4]

    sim = partial(stochastic_ricker, n_obs=50)
    y_obs = np.asarray(sim(jnp.asarray([3.8]), jnp.asarray([0.3]),
                           jnp.asarray([10.0]), batch_size=1,
                           key=jax.random.key(4)))[0]
    m = elfi.Model(name="ricker_ab")
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

    for seed in seeds:
        t0 = time.perf_counter()
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                           update_interval=20,
                           bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                                   "t3": (4, 16)},
                           acq_noise_var=noise, seed=seed)
        bolfi.fit(n_evidence=500, bar=False)
        wall = time.perf_counter() - t0
        gp = bolfi.target_model
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(gp._x).tobytes())
        h.update(np.ascontiguousarray(gp._y).tobytes())
        for k in ("sigma2", "ell", "bias", "noise"):
            h.update(np.float64(gp.params[k]).tobytes())
        print(f"seed={seed} fit={wall:.2f}s digest={h.hexdigest()[:16]}",
              flush=True)


if __name__ == "__main__":
    main()
