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


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__) or ".",
                                       ".jax_cache"))
    except Exception:
        pass

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2

    batch_size = 1 << 18          # 262144 sims per graph pass
    n_samples = 5000
    n_sim = 256 * batch_size      # ~67M simulations per run

    m = ma2.get_model(seed_obs=4)

    # warmup: identical shapes/chunk lengths -> compile happens here
    elfi.Rejection(m["d"], batch_size=batch_size, seed=0).sample(
        n_samples, n_sim=n_sim, bar=False)

    rej = elfi.Rejection(m["d"], batch_size=batch_size, seed=1)
    t0 = time.perf_counter()
    res = rej.sample(n_samples, n_sim=n_sim, bar=False)
    wall = time.perf_counter() - t0

    sims_per_s = n_sim / wall
    result = {
        "metric": "MA2 rejection-ABC simulations/sec/chip",
        "value": round(sims_per_s, 1),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_s / BASELINE_SIMS_PER_S, 2),
        "detail": {
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
