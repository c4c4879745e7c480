"""A/B the g-and-k fused-rejection paths on the real TPU.

VERDICT r04 item 5: prove the Mosaic fast path generalizes beyond MA2.
Measures the REAL end-to-end fused rejection wall (CLAUDE.md: standalone
microbenches on this box are unreliable) for

  xla     models/gnk.get_model      — simulate (batch, 50) in HBM,
                                      jnp.sort, euclidean distance
  pallas  models/gnk_pallas         — one kernel: normals + quantile
                                      transform + in-VMEM bitonic order
                                      statistics + distance

at batch 2^19..2^21.  Usage: python scripts/gnk_ab.py [reps]
"""

import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from elfi_tpu.utils import setup_performance_cache
    setup_performance_cache(".jax_cache")
    import jax

    import elfi_tpu as elfi
    from elfi_tpu.models import gnk, gnk_pallas

    m = gnk.get_model(n_obs=50, seed_obs=1)
    mp = gnk_pallas.get_model(n_obs=50, seed_obs=1)
    jax.config.update("jax_default_prng_impl", "rbg")

    n_samples = 5000
    n_sim = 1 << 26
    for name, model in (("xla", m), ("pallas", mp)):
        for logb in (19, 20, 21):
            batch = 1 << logb
            elfi.Rejection(model["d"], batch_size=batch, seed=0).sample(
                n_samples, n_sim=n_sim, bar=False)       # warmup/compile
            walls = []
            for _ in range(reps):
                rej = elfi.Rejection(model["d"], batch_size=batch, seed=1)
                t0 = time.perf_counter()
                res = rej.sample(n_samples, n_sim=n_sim, bar=False)
                walls.append(time.perf_counter() - t0)
            means = {k: round(float(np.mean(v)), 3)
                     for k, v in res.samples.items()}
            best = min(walls)
            print(f"{name:7s} batch=2^{logb} best={best:.3f}s "
                  f"sims/s={n_sim / best / 1e6:.1f}M "
                  f"walls={[round(w, 3) for w in walls]} post={means}",
                  flush=True)


if __name__ == "__main__":
    main()
