"""A/B the fused-rejection merge variants on the real TPU.

CLAUDE.md: standalone top_k microbenches on this box are unreliable —
this measures the REAL end-to-end fused rejection wall (same config as
bench.py) for MERGE_VARIANT in {flat, culled}, on both the Pallas path
(batch 2^19) and the XLA path (batch 2^17).

Usage: python scripts/merge_ab.py [reps]
"""

import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from elfi_tpu.utils import setup_performance_cache
    setup_performance_cache(".jax_cache")
    import jax

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2, ma2_pallas
    from elfi_tpu.ops import topk

    m = ma2.get_model(seed_obs=271)
    mp = ma2_pallas.get_model(seed_obs=271)
    jax.config.update("jax_default_prng_impl", "rbg")

    n_samples = 5000
    configs = [("pallas", mp, 1 << 19), ("xla", m, 1 << 17)]
    for variant in ("flat", "culled"):
        topk.MERGE_VARIANT = variant
        for name, model, batch in configs:
            n_sim = 2048 * (1 << 17)
            elfi.Rejection(model["d"], batch_size=batch, seed=0).sample(
                n_samples, n_sim=n_sim, bar=False)        # warmup/compile
            walls = []
            for r in range(reps):
                rej = elfi.Rejection(model["d"], batch_size=batch, seed=1)
                t0 = time.perf_counter()
                res = rej.sample(n_samples, n_sim=n_sim, bar=False)
                walls.append(time.perf_counter() - t0)
            t1 = float(np.mean(res.samples["t1"]))
            t2 = float(np.mean(res.samples["t2"]))
            best = min(walls)
            print(f"{variant:7s} {name:7s} batch=2^{batch.bit_length()-1} "
                  f"best={best:.3f}s  sims/s={n_sim/best/1e6:.1f}M  "
                  f"walls={[round(w, 3) for w in walls]}  "
                  f"post=({t1:.3f},{t2:.3f})", flush=True)


if __name__ == "__main__":
    main()
