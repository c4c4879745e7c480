"""Follow-up sweep: culled-merge boundary (batch 2^18) and small_k."""

import sys
import time

import numpy as np


def main():
    from elfi_tpu.utils import setup_performance_cache
    setup_performance_cache(".jax_cache")
    import jax

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2_pallas
    from elfi_tpu.ops import topk

    mp = ma2_pallas.get_model(seed_obs=271)
    jax.config.update("jax_default_prng_impl", "rbg")
    n_samples = 5000
    n_sim = 2048 * (1 << 17)

    runs = [("flat", 1 << 18, None), ("culled", 1 << 18, 1024),
            ("culled", 1 << 19, 512), ("culled", 1 << 19, 2048)]
    for variant, batch, sk in runs:
        topk.MERGE_VARIANT = variant
        if sk is not None:
            topk.CULL_SMALL_K = sk
        elfi.Rejection(mp["d"], batch_size=batch, seed=0).sample(
            n_samples, n_sim=n_sim, bar=False)
        walls = []
        for r in range(2):
            rej = elfi.Rejection(mp["d"], batch_size=batch, seed=1)
            t0 = time.perf_counter()
            res = rej.sample(n_samples, n_sim=n_sim, bar=False)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        t1 = float(np.mean(res.samples["t1"]))
        print(f"{variant:7s} batch=2^{batch.bit_length()-1} sk={sk} "
              f"best={best:.3f}s sims/s={n_sim/best/1e6:.1f}M "
              f"walls={[round(w,3) for w in walls]} t1={t1:.3f}", flush=True)


if __name__ == "__main__":
    main()
