"""Sweep culled-merge small_k at the 2^20 bench operating point.

Round-3 follow-up to scripts/merge_ab2.py: at batch 2^20 the prior sweep
showed sims/s still rising through sk=4096 (342M @1024 -> 350M @4096);
this probes the plateau and the cascade variant (tuple small_k: narrow
top_k in the steady state, wider ones guarded by the candidate count).
Usage: python scripts/merge_ab3.py [--log2batch=20] [sk|sk,sk,... ...]
"""

import sys
import time

import numpy as np


def _parse(a):
    return tuple(int(x) for x in a.split(",")) if "," in a else int(a)


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
    args = sys.argv[1:]
    log2batch = 20
    if args and args[0].startswith("--log2batch="):
        log2batch = int(args.pop(0).split("=")[1])
    batch = 1 << log2batch

    sks = [_parse(a) for a in args] or [4096, 8192, 16384]
    print(f"batch=2^{log2batch} n_sim={n_sim}", flush=True)
    for sk in sks:
        topk.MERGE_VARIANT = "culled"
        topk.CULL_SMALL_K = sk
        elfi.Rejection(mp["d"], batch_size=batch, seed=0).sample(
            n_samples, n_sim=n_sim, bar=False)
        walls = []
        for r in range(3):
            rej = elfi.Rejection(mp["d"], batch_size=batch, seed=1)
            t0 = time.perf_counter()
            res = rej.sample(n_samples, n_sim=n_sim, bar=False)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        t1 = float(np.mean(res.samples["t1"]))
        print(f"sk={sk!r:>14} best={best:.3f}s sims/s={n_sim/best/1e6:.1f}M "
              f"walls={[round(w, 3) for w in walls]} t1={t1:.4f}", flush=True)


if __name__ == "__main__":
    main()
