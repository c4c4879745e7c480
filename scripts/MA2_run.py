"""MA2 rejection benchmark driver (reference ``scripts/MA2_run.py``):
batch_size=10000, 1e6 simulations, 5000 samples at quantile 0.01."""

import time

import elfi_tpu as elfi
from elfi_tpu.models import ma2


def run(batch_size=10_000, n_samples=5000, quantile=0.005, seed=0):
    m = ma2.get_model(seed_obs=4)
    # warmup with identical shapes: XLA compilation happens here, so the
    # measurement below is steady-state execution (compiles are one-time
    # and persistently cached -- see utils.setup_performance_cache)
    elfi.Rejection(m["d"], batch_size=batch_size, seed=seed + 1).sample(
        n_samples, quantile=quantile, bar=False)
    rej = elfi.Rejection(m["d"], batch_size=batch_size, seed=seed)
    t0 = time.perf_counter()
    res = rej.sample(n_samples, quantile=quantile, bar=False)
    wall = time.perf_counter() - t0
    n_sim = res.meta["n_sim"]
    print(f"{n_sim} simulations, {n_samples} samples: {wall:.3f}s "
          f"({n_sim / wall / 1e6:.1f}M sims/s)")
    print(res)
    return res


if __name__ == "__main__":
    run()
