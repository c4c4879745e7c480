"""Multi-seed BOLFIRE accuracy study on the calibrated MA2 dataset.

Sizes the posterior-accuracy gate for tests/functional/test_inference.py
(VERDICT r04 #2: BOLFIRE was the only method without a statistical gate).
Mirrors the BOLFI gate protocol: sampled posterior means vs the generating
parameters (0.6, 0.2) on seed_obs=271, whose true rejection posterior mean
is within 0.016 of the generating values.

Usage: python scripts/bolfire_ma2_accuracy.py [n_evidence] [seed ...]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

import elfi_tpu as elfi  # noqa: E402
from elfi_tpu.models import ma2  # noqa: E402


def run(seed, n_evidence):
    m = ma2.get_model(seed_obs=271)
    bolfire = elfi.BOLFIRE(
        m, n_training_data=500, batch_size=500,
        bounds={"t1": (-2, 2), "t2": (-1, 1)},
        n_initial_evidence=20, update_interval=10, acq_noise_var=0.1,
        seed=seed)
    t0 = time.perf_counter()
    bolfire.fit(n_evidence=n_evidence, bar=False)
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = bolfire.sample(1000, n_chains=4, bar=False)
    t_sample = time.perf_counter() - t0
    means = {k: float(np.ravel(v)[0]) for k, v in res.sample_means.items()}
    err = {k: abs(means[k] - t) for k, t in
           zip(("t1", "t2"), (0.6, 0.2))}
    print(f"seed={seed} n_evidence={n_evidence} "
          f"means=({means['t1']:.3f}, {means['t2']:.3f}) "
          f"err=({err['t1']:.3f}, {err['t2']:.3f}) "
          f"fit={t_fit:.1f}s sample={t_sample:.1f}s", flush=True)
    return err


def main():
    n_evidence = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seeds = [int(s) for s in sys.argv[2:]] or [11]
    worst = 0.0
    for seed in seeds:
        err = run(seed, n_evidence)
        worst = max(worst, *err.values())
    print(f"worst abs error over {len(seeds)} seeds: {worst:.3f}")


if __name__ == "__main__":
    main()
