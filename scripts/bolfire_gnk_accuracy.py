"""Calibrate the BOLFIRE g-and-k bench phase (BASELINE.md config 5:
"ROMC + BOLFIRE on g-and-k").

Runs BOLFIRE on the same observed dataset as the ROMC bench phase
(seed_obs=1) and reports sampled posterior means against the
fused-rejection ground truth on that data, per seed — the same gating
protocol as the ROMC phase.

Usage: python scripts/bolfire_gnk_accuracy.py [n_evidence] [seed ...]
"""

import sys
import time

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

import elfi_tpu as elfi  # noqa: E402
from elfi_tpu.models import gnk  # noqa: E402


def ground_truth():
    m = gnk.get_model(n_obs=50, seed_obs=1)
    gt = elfi.Rejection(m["d"], batch_size=1 << 14, seed=8).sample(
        1000, n_sim=1 << 20, bar=False)
    return {k: float(np.mean(v)) for k, v in gt.samples.items()}


def run(seed, n_evidence):
    m = gnk.get_model(n_obs=50, seed_obs=1)
    bolfire = elfi.BOLFIRE(
        m, n_training_data=1000, batch_size=1000,
        feature_names=["ss_order"],
        bounds={p: (0.0, 10.0) for p in m.parameter_names},
        n_initial_evidence=30, update_interval=10, acq_noise_var=0.25,
        seed=seed)
    t0 = time.perf_counter()
    bolfire.fit(n_evidence=n_evidence, bar=False)
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = bolfire.sample(1000, n_chains=4, bar=False)
    t_sample = time.perf_counter() - t0
    means = {k: float(np.ravel(v)[0]) for k, v in res.sample_means.items()}
    return means, t_fit, t_sample


def main():
    n_evidence = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seeds = [int(s) for s in sys.argv[2:]] or [1]
    gt = ground_truth()
    print("rejection ground truth:",
          {k: round(v, 3) for k, v in gt.items()}, flush=True)
    for seed in seeds:
        means, t_fit, t_sample = run(seed, n_evidence)
        errs = {k: abs(means[k] - gt[k]) for k in gt}
        print(f"seed={seed} n_evidence={n_evidence} "
              f"means={ {k: round(v, 3) for k, v in means.items()} } "
              f"errs={ {k: round(v, 3) for k, v in errs.items()} } "
              f"fit={t_fit:.1f}s sample={t_sample:.1f}s", flush=True)


if __name__ == "__main__":
    main()
