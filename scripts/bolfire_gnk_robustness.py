"""Multi-seed robustness study for the fused BOLFIRE gnk bench phase.

The bench gate (A within 1.0 of the rejection ground truth + posterior
contraction) failed on one of four same-seed runs (A 3.14-4.88): the
marginal training data was drawn with ``seed_marginal=None`` — global
numpy RNG — so every run trained against a DIFFERENT marginal.  This
study seeds the marginal per run and sweeps configs x seeds to pick an
operating point that passes with margin on every seed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/bolfire_gnk_robustness.py [seed ...]
"""

import sys
import time

import numpy as np


def main(seeds):
    from elfi_tpu.utils import setup_performance_cache
    setup_performance_cache(".jax_cache")
    import elfi_tpu as elfi
    from elfi_tpu.models import gnk

    m = gnk.get_model(n_obs=50, seed_obs=1)
    elfi.Summary(gnk.ss_octile_sq, m["GNK"], model=m, name="ss_osq")

    gt_m = gnk.get_model(n_obs=50, seed_obs=1)
    gt = elfi.Rejection(gt_m["d"], batch_size=1 << 14, seed=8).sample(
        1000, n_sim=1 << 20, bar=False)
    gt_A = float(np.mean(gt.samples["A"]))
    prior_sd = 10.0 / np.sqrt(12.0)
    print(f"ground-truth A: {gt_A:.3f}")

    configs = [
        ("base-200", dict(n_evidence=200, epsilon=0.0)),
        ("eps0.2-200", dict(n_evidence=200, epsilon=0.2)),
        ("base-300", dict(n_evidence=300, epsilon=0.0)),
        ("eps0.2-300", dict(n_evidence=300, epsilon=0.2)),
    ]
    for name, cfg in configs:
        errs = []
        for seed in seeds:
            t0 = time.perf_counter()
            bolfire = elfi.BOLFIRE(
                m, n_training_data=2000, batch_size=2000,
                feature_names=["ss_osq"],
                bounds={p: (0.0, 10.0) for p in ("A", "B", "g", "k")},
                n_initial_evidence=40, update_interval=10,
                acq_noise_var=0.25, seed=seed, seed_marginal=seed + 1000)
            if cfg["epsilon"]:
                bolfire.acquisition_method.epsilon = cfg["epsilon"]
            bolfire.fit(n_evidence=cfg["n_evidence"], bar=False)
            res = bolfire.sample(1000, n_chains=4, bar=False)
            wall = time.perf_counter() - t0
            a = np.ravel(res.samples["A"])
            err = float(np.mean(a)) - gt_A
            sd_ratio = float(np.std(a)) / prior_sd
            errs.append(abs(err))
            print(f"{name:11s} seed={seed} A_err={err:+.3f} "
                  f"sd/prior={sd_ratio:.2f} wall={wall:.1f}s", flush=True)
        print(f"{name:11s} worst |A_err| = {max(errs):.3f}", flush=True)


if __name__ == "__main__":
    main([int(s) for s in sys.argv[1:]] or [1, 2, 3, 4, 5, 6])
