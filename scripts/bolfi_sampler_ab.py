"""A/B the BOLFI posterior sampler preconditioning on the bench's Ricker
problem: same fits (the fit path has no NUTS in it), sampled once with the
identity-mass NUTS (scales=None) and once with the bounds-width diagonal
mass matrix (the new default).  Reports posterior means, deviation from the
bench's rejection ground truth in gt-SD units, and min ESS / max R-hat.

Usage: python scripts/bolfi_sampler_ab.py [seeds...]
"""

import sys
import time

import numpy as np

from bolfi_ricker_accuracy import build_model


def main():
    import elfi_tpu as elfi

    seeds = [int(s) for s in sys.argv[1:]] or [1, 2, 3, 4]
    m = build_model()

    t0 = time.perf_counter()
    gt = elfi.Rejection(m["d"], batch_size=1 << 14, seed=9).sample(
        2000, n_sim=1 << 22, bar=False)
    gt_means = {k: float(np.mean(v)) for k, v in gt.samples.items()}
    gt_sds = {k: float(np.std(v)) for k, v in gt.samples.items()}
    print(f"ground truth 2^22 ({time.perf_counter() - t0:.1f}s): "
          f"means={ {k: round(v, 3) for k, v in gt_means.items()} } "
          f"sds={ {k: round(v, 3) for k, v in gt_sds.items()} }", flush=True)

    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}
    for seed in seeds:
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                           update_interval=20,
                           bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                                   "t3": (4, 16)},
                           acq_noise_var=noise, seed=seed)
        t0 = time.perf_counter()
        bolfi.fit(n_evidence=500, bar=False)
        fit_s = time.perf_counter() - t0
        for label, scales in (("identity", None), ("widths", "default")):
            t0 = time.perf_counter()
            if scales is None:
                res = bolfi.sample(1000, n_chains=4, bar=False, scales=None)
            else:
                res = bolfi.sample(1000, n_chains=4, bar=False)
            wall = time.perf_counter() - t0
            means = {k: float(np.ravel(v)[0])
                     for k, v in res.sample_means.items()}
            devs = {k: abs(means[k] - gt_means[k]) / gt_sds[k]
                    for k in gt_sds}
            status = "OK " if max(devs.values()) < 2.0 else "FAIL"
            ess = min(float(np.min(v)) for v in bolfi.ess.values())
            rhat = max(float(np.max(v)) for v in bolfi.rhat.values())
            print(f"seed={seed} {label:8s} {status} fit={fit_s:.1f}s "
                  f"sample={wall:.1f}s "
                  f"means={ {k: round(v, 3) for k, v in means.items()} } "
                  f"dev_sd={ {k: round(v, 2) for k, v in devs.items()} } "
                  f"minESS={ess:.0f} maxRhat={rhat:.3f}", flush=True)


if __name__ == "__main__":
    main()
