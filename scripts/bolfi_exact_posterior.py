"""Compute the EXACT BOLFI surrogate posterior mean by grid quadrature on
the bench Ricker problem (3-d bounded box -> a 96^3 midpoint rule is exact
to ~1e-3 here), and compare with the NUTS estimate and the rejection
ground truth.  Separates "the sampler doesn't mix" from "the surrogate fit
itself is off" — only the former is fixable in the sampler.

Usage: python scripts/bolfi_exact_posterior.py [seeds...]
"""

import sys
import time

import numpy as np

from bolfi_ricker_accuracy import build_model


def exact_means(posterior, bounds, n=96, chunk=1 << 15):
    import jax
    import jax.numpy as jnp

    axes = [np.linspace(lo, hi, n + 1)[:-1] + (hi - lo) / (2 * n)
            for lo, hi in bounds]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    grid = jnp.asarray(grid, jnp.float32)
    target, (data,) = posterior.traceable_logpdf_args()

    @jax.jit
    def lp_chunk(x, data):
        return jax.vmap(lambda t: target(t, data))(x)

    lps = np.concatenate([
        np.asarray(lp_chunk(grid[i:i + chunk], data))
        for i in range(0, grid.shape[0], chunk)])
    lps -= lps.max()
    w = np.exp(lps)
    w /= w.sum()
    g = np.asarray(grid)
    mean = w @ g
    sd = np.sqrt(w @ (g - mean) ** 2)
    return mean, sd


def main():
    import elfi_tpu as elfi

    seeds = [int(s) for s in sys.argv[1:]] or [1, 2, 3, 4]
    m = build_model()

    t0 = time.perf_counter()
    gt = elfi.Rejection(m["d"], batch_size=1 << 14, seed=9).sample(
        2000, n_sim=1 << 22, bar=False)
    gt_means = np.array([float(np.mean(gt.samples[k]))
                         for k in ("t1", "t2", "t3")])
    gt_sds = np.array([float(np.std(gt.samples[k]))
                       for k in ("t1", "t2", "t3")])
    print(f"ground truth 2^22 ({time.perf_counter() - t0:.1f}s): "
          f"means={np.round(gt_means, 3)} sds={np.round(gt_sds, 3)}",
          flush=True)

    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}
    bounds = [(3, 5), (0.05, 0.8), (4, 16)]
    for seed in seeds:
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                           update_interval=20,
                           bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                                   "t3": (4, 16)},
                           acq_noise_var=noise, seed=seed)
        bolfi.fit(n_evidence=500, bar=False)
        pos = bolfi.extract_posterior()
        t0 = time.perf_counter()
        mean, sd = exact_means(pos, bounds)
        qs = time.perf_counter() - t0
        res = bolfi.sample(1000, n_chains=4, bar=False)
        nuts_mean = np.array([float(np.ravel(res.sample_means[k])[0])
                              for k in ("t1", "t2", "t3")])
        dev_exact = np.abs(mean - gt_means) / gt_sds
        dev_nuts = np.abs(nuts_mean - gt_means) / gt_sds
        mix_gap = np.abs(nuts_mean - mean) / sd
        print(f"seed={seed} exact ({qs:.1f}s): mean={np.round(mean, 3)} "
              f"sd={np.round(sd, 3)} dev_sd={np.round(dev_exact, 2)} "
              f"{'OK' if dev_exact.max() < 2 else 'FAIL'}", flush=True)
        print(f"        nuts:  mean={np.round(nuts_mean, 3)} "
              f"dev_sd={np.round(dev_nuts, 2)} "
              f"{'OK' if dev_nuts.max() < 2 else 'FAIL'} "
              f"sampler_gap_in_surrogate_sd={np.round(mix_gap, 2)}",
              flush=True)


if __name__ == "__main__":
    main()
