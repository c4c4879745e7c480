"""Decompose the BOLFI surrogate's t1 bias at the MA2 test budget.

The 6-seed study (2026-08-19) put the sampled t1 mean at 0.46-0.51 on
every seed vs the true rejection-posterior mean 0.593 (gate widened to
0.15 to absorb it).  This script separates the suspects by integrating
the fitted surrogate's posterior on a dense grid (no NUTS in the loop)
under controlled variants:

  grid      prior * Phi((h - mu)/sigma)   -- the BolfiPosterior target
  fixsigma  prior * Phi((h - mu)/s0)      -- sigma variation removed
            (s0 = median GP sd over the grid): isolates the
            uncertainty-leak mechanism (mass flowing to high-sigma
            regions where Phi((h-mu)/sigma) decays slowly)
  meanonly  prior * exp(-beta * mu)       -- GP-mean landscape only
  nuts      the shipped sampler            -- faithfulness check vs grid

Usage: python scripts/bolfi_t1_bias.py [n_evidence] [seed ...]
"""

import sys

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import elfi_tpu as elfi  # noqa: E402
from elfi_tpu.models import ma2  # noqa: E402

TRUE = np.array([0.593, 0.215])  # calibrated rejection-posterior mean


def _grid(n1=201, n2=101):
    t1 = np.linspace(-2, 2, n1)
    t2 = np.linspace(-1, 1, n2)
    g = np.stack(np.meshgrid(t1, t2, indexing="ij"), -1).reshape(-1, 2)
    return g.astype(np.float32)


def _mean_under(logw, grid):
    w = np.exp(logw - np.nanmax(logw))
    w = np.where(np.isfinite(w), w, 0.0)
    return (grid * w[:, None]).sum(0) / w.sum()


def run(seed, n_evidence, acq="bo", log=True, eps=0.0):
    m = ma2.get_model(seed_obs=271)
    target = "d"
    if log:
        elfi.Operation(jnp.log, m["d"], model=m, name="log_d")
        target = "log_d"
    kw = {}
    if acq == "uniform":
        # evidence-design A/B: same budget, no BO — if the GP-mean bias
        # persists, it is intrinsic GP smoothing of the landscape, not
        # LCBSC exploration placement
        from elfi_tpu.methods.bo.acquisition import UniformAcquisition
        from elfi_tpu.methods.bo.gp import GPRegression

        gp = GPRegression(["t1", "t2"], bounds={"t1": (-2, 2),
                                                "t2": (-1, 1)})
        kw = {"target_model": gp,
              "acquisition_method": UniformAcquisition(gp, seed=seed)}
    bolfi = elfi.BOLFI(m[target], batch_size=1, initial_evidence=24,
                       update_interval=12,
                       bounds={"t1": (-2, 2), "t2": (-1, 1)},
                       acq_noise_var=0.1, acq_epsilon=eps, seed=seed, **kw)
    bolfi.fit(n_evidence=n_evidence, bar=False)
    post = bolfi.extract_posterior()
    gp = bolfi.target_model

    grid = _grid()
    prior_lp = post.prior.logpdf(grid)
    prior_lp = np.where(np.isfinite(prior_lp), prior_lp, -np.inf)
    mu, var = gp.predict(grid)
    mu = np.ravel(mu)
    sd = np.sqrt(np.ravel(var))
    h = post.threshold
    from scipy.stats import norm

    variants = {
        "grid": prior_lp + norm.logcdf((h - mu) / sd),
        "fixsigma": prior_lp + norm.logcdf((h - mu) / np.median(sd)),
        "meanonly": prior_lp - mu,
    }
    out = {name: _mean_under(lw, grid) for name, lw in variants.items()}
    res = bolfi.sample(1200, n_chains=4, bar=False)
    out["nuts"] = np.array([float(np.mean(res.samples[k]))
                            for k in ("t1", "t2")])
    print(f"seed={seed} h={h:.3f} sd: min={sd.min():.3f} "
          f"med={np.median(sd):.3f} max={sd.max():.3f}")
    for name, mean in out.items():
        err = mean - TRUE
        print(f"  {name:9s} mean=({mean[0]:+.3f}, {mean[1]:+.3f}) "
              f"err=({err[0]:+.3f}, {err[1]:+.3f})", flush=True)
    # where does the default posterior put mass that fixsigma does not?
    dw = variants["grid"] - variants["fixsigma"]
    dw = dw[np.isfinite(dw)]
    return out


def main():
    argv = list(sys.argv[1:])
    eps = 0.0
    if "--eps" in argv:
        i = argv.index("--eps")
        eps = float(argv[i + 1])
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    acq = "uniform" if "--uniform" in argv else "bo"
    log = "--linear" not in argv
    n_evidence = int(args[0]) if args else 120
    seeds = [int(s) for s in args[1:]] or [3]
    print(f"acq={acq} log={log} eps={eps} n_evidence={n_evidence}")
    for seed in seeds:
        run(seed, n_evidence, acq=acq, log=log, eps=eps)


if __name__ == "__main__":
    main()
