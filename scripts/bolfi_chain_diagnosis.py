"""Diagnose BOLFI NUTS chain health on the bench Ricker problem: for each
seed, fit once, then print PER-CHAIN post-warmup means/stds and acceptance
proxies.  Distinguishes frozen chains (within-chain std ~ 0) from separated
surrogate modes (healthy within-chain std, different means).

Usage: python scripts/bolfi_chain_diagnosis.py [seeds...]
"""

import sys

import numpy as np

from bolfi_ricker_accuracy import build_model


def main():
    import elfi_tpu as elfi

    seeds = [int(s) for s in sys.argv[1:]] or [2, 4]
    m = build_model()
    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}
    for seed in seeds:
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                           update_interval=20,
                           bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                                   "t3": (4, 16)},
                           acq_noise_var=noise, seed=seed)
        bolfi.fit(n_evidence=500, bar=False)
        res = bolfi.sample(1000, n_chains=4, bar=False)
        ch = res.chains  # (n_chains, n_iter, d)
        post = ch[:, 500:, :]
        p = bolfi.target_model.parameter_names
        print(f"== seed {seed}  threshold={res.threshold:.4f}")
        pos = bolfi.extract_posterior()
        for c in range(post.shape[0]):
            mo = post[c]
            moves = float(np.mean(np.any(np.diff(mo, axis=0) != 0, axis=1)))
            lp0 = pos.logpdf(np.asarray(mo[0], np.float32))
            lpm = pos.logpdf(np.asarray(mo.mean(0), np.float32))
            print(f"  chain{c}: mean={dict(zip(p, np.round(mo.mean(0), 3)))} "
                  f"std={dict(zip(p, np.round(mo.std(0), 4)))} "
                  f"move_frac={moves:.3f} lp(first)={lp0:.2f} "
                  f"lp(mean)={lpm:.2f}", flush=True)


if __name__ == "__main__":
    main()
