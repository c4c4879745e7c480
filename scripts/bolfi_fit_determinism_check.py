"""Guard for the spec-memoized fused-BO factory: a seed-1 fit must be
bit-identical whether or not another BOLFI instance (different seed) ran
first in the same process.  Prints evidence checksums.

Usage: python scripts/bolfi_fit_determinism_check.py [warm_seed_first]
"""

import hashlib
import sys

import numpy as np

from bolfi_ricker_accuracy import build_model


def fit_digest(m, seed):
    import elfi_tpu as elfi

    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}
    bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                       update_interval=20,
                       bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                               "t3": (4, 16)},
                       acq_noise_var=noise, seed=seed)
    bolfi.fit(n_evidence=500, bar=False)
    X = np.asarray(bolfi.target_model.X, np.float32)
    Y = np.asarray(bolfi.target_model.Y, np.float32)
    return (hashlib.sha256(X.tobytes()).hexdigest()[:16],
            hashlib.sha256(Y.tobytes()).hexdigest()[:16], X.shape)


def main():
    m = build_model()
    if len(sys.argv) > 1 and sys.argv[1] == "warm":
        print("warming with seed 2 first", flush=True)
        fit_digest(m, 2)
    print("seed1", fit_digest(m, 1), flush=True)


if __name__ == "__main__":
    main()
