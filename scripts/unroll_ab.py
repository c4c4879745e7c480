"""End-to-end A/B of the fused-rejection merge unroll (VERDICT r04 #6).

scripts/xla_rej_profile.py showed the per-batch top-N merge costs as much
as the whole compiled MA2 program at batch 2^17 (0.222 of 0.448 ms/iter),
while a flat 529k->5000 top_k costs the same ~0.23 ms as 136k->5000 —
i.e. the merge is a near-fixed cost that unrolling u program calls into
one merge should amortize u-fold.  Per CLAUDE.md, only end-to-end
fused-loop A/Bs are trustworthy on this box, so each configuration runs
the REAL ``Rejection.sample`` path and bit-compares outputs across u.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/unroll_ab.py
"""

import time

import numpy as np


def main():
    from elfi_tpu.utils import setup_performance_cache
    setup_performance_cache(".jax_cache")
    import jax

    import elfi_tpu as elfi
    from elfi_tpu.methods import samplers
    from elfi_tpu.models import ma2, ma2_pallas

    m = ma2.get_model(seed_obs=271)
    mp = ma2_pallas.get_model(seed_obs=271)
    jax.config.update("jax_default_prng_impl", "rbg")
    n = 5000
    n_sim = 1 << 28

    cases = [("xla 2^17", m, 1 << 17, (1, 2, 4, 8, 16)),
             ("xla 2^18", m, 1 << 18, (1, 2, 4, 8)),
             ("pallas 2^20", mp, 1 << 20, (1, 2, 4)),
             ("pallas 2^21", mp, 1 << 21, (1, 2))]
    for name, model, batch, factors in cases:
        ref_d = None
        for u in factors:
            samplers.FUSED_UNROLL = u
            elfi.Rejection(model["d"], batch_size=batch, seed=1).sample(
                n, n_sim=n_sim, bar=False)        # compile + warm
            walls = []
            for _ in range(3):
                rej = elfi.Rejection(model["d"], batch_size=batch, seed=1)
                t0 = time.perf_counter()
                res = rej.sample(n, n_sim=n_sim, bar=False)
                walls.append(time.perf_counter() - t0)
            d = np.asarray(res.outputs["d"])
            if ref_d is None:
                ref_d = d
            parity = "bit-identical" if np.array_equal(ref_d, d) \
                else "MISMATCH"
            best = min(walls)
            print(f"{name:12s} u={u:2d} {n_sim / best / 1e6:7.1f} M sims/s "
                  f"walls={[round(w, 3) for w in walls]} {parity}",
                  flush=True)
    samplers.FUSED_UNROLL = None


if __name__ == "__main__":
    main()
