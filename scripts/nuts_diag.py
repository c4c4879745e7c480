"""Diagnose the BOLFI NUTS sample-phase wall-time spread across seeds.

Fits BOLFI-Ricker at the bench operating point for one seed, then runs an
instrumented copy of the NUTS chain that records per-iteration leapfrog
counts and the adapted stepsize, plus a raw grad-eval latency microbench.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/nuts_diag.py [seed]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def instrumented_chain(key, x0, target, n_iter, n_adapt, target_prob,
                       max_depth, stepsize0):
    from elfi_tpu.methods.mcmc import _find_stepsize, _nuts_iteration

    grad = jax.grad(target)
    key, kf = jax.random.split(key)
    step0 = jnp.where(stepsize0 > 0, stepsize0,
                      _find_stepsize(kf, target, grad, x0))

    mu = jnp.log(10.0 * step0)
    shrinkage, ii_offset, discount = 0.05, 10.0, -0.75

    def scan_body(carry, ii):
        x, step, log_avg_step, accept_ratio, key = carry
        key, kit = jax.random.split(key)
        x, astat = _nuts_iteration(kit, target, grad, x, step, max_depth)
        in_adapt = ii <= n_adapt
        ar = (1.0 - 1.0 / (ii + ii_offset)) * accept_ratio + \
            (target_prob - astat) / (ii + ii_offset)
        log_step = mu - jnp.sqrt(ii) / shrinkage * ar
        las = ii ** discount * log_step + (1.0 - ii ** discount) * log_avg_step
        step = jnp.where(in_adapt, jnp.exp(log_step),
                         jnp.where(ii == n_adapt + 1, jnp.exp(log_avg_step),
                                   step))
        accept_ratio = jnp.where(in_adapt, ar, accept_ratio)
        log_avg_step = jnp.where(in_adapt, las, log_avg_step)
        return (x, step, log_avg_step, accept_ratio, key), (x, step, astat)

    iis = jnp.arange(1, n_iter + 1, dtype=jnp.float32)
    (_, step_f, _, _, _), (xs, steps, astats) = jax.lax.scan(
        scan_body, (x0, step0, jnp.float32(0.0), jnp.float32(0.0), key), iis)
    return xs, steps, astats, step0


def main():
    import elfi_tpu as elfi
    from elfi_tpu.utils import setup_performance_cache
    from elfi_tpu.models.ricker import (chi_squared, num_zeros,
                                        stochastic_ricker)

    setup_performance_cache(".jax_cache")
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    sim = partial(stochastic_ricker, n_obs=50)
    y_obs = np.asarray(sim(jnp.asarray([3.8]), jnp.asarray([0.3]),
                           jnp.asarray([10.0]), batch_size=1,
                           key=jax.random.key(4)))[0]
    m = elfi.Model(name="ricker_diag")
    elfi.Prior("uniform", 3, 2, model=m, name="t1")
    elfi.Prior("uniform", 0.05, 0.75, model=m, name="t2")
    elfi.Prior("uniform", 4, 12, model=m, name="t3")
    elfi.Simulator(sim, m["t1"], m["t2"], m["t3"], observed=y_obs, model=m,
                   name="Ricker")
    elfi.Summary(lambda x: jnp.mean(x, axis=1), m["Ricker"], model=m,
                 name="Mean")
    elfi.Summary(lambda x: jnp.var(x, axis=1), m["Ricker"], model=m,
                 name="Var")
    elfi.Summary(num_zeros, m["Ricker"], model=m, name="n0")
    elfi.Discrepancy(chi_squared, m["Mean"], m["Var"], m["n0"], model=m,
                     name="d")
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d")

    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}
    bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                       update_interval=20,
                       bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                               "t3": (4, 16)},
                       acq_noise_var=noise, seed=seed)
    t0 = time.perf_counter()
    bolfi.fit(n_evidence=500, bar=False)
    print(f"fit: {time.perf_counter() - t0:.2f}s", flush=True)

    posterior = bolfi.extract_posterior(None)
    target = posterior.traceable_logpdf()

    candidates = np.asarray(bolfi.target_model.X)
    lps = posterior.logpdf(candidates)
    ok = np.isfinite(lps)
    candidates, lps = candidates[ok], lps[ok]
    initials = candidates[np.argsort(-lps)][:4]

    # grad-eval latency microbench: 1000 sequential leapfrog-like evals
    grad = jax.grad(target)

    @jax.jit
    def grad_chain(x0, n):
        def body(x, _):
            g = grad(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            return x + 1e-6 * g, None
        x, _ = jax.lax.scan(body, x0, None, length=1000)
        return x

    x0 = jnp.asarray(initials[0], jnp.float32)
    grad_chain(x0, None).block_until_ready()
    t0 = time.perf_counter()
    grad_chain(x0, None).block_until_ready()
    per_eval_us = (time.perf_counter() - t0) / 1000 * 1e6
    print(f"grad eval latency: {per_eval_us:.1f} us "
          f"(leapfrog = 2 evals -> {2 * per_eval_us:.0f} us)", flush=True)

    runner = jax.jit(jax.vmap(lambda k, x: instrumented_chain(
        k, x, target, 1000, 500, 0.6, 5, jnp.float32(0.0))))
    keys = jax.random.split(jax.random.key(seed), 4)
    x0s = jnp.asarray(initials, jnp.float32)
    runner(keys, x0s)[1].block_until_ready()      # compile
    t0 = time.perf_counter()
    xs, steps, astats, step0 = runner(keys, x0s)
    xs.block_until_ready()
    wall = time.perf_counter() - t0
    steps = np.asarray(steps)
    astats = np.asarray(astats)
    step0 = np.asarray(step0)
    print(f"sample wall (instrumented, warm): {wall:.2f}s", flush=True)
    for c in range(4):
        s = steps[c]
        print(f"chain {c}: step0={step0[c]:.4g} "
              f"adapted_step={s[-1]:.4g} "
              f"step[min,med,max]=({s.min():.3g},{np.median(s):.3g},"
              f"{s.max():.3g}) "
              f"astat[mean]={astats[c].mean():.3f} "
              f"post-warmup step med={np.median(s[500:]):.4g}")
    means = np.asarray(xs)[:, 500:, :].reshape(-1, 3).mean(0)
    print(f"posterior means: {np.round(means, 3)}")


if __name__ == "__main__":
    main()
