"""Decompose the generic-XLA-path fused-rejection iteration cost (MA2).

VERDICT r04 item 6: the non-Pallas path runs ~244M sims/s at its 2^17
sweet spot vs the Pallas kernel's ~370M — find where the 1.5x goes.
Each stage is timed as ONE jitted scan of `iters` iterations whose carry
consumes every output (per CLAUDE.md, standalone microbenches on this
box are unreliable; everything stays inside the real loop's structure):

  rng     normals (batch, n_obs+2) reduced into the carry
  sim     + the MA2 shifted-add series
  summ    + both autocovariance summaries
  dist    + euclidean distance to observed  (= the model's d node)
  prog    the compiled program's (d, t1, t2) outputs reduced
  flat    prog + merge_core        (the real no-threshold merge)
  e2e     the real Rejection._run_fused whole_fn path

Usage: python scripts/xla_rej_profile.py [log2_batch ...]   (default 17)
"""

import sys
import time

import numpy as np


def main():
    from elfi_tpu.utils import setup_performance_cache
    setup_performance_cache(".jax_cache")
    import jax
    import jax.numpy as jnp

    import elfi_tpu as elfi
    from elfi_tpu.compile.compiler import compile_program
    from elfi_tpu.models import ma2
    from elfi_tpu.ops import topk

    jax.config.update("jax_default_prng_impl", "rbg")
    n = 5000
    m = ma2.get_model(seed_obs=271)
    y = np.asarray(m["MA2"].observed)
    s1_obs = jnp.float32(np.mean(y[1:] * y[:-1]))
    s2_obs = jnp.float32(np.mean(y[2:] * y[:-2]))

    for lb in [int(a) for a in sys.argv[1:]] or [17]:
        batch = 1 << lb
        iters = max(1, (1 << 28) // batch)
        n_obs = 100
        prog = compile_program(m, ("d", "t1", "t2"))
        fn = prog.traceable(batch)
        idx = jnp.arange(iters, dtype=jnp.uint32)
        print(f"== batch 2^{lb} ({batch}), {iters} iters ==", flush=True)

        def timed(name, jitted, *args):
            jitted(*args)  # compile + warm
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(jitted(*args))
                walls.append(time.perf_counter() - t0)
            best = min(walls)
            print(f"{name:8s} {best / iters * 1e3:7.3f} ms/iter "
                  f"sims/s={batch * iters / best / 1e6:7.1f}M "
                  f"walls={[round(w, 3) for w in walls]}", flush=True)

        def scan_of(body):
            @jax.jit
            def run(seed):
                key = jax.random.key(seed)

                def step(c, i):
                    k = jax.random.fold_in(key, i)
                    return c + body(k), None

                c, _ = jax.lax.scan(step, jnp.float32(0), idx)
                return c
            return run

        def draw(k):
            kt, kw = jax.random.split(k)
            t1 = jax.random.uniform(kt, (batch,), minval=0., maxval=1.)
            t2 = jax.random.uniform(kt, (batch,), minval=0., maxval=1.)
            w = jax.random.normal(kw, (batch, n_obs + 2))
            return t1, t2, w

        def rng(k):
            t1, t2, w = draw(k)
            return jnp.sum(w[:, 0]) + jnp.sum(t1) + jnp.sum(t2)

        def sim(k):
            t1, t2, w = draw(k)
            x = w[:, 2:] + t1[:, None] * w[:, 1:-1] + t2[:, None] * w[:, :-2]
            return jnp.sum(x[:, 0])

        def summ(k):
            t1, t2, w = draw(k)
            x = w[:, 2:] + t1[:, None] * w[:, 1:-1] + t2[:, None] * w[:, :-2]
            s1 = jnp.mean(x[:, 1:] * x[:, :-1], axis=1)
            s2 = jnp.mean(x[:, 2:] * x[:, :-2], axis=1)
            return jnp.sum(s1) + jnp.sum(s2)

        def dist(k):
            t1, t2, w = draw(k)
            x = w[:, 2:] + t1[:, None] * w[:, 1:-1] + t2[:, None] * w[:, :-2]
            s1 = jnp.mean(x[:, 1:] * x[:, :-1], axis=1)
            s2 = jnp.mean(x[:, 2:] * x[:, :-2], axis=1)
            d = jnp.sqrt((s1 - s1_obs) ** 2 + (s2 - s2_obs) ** 2)
            return jnp.sum(d)

        timed("rng", scan_of(rng), jnp.uint32(1))
        timed("sim", scan_of(sim), jnp.uint32(1))
        timed("summ", scan_of(summ), jnp.uint32(1))
        timed("dist", scan_of(dist), jnp.uint32(1))

        @jax.jit
        def prog_only(seed):
            key = jax.random.key(seed)

            def step(c, i):
                out = fn(key, i, {})
                return c + jnp.sum(out["d"]) + jnp.sum(out["t1"]), None

            c, _ = jax.lax.scan(step, jnp.float32(0), idx)
            return c

        timed("prog", prog_only, jnp.uint32(1))

        @jax.jit
        def flat(seed):
            key = jax.random.key(seed)
            bufs = {"d": jnp.full((n,), jnp.inf, jnp.float32),
                    "t1": jnp.zeros((n,), jnp.float32),
                    "t2": jnp.zeros((n,), jnp.float32),
                    "__key": jnp.full((n,), jnp.inf, jnp.float32)}

            def step(b, i):
                out = fn(key, i, {})
                return topk.merge_core(b, out, jnp.inf, "d")

            bufs, _ = jax.lax.scan(step, bufs, idx)
            return bufs["d"]

        timed("flat", flat, jnp.uint32(1))

        rej = elfi.Rejection(m["d"], batch_size=batch, seed=1)
        rej.sample(n, n_sim=batch * iters, bar=False)
        walls = []
        for _ in range(3):
            rej = elfi.Rejection(m["d"], batch_size=batch, seed=1)
            t0 = time.perf_counter()
            rej.sample(n, n_sim=batch * iters, bar=False)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        print(f"{'e2e':8s} {best / iters * 1e3:7.3f} ms/iter "
              f"sims/s={batch * iters / best / 1e6:7.1f}M "
              f"walls={[round(w, 3) for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
