"""Decompose the fused-rejection iteration cost at batch 2^20.

The raw Pallas noise+sim+distance pipeline is much faster standalone than
the 337M sims/s end-to-end loop suggests; this times, as ONE jitted scan
of 256 iterations each (so per-iteration dispatch cost is amortized and
XLA cannot DCE the body — the carry consumes every output):

  sim        program outputs reduced into the carry, no merge
  flat       sim + merge_core
  culled:SK  sim + merge_core_culled(small_k=SK)
  e2e        the real Rejection._run_fused whole_fn path

Per CLAUDE.md, standalone microbenches on this box are unreliable; this
script keeps everything inside the same scan structure as the real loop
precisely so the numbers are comparable to each other.
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
    from elfi_tpu.models import ma2_pallas
    from elfi_tpu.ops import topk

    jax.config.update("jax_default_prng_impl", "rbg")
    batch = 1 << 20
    iters = 256
    n = 5000
    m = ma2_pallas.get_model(seed_obs=271)
    prog = compile_program(m, ("d", "t1", "t2"))
    fn = prog.traceable(batch)

    def timed(name, jitted, *args):
        jitted(*args)  # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(*args))
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        print(f"{name:12s} {best / iters * 1e3:7.3f} ms/iter "
              f"sims/s={batch * iters / best / 1e6:7.1f}M "
              f"walls={[round(w, 3) for w in walls]}", flush=True)

    idx = jnp.arange(iters, dtype=jnp.uint32)

    @jax.jit
    def sim_only(seed):
        key = jax.random.key(seed)

        def step(c, i):
            out = fn(key, i, {})
            return c + jnp.sum(out["d"]) + jnp.sum(out["t1"]), None

        c, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return c

    timed("sim", sim_only, jnp.uint32(1))

    def make_merge_variant(merger):
        @jax.jit
        def run(seed):
            key = jax.random.key(seed)
            bufs = {"d": jnp.full((n,), jnp.inf, jnp.float32),
                    "t1": jnp.zeros((n,), jnp.float32),
                    "t2": jnp.zeros((n,), jnp.float32),
                    "__key": jnp.full((n,), jnp.inf, jnp.float32)}

            def step(b, i):
                out = fn(key, i, {})
                return merger(b, out)

            bufs, _ = jax.lax.scan(step, bufs, idx)
            return bufs["d"]

        return run

    timed("flat", make_merge_variant(
        lambda b, out: topk.merge_core(b, out, jnp.inf, "d")),
        jnp.uint32(1))
    for sk in [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192, 16384]:
        timed(f"culled:{sk}", make_merge_variant(
            lambda b, out, sk=sk: topk.merge_core_culled(
                b, out, jnp.inf, "d", small_k=sk)),
            jnp.uint32(1))

    # the real end-to-end path (includes threshold plumbing + __start)
    for sk in [1024, 4096]:
        topk.CULL_SMALL_K = sk
        rej = elfi.Rejection(m["d"], batch_size=batch, seed=1)
        rej.sample(n, n_sim=batch * iters, bar=False)
        walls = []
        for _ in range(3):
            rej = elfi.Rejection(m["d"], batch_size=batch, seed=1)
            t0 = time.perf_counter()
            rej.sample(n, n_sim=batch * iters, bar=False)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        print(f"e2e:{sk:6d} {best / iters * 1e3:7.3f} ms/iter "
              f"sims/s={batch * iters / best / 1e6:7.1f}M "
              f"walls={[round(w, 3) for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
