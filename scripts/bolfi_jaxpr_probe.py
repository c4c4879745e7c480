"""Dump the lowered StableHLO of the fused-BO segment program for a fixed
spec, to prove refactors of `_fused_bo_programs` leave the program
byte-identical (the factory docstring explains why jaxpr identity is
load-bearing: byte-different programs re-rolled the chaotic BO
trajectories on TPU and collapsed a validated Ricker seed).

Usage: JAX_PLATFORMS=cpu python scripts/bolfi_jaxpr_probe.py out.txt
"""

import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from elfi_tpu.compile.compiler import compile_program  # noqa: E402
from elfi_tpu.methods.bolfi import (_FusedBOSpec,  # noqa: E402
                                    _fused_bo_programs)
from elfi_tpu.models import ma2  # noqa: E402


def main(out_path):
    m = ma2.get_model(seed_obs=4)
    prog_prior = compile_program(m, ("d", "t1", "t2"))
    init_fn = prog_prior.traceable(batch_size=8)
    prog_sim = compile_program(m, ("d",), override_names=("t1", "t2"))
    sim_fn = prog_sim.traceable(batch_size=1)
    spec = _FusedBOSpec(cap=32, d=2, n_init=8, n_restarts=5,
                        n_inits_acq=10, rng_off=1000, pnames=("t1", "t2"),
                        target_name="d", lo=(0.0, 0.0), hi=(2.0, 1.0),
                        noise_std=(0.1, 0.1), gp_scales=(0.5, 1.0),
                        epsilon=0.05)
    init_jit, segment_jit, refit_jit = _fused_bo_programs(
        spec, init_fn, sim_fn)
    master = jax.random.key(0)
    Xc = jnp.zeros((32, 2), jnp.float32)
    yc = jnp.zeros((32,), jnp.float32)
    u = jnp.zeros((4,), jnp.float32)
    n = jnp.int32(8)
    ts = jnp.arange(0, 4, dtype=jnp.int32)
    betas = jnp.ones((4,), jnp.float32)
    parts = [segment_jit.lower(master, Xc, yc, u, n, ts, betas).as_text(),
             init_jit.lower(master).as_text(),
             refit_jit.lower(master, Xc, yc, u,
                             jnp.zeros((4,), jnp.float32), n,
                             jnp.int32(3)).as_text()]
    with open(out_path, "w") as f:
        f.write("\n\n=====\n\n".join(parts))
    print(f"wrote {out_path} ({sum(len(p) for p in parts)} chars)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bolfi_lowered.txt")
