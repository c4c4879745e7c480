"""Pallas TPU kernels for the hottest ABC ops.

``ma2_distance`` fuses the full MA2 pipeline — white-noise generation,
the MA(2) filter, both autocovariance summaries and the euclidean distance
— into one kernel.  The XLA path materialises the (batch, n_obs+2) noise
and (batch, n_obs) series in HBM (~2.8 KB of traffic per simulation); the
kernel keeps everything in VMEM and writes only the distance (4 B/sim), so
throughput is compute/RNG-bound instead of HBM-bound.

Noise comes from the per-core PRNG (`pltpu.prng_random_bits`) via
Box-Muller, seeded per batch tile as ``fold(seed, program_id)`` — runs are
deterministic per (seed, batch_index) exactly like the XLA path, though the
streams differ from ``jax.random`` (documented; rejection results are
statistically equivalent, not bitwise).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ma2_distance", "on_tpu"]

_TILE = 512          # batch elements (lanes) per row
_GROUP = 8           # rows per kernel instance (sublane tiling quantum)
_ROWS = 128          # time rows; must cover n_obs + 2 (default n_obs=100)
_BLOCK = _TILE * _GROUP


def on_tpu():
    return jax.default_backend() in ("tpu", "axon") or \
        jax.devices()[0].platform in ("tpu", "axon")


def _ma2_kernel(seed_ref, obs_ref, t1_ref, t2_ref, d_ref, *, n_obs):
    """Layout: batch on lanes, time on sublanes — the MA(2) shifts become
    sublane slices and no transposes are needed.  Each instance processes
    _GROUP rows of _TILE batch elements (sublane tiling quantum)."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * 1000003)
    half = (n_obs + 2 + 1) // 2                     # row pairs actually used

    def normals():
        b1 = pltpu.prng_random_bits((half, _TILE))
        b2 = pltpu.prng_random_bits((half, _TILE))
        # 23 low bits -> non-negative int32 -> uniforms in (0, 1)
        mask = jnp.int32(0x7FFFFF)
        u1 = (b1 & mask).astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-7
        u2 = (b2 & mask).astype(jnp.float32) * (1.0 / (1 << 23))
        # both Box-Muller branches: 2 normals per (log, sqrt, sin+cos) set
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        a = 2.0 * jnp.pi * u2
        return jnp.concatenate([r * jnp.cos(a), r * jnp.sin(a)], axis=0)

    for r in range(_GROUP):
        w = normals()                               # (2*half, TILE)
        t1 = t1_ref[r:r + 1, :]                     # (1, TILE)
        t2 = t2_ref[r:r + 1, :]
        # x_j = w_{j+2} + t1 w_{j+1} + t2 w_j, j = 0..n_obs-1
        x = (w[2:n_obs + 2, :] + t1 * w[1:n_obs + 1, :]
             + t2 * w[:n_obs, :])
        s1 = jnp.mean(x[1:, :] * x[:-1, :], axis=0, keepdims=True)
        s2 = jnp.mean(x[2:, :] * x[:-2, :], axis=0, keepdims=True)
        d_ref[r:r + 1, :] = jnp.sqrt((s1 - obs_ref[0]) ** 2
                                     + (s2 - obs_ref[1]) ** 2)


def _ma2_distance_call(seed, obs, t1, t2, batch_size, n_obs, interpret):
    grid = batch_size // _BLOCK
    kernel = partial(_ma2_kernel, n_obs=n_obs)
    t1 = t1.reshape(grid * _GROUP, _TILE)
    t2 = t2.reshape(grid * _GROUP, _TILE)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_GROUP, _TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_GROUP, _TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_GROUP, _TILE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * _GROUP, _TILE), jnp.float32),
        interpret=interpret,
    )(seed, obs, t1, t2)
    return out.reshape(batch_size)


def ma2_distance(t1, t2, observed_autocovs, n_obs=100, batch_size=1,
                 key=None, interpret=None):
    """Fused MA2 simulate+summarise+distance; returns (batch,) distances.

    Fully traceable (embeds in the fused rejection scan).
    ``observed_autocovs``: (2,) array of the observed (lag-1, lag-2)
    autocovariances.  ``batch_size`` must be a multiple of 4096.
    """
    if batch_size % _BLOCK:
        raise ValueError(f"batch_size must be a multiple of {_BLOCK}")
    if n_obs + 2 > _ROWS:
        raise ValueError(f"n_obs must be <= {_ROWS - 2}")
    if interpret is None:
        interpret = not on_tpu()
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    t1 = jnp.broadcast_to(jnp.asarray(t1, jnp.float32).reshape(-1),
                          (batch_size,))
    t2 = jnp.broadcast_to(jnp.asarray(t2, jnp.float32).reshape(-1),
                          (batch_size,))
    obs = jnp.asarray(observed_autocovs, jnp.float32)
    return _ma2_distance_call(seed, obs, t1, t2, batch_size, n_obs,
                              interpret)
