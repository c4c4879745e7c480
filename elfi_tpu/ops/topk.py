"""Device-side running top-N selection for rejection sampling.

The reference maintains its sorted sample buffer with host-side
``np.argsort`` per batch (``elfi/methods/inference/samplers.py:209-237``).
Here the buffer lives on device and each batch is merged with one
``lax.top_k`` over the concatenation — this is the op that keeps the
rejection hot loop free of host transfers (SURVEY.md §7 "where the 100x
sims/s target is won or lost")."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sort_key", "accept_mask", "make_merge_fn", "init_buffers"]


def sort_key(d):
    """Scalar sorting distance per batch member; for nested/adaptive
    distances (2-D output) the LAST measure is active (reference
    ``samplers.py:233-234``)."""
    d = jnp.asarray(d)
    return d if d.ndim == 1 else d[..., -1]


def accept_mask(d, threshold):
    """Acceptance: every distance column within threshold (reference
    ``samplers.py:223-224``)."""
    d = jnp.asarray(d)
    ok = d <= threshold
    return ok if ok.ndim == 1 else jnp.all(ok, axis=tuple(range(1, ok.ndim)))


def init_buffers(n, batch_like, discrepancy_name):
    """Allocate top-N buffers matching a batch's shapes/dtypes; distances
    start at +inf (reference ``samplers.py:177-207``)."""
    buffers = {}
    for k, v in batch_like.items():
        v = jnp.asarray(v)
        shape = (n,) + v.shape[1:]
        if k == discrepancy_name:
            buffers[k] = jnp.full(shape, jnp.inf, dtype=jnp.float32)
        else:
            buffers[k] = jnp.zeros(shape, dtype=v.dtype)
    buffers["__key"] = jnp.full((n,), jnp.inf, dtype=jnp.float32)
    return buffers


def merge_core(buffers, batch, threshold, discrepancy_name):
    """Top-N merge: (buffers, batch, threshold) -> (buffers', n_accepted).

    Keeps the N smallest effective distances across everything seen so far.
    Rejected rows (above threshold) get +inf keys, so they can never enter
    the buffer — equivalent to the reference's accept-then-sort but exact
    top-N and fully on device.  Plain traceable function so it can be
    embedded in a ``lax.scan`` (fused rejection) or jitted standalone.
    """
    d = jnp.asarray(batch[discrepancy_name])
    keys_new = jnp.asarray(sort_key(d), jnp.float32)
    ok = accept_mask(d, threshold)
    keys_eff = jnp.where(ok, keys_new, jnp.inf)
    n = buffers["__key"].shape[0]
    cat = jnp.concatenate([buffers["__key"], keys_eff])
    neg_top, idx = jax.lax.top_k(-cat, n)
    out = {"__key": -neg_top}
    for k in batch:
        merged = jnp.concatenate(
            [buffers[k], jnp.asarray(batch[k]).astype(buffers[k].dtype)])
        out[k] = jnp.take(merged, idx, axis=0)
    return out, jnp.sum(ok)


def make_merge_fn(discrepancy_name):
    """Jitted standalone merge for the batch-at-a-time path."""
    import functools
    return jax.jit(functools.partial(merge_core,
                                     discrepancy_name=discrepancy_name))
