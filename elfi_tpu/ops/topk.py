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

__all__ = ["sort_key", "accept_mask", "make_merge_fn", "init_buffers",
           "merge_core", "merge_core_culled", "merge_scan"]


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


def merge_core_culled(buffers, batch, threshold, discrepancy_name,
                      small_k=1024):
    """Threshold-culled top-N merge — bit-identical to :func:`merge_core`.

    The carried buffer is always sorted ascending, so its last key ``kth``
    is the current N-th best.  A new key ``>= kth`` can NEVER enter the
    buffer: ``lax.top_k`` breaks ties by lower index and buffer rows precede
    batch rows in the flat merge's concatenation, so even an exact tie
    loses.  Hence only the ``count`` of strictly-better candidates matters;
    once the buffer stabilizes (a few scan iterations in), ``count`` decays
    like N/iteration and a ``small_k``-wide ``top_k`` replaces the
    full-width one.  ``lax.cond`` guards exactness: if ``count > small_k``
    (early iterations) the flat merge runs instead.

    ``small_k`` may be a tuple of ascending widths: a CASCADE of guarded
    fast paths (``count <= w`` picks the narrowest adequate ``top_k``,
    the flat merge remains the last resort).  The narrow widths serve the
    steady state where ``count`` has decayed to O(n/iteration) while the
    wide ones keep the expensive full-width gathers of the flat path off
    the early iterations.

    Tie/`inf` behaviour is preserved: candidates come out of the small
    ``top_k`` ordered (value, original index) — the same relative order
    ties have in the flat concatenation — and buffer rows keep lower
    indices than candidates, so the merged output (keys AND gathered rows)
    is bit-identical to the flat path per seed.
    """
    widths = tuple(small_k) if isinstance(small_k, (tuple, list)) \
        else (small_k,)
    if sorted(widths) != list(widths) or len(set(widths)) != len(widths):
        raise ValueError(f"small_k cascade must be ascending: {small_k!r}")
    d = jnp.asarray(batch[discrepancy_name])
    keys_new = jnp.asarray(sort_key(d), jnp.float32)
    ok = accept_mask(d, threshold)
    keys_eff = jnp.where(ok, keys_new, jnp.inf)
    n = buffers["__key"].shape[0]
    n_acc = jnp.sum(ok)
    if keys_eff.shape[0] <= 4 * max(widths):
        # small batches: the flat merge is already narrow; no cull to win
        out, _ = merge_core(buffers, batch, threshold, discrepancy_name)
        return out, n_acc

    kth = buffers["__key"][n - 1]
    beats = keys_eff < kth
    count = jnp.sum(beats)

    def make_fast(width):
        def fast(bufs):
            masked = jnp.where(beats, keys_eff, jnp.inf)
            neg_c, cidx = jax.lax.top_k(-masked, width)
            cat2 = jnp.concatenate([bufs["__key"], -neg_c])
            neg2, idx2 = jax.lax.top_k(-cat2, n)
            from_buf = idx2 < n
            bidx = jnp.minimum(idx2, n - 1)
            srow = jnp.take(cidx, jnp.maximum(idx2 - n, 0))
            out = {"__key": -neg2}
            for k in batch:
                bv = bufs[k]
                nv = jnp.asarray(batch[k]).astype(bv.dtype)
                cond = from_buf.reshape((-1,) + (1,) * (bv.ndim - 1))
                out[k] = jnp.where(cond, jnp.take(bv, bidx, axis=0),
                                   jnp.take(nv, srow, axis=0))
            return out

        return fast

    def slow(bufs):
        out, _ = merge_core(bufs, batch, threshold, discrepancy_name)
        return out

    merged = slow
    for width in reversed(widths):
        merged = (lambda wider, w: lambda bufs: jax.lax.cond(
            count <= w, make_fast(w), wider, bufs))(merged, width)
    return merged(buffers), n_acc


#: merge variant used inside the fused rejection scan ("culled" | "flat");
#: module-level so benchmarks can A/B — the fused-chunk cache key includes it
MERGE_VARIANT = "culled"
#: candidate width(s) of the culled fast path (int or ascending tuple —
#: see :func:`merge_core_culled`).  TPU A/B at the bench operating point
#: (batch 2^20, 256 iterations, scripts/merge_ab2.py 2026-08-17):
#: 342.2M sims/s @1024 -> 349.7M @4096 — the wider guard admits the fast
#: path on more of the early iterations, which outweighs the wider top_k.
CULL_SMALL_K = 4096
#: smallest batch the cull pays off for (TPU A/B 2026-08-17,
#: scripts/merge_ab.py: +13% at 2^19, -14% at 2^17 — with 4x the scan
#: iterations the per-iteration lax.cond overhead outweighs the narrower
#: top_k)
CULL_MIN_BATCH = 1 << 18


def merge_scan(buffers, batch, threshold, discrepancy_name):
    """Merge used by the fused scan body, honoring :data:`MERGE_VARIANT`."""
    b = jnp.asarray(batch[discrepancy_name]).shape[0]
    if MERGE_VARIANT == "culled" and b >= CULL_MIN_BATCH:
        return merge_core_culled(buffers, batch, threshold, discrepancy_name,
                                 small_k=CULL_SMALL_K)
    return merge_core(buffers, batch, threshold, discrepancy_name)


def make_merge_fn(discrepancy_name):
    """Jitted standalone merge for the batch-at-a-time path."""
    import functools
    return jax.jit(functools.partial(merge_core,
                                     discrepancy_name=discrepancy_name))
