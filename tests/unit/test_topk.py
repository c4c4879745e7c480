"""Direct unit tests of the running top-N merge op (``elfi_tpu/ops/topk.py``)
against a numpy oracle — the op that keeps the rejection hot loop on device.
End-to-end bit-parity lives in tests/functional/test_rejection.py; these
pin the op's own contract (exact top-N, threshold masking, nested
distances) in isolation."""

import numpy as np
import pytest

import jax.numpy as jnp

from elfi_tpu.ops.topk import (accept_mask, init_buffers, make_merge_fn,
                               merge_core, sort_key)


def _oracle_topn(all_keys, n):
    """numpy reference: the n smallest keys, ascending."""
    return np.sort(all_keys)[:n]


def test_merge_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    n = 16
    batch = {"d": rng.uniform(0, 1, 64).astype(np.float32),
             "t": rng.normal(size=64).astype(np.float32)}
    buffers = init_buffers(n, batch, "d")
    merge = make_merge_fn("d")
    seen = []
    for i in range(5):
        b = {"d": rng.uniform(0, 1, 64).astype(np.float32),
             "t": rng.normal(size=64).astype(np.float32)}
        seen.append(b["d"])
        buffers, n_acc = merge(buffers, b, jnp.inf)
        assert int(n_acc) == 64
    got = np.sort(np.asarray(buffers["__key"]))
    np.testing.assert_allclose(got, _oracle_topn(np.concatenate(seen), n))


def test_merge_keeps_rows_aligned():
    """Non-key outputs must travel with their distance row."""
    n = 8
    d = np.arange(32, dtype=np.float32)[::-1].copy()   # 31..0
    t = (d * 10).astype(np.float32)
    batch = {"d": d, "t": t}
    buffers = init_buffers(n, batch, "d")
    buffers, _ = merge_core(buffers, batch, jnp.inf, "d")
    keys = np.asarray(buffers["__key"])
    np.testing.assert_allclose(np.asarray(buffers["t"]), keys * 10)
    np.testing.assert_allclose(np.sort(keys), np.arange(8, dtype=np.float32))


def test_threshold_masks_candidates():
    n = 4
    d = np.array([0.1, 0.2, 0.9, 0.95], np.float32)
    batch = {"d": d}
    buffers = init_buffers(n, batch, "d")
    buffers, n_acc = merge_core(buffers, batch, 0.5, "d")
    assert int(n_acc) == 2
    keys = np.sort(np.asarray(buffers["__key"]))
    # rejected rows stay +inf in the buffer — they can never displace
    np.testing.assert_allclose(keys[:2], [0.1, 0.2])
    assert np.all(np.isinf(keys[2:]))


def test_nested_distance_uses_last_measure_for_sort_all_for_accept():
    # adaptive/nested distances produce 2-D output: sort key = last column,
    # acceptance = ALL columns within threshold
    d = np.array([[0.1, 0.3], [0.9, 0.2], [0.2, 0.25]], np.float32)
    np.testing.assert_allclose(np.asarray(sort_key(d)), [0.3, 0.2, 0.25])
    mask = np.asarray(accept_mask(d, 0.5))
    np.testing.assert_array_equal(mask, [True, False, True])


def test_init_buffers_shapes_and_dtypes():
    batch = {"d": np.zeros((32, 2), np.float32),
             "theta": np.zeros((32, 3), np.float64),
             "lbl": np.zeros(32, np.int32)}
    buffers = init_buffers(10, batch, "d")
    assert buffers["d"].shape == (10, 2)
    assert np.all(np.isinf(np.asarray(buffers["d"])))
    assert buffers["theta"].shape == (10, 3)
    assert buffers["lbl"].dtype == np.int32
    assert buffers["__key"].shape == (10,)


def _random_stream(rng, n_batches, b, low=0.0):
    for _ in range(n_batches):
        yield {"d": rng.uniform(low, 1, b).astype(np.float32),
               "t": rng.normal(size=(b, 2)).astype(np.float32)}


@pytest.mark.parametrize("threshold", [np.inf, 0.4])
@pytest.mark.parametrize("small_k", [8, (4, 8), (2, 8, 16)])
def test_culled_merge_bit_identical_to_flat(threshold, small_k):
    """merge_core_culled must be BIT-identical to merge_core on every
    buffer entry (keys and gathered rows), across both cond branches:
    early batches overflow small_k (slow branch), later ones cull (fast).
    Tuple small_k exercises the cascade of guarded widths."""
    from elfi_tpu.ops.topk import merge_core_culled

    rng = np.random.RandomState(3)
    n, b = 16, 64          # b > 4*max(small_k) -> culled body active
    max_k = small_k if isinstance(small_k, int) else max(small_k)
    batches = list(_random_stream(rng, 12, b))
    buf_flat = init_buffers(n, batches[0], "d")
    buf_cull = init_buffers(n, batches[0], "d")
    fast_possible = False
    for batch in batches:
        kth = np.asarray(buf_cull["__key"])[n - 1]
        if np.sum(batch["d"] < min(kth, threshold)) <= max_k:
            fast_possible = True
        buf_flat, acc_f = merge_core(buf_flat, batch, threshold, "d")
        buf_cull, acc_c = merge_core_culled(buf_cull, batch, threshold, "d",
                                            small_k=small_k)
        assert int(acc_f) == int(acc_c)
        for k in buf_flat:
            np.testing.assert_array_equal(np.asarray(buf_flat[k]),
                                          np.asarray(buf_cull[k]), err_msg=k)
    assert fast_possible  # the fast branch was actually exercised


def test_culled_merge_rejects_unsorted_cascade():
    from elfi_tpu.ops.topk import merge_core_culled

    batch = {"d": np.zeros(64, np.float32)}
    bufs = init_buffers(8, batch, "d")
    with pytest.raises(ValueError, match="ascending"):
        merge_core_culled(bufs, batch, np.inf, "d", small_k=(8, 4))


def test_culled_merge_bit_identical_with_boundary_ties():
    """Ties exactly AT the current N-th key: never admitted (buffer rows
    win the index tie-break) — both paths must agree bit-for-bit."""
    from elfi_tpu.ops.topk import merge_core_culled

    n, small_k = 8, 4
    first = {"d": np.linspace(0.1, 0.8, 32).astype(np.float32),
             "t": np.arange(32, dtype=np.float32)}
    buf_flat = init_buffers(n, first, "d")
    buf_cull = init_buffers(n, first, "d")
    buf_flat, _ = merge_core(buf_flat, first, np.inf, "d")
    buf_cull, _ = merge_core_culled(buf_cull, first, np.inf, "d",
                                    small_k=small_k)
    kth = float(np.asarray(buf_flat["__key"])[n - 1])
    # second batch: duplicates of kth (must lose), a couple of better keys,
    # and filler above the boundary
    d2 = np.full(32, kth, np.float32)
    d2[5] = kth / 2
    d2[9] = kth / 3
    d2[16:] = 0.9
    batch2 = {"d": d2, "t": 100 + np.arange(32, dtype=np.float32)}
    buf_flat, _ = merge_core(buf_flat, batch2, np.inf, "d")
    buf_cull, _ = merge_core_culled(buf_cull, batch2, np.inf, "d",
                                    small_k=small_k)
    for k in buf_flat:
        np.testing.assert_array_equal(np.asarray(buf_flat[k]),
                                      np.asarray(buf_cull[k]), err_msg=k)
    assert kth not in np.asarray(buf_cull["__key"])  # dup never entered


def test_culled_merge_partial_buffer_infs():
    """Fast branch while the buffer still holds +inf sentinels (few
    acceptances yet): kept infs must come from the buffer in both paths."""
    from elfi_tpu.ops.topk import merge_core_culled

    n, small_k = 12, 4
    d = np.full(32, np.inf, np.float32)   # threshold rejects all but two
    d[3], d[20] = 0.1, 0.2
    batch = {"d": np.where(np.isinf(d), 5.0, d).astype(np.float32),
             "t": np.arange(32, dtype=np.float32)}
    buf_flat = init_buffers(n, batch, "d")
    buf_cull = init_buffers(n, batch, "d")
    buf_flat, af = merge_core(buf_flat, batch, 1.0, "d")
    buf_cull, ac = merge_core_culled(buf_cull, batch, 1.0, "d",
                                     small_k=small_k)
    assert int(af) == int(ac) == 2
    for k in buf_flat:
        np.testing.assert_array_equal(np.asarray(buf_flat[k]),
                                      np.asarray(buf_cull[k]), err_msg=k)


def test_merge_scan_variant_switch():
    from elfi_tpu.ops import topk as topk_mod

    batch = {"d": np.random.RandomState(0).uniform(0, 1, 64)
             .astype(np.float32)}
    bufs = init_buffers(8, batch, "d")
    prev = topk_mod.MERGE_VARIANT
    try:
        topk_mod.MERGE_VARIANT = "flat"
        out_f, _ = topk_mod.merge_scan(bufs, batch, np.inf, "d")
        topk_mod.MERGE_VARIANT = "culled"
        out_c, _ = topk_mod.merge_scan(bufs, batch, np.inf, "d")
    finally:
        topk_mod.MERGE_VARIANT = prev
    np.testing.assert_array_equal(np.asarray(out_f["__key"]),
                                  np.asarray(out_c["__key"]))


def test_merge_is_deterministic_under_duplicate_keys():
    """Duplicate distances must not produce nondeterministic buffers: two
    identical merges give identical outputs (ties broken by stable index)."""
    n = 6
    d = np.array([0.5] * 12, np.float32)
    t = np.arange(12, dtype=np.float32)
    batch = {"d": d, "t": t}
    b1 = init_buffers(n, batch, "d")
    out1, _ = merge_core(b1, batch, jnp.inf, "d")
    out2, _ = merge_core(b1, batch, jnp.inf, "d")
    np.testing.assert_array_equal(np.asarray(out1["t"]),
                                  np.asarray(out2["t"]))


def test_fused_unroll_heuristic():
    """The merge-unroll auto-heuristic's measured operating points
    (docs/measurements/2026-08-20_merge_unroll.md): u=16 at batch 2^17
    (248 -> 319 M sims/s), u=8 at 2^18, and u=1 above 2^18 where the
    threshold-culled merge already amortizes and unroll measurably hurts
    the Pallas path (367 -> 330 M)."""
    import numpy as np

    from elfi_tpu.methods.samplers import FUSED_UNROLL, _fused_unroll

    class _Shape:
        def __init__(self, shape, itemsize=4):
            self.shape = shape
            self.dtype = type("dt", (), {"itemsize": itemsize})()

    shapes = {"d": _Shape((1, )), "t1": _Shape((1, )), "t2": _Shape((1,))}
    assert FUSED_UNROLL is None          # auto mode is the default
    assert _fused_unroll(1 << 17, shapes) == 16
    assert _fused_unroll(1 << 18, shapes) == 8
    assert _fused_unroll(1 << 20, shapes) == 1
    assert _fused_unroll(1 << 21, shapes) == 1
    # wide per-sim outputs skip the unroll (HBM traffic for the concat)
    wide = {"y": _Shape((1, 512))}
    assert _fused_unroll(1 << 16, wide) == 1
