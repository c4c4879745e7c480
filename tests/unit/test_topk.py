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
