import numpy as np
import pytest

import elfi_tpu as elfi


def test_quantile_objective(ma2, with_all_clients):
    rej = elfi.Rejection(ma2["d"], batch_size=40, seed=7)
    res = rej.sample(20, quantile=0.1, fused=False, bar=False)
    assert res.n_samples == 20
    assert res.n_sim == 200
    d = res.outputs["d"]
    assert np.all(np.diff(d) >= 0)  # sorted ascending
    assert res.threshold == d[-1]


def test_nsim_objective(ma2):
    rej = elfi.Rejection(ma2["d"], batch_size=40, seed=7)
    res = rej.sample(20, n_sim=400, fused=False, bar=False)
    assert res.n_sim == 400


def test_threshold_objective(ma2):
    rej = elfi.Rejection(ma2["d"], batch_size=100, seed=7)
    res = rej.sample(10, threshold=0.5, fused=False, bar=False)
    assert np.all(res.outputs["d"] <= 0.5)
    assert res.n_samples == 10


def test_fused_equals_unfused(ma2):
    rej1 = elfi.Rejection(ma2["d"], batch_size=64, seed=13)
    res1 = rej1.sample(16, n_sim=640, fused=True, bar=False)
    rej2 = elfi.Rejection(ma2["d"], batch_size=64, seed=13)
    res2 = rej2.sample(16, n_sim=640, fused=False, bar=False)
    for k in res1.outputs:
        np.testing.assert_array_equal(res1.outputs[k], res2.outputs[k])


def test_fused_merge_unroll_parity(ma2):
    """The merge-unroll (u program calls concatenated into one top-N merge
    per scan step) must be BIT-identical to the per-batch schedule for any
    factor, including non-divisors of the batch count (10 batches at u=3 =
    3 unrolled steps + 1 remainder step) and in threshold mode (the
    chunked dispatch path)."""
    from elfi_tpu.methods import samplers

    saved = samplers.FUSED_UNROLL
    try:
        samplers.FUSED_UNROLL = 1
        base = elfi.Rejection(ma2["d"], batch_size=64, seed=13).sample(
            16, n_sim=640, fused=True, bar=False)
        base_thr = elfi.Rejection(ma2["d"], batch_size=64, seed=13).sample(
            16, threshold=1.0, fused=True, bar=False)
        for u in (3, 16):
            samplers.FUSED_UNROLL = u
            res = elfi.Rejection(ma2["d"], batch_size=64, seed=13).sample(
                16, n_sim=640, fused=True, bar=False)
            for k in base.outputs:
                np.testing.assert_array_equal(
                    np.asarray(base.outputs[k]), np.asarray(res.outputs[k]),
                    err_msg=f"unroll={u} output {k}")
            res_thr = elfi.Rejection(
                ma2["d"], batch_size=64, seed=13).sample(
                16, threshold=1.0, fused=True, bar=False)
            for k in base_thr.outputs:
                np.testing.assert_array_equal(
                    np.asarray(base_thr.outputs[k]),
                    np.asarray(res_thr.outputs[k]),
                    err_msg=f"unroll={u} threshold output {k}")
            assert res_thr.n_sim == base_thr.n_sim
    finally:
        samplers.FUSED_UNROLL = saved


@pytest.mark.slow
def test_fused_culled_merge_equals_flat_at_scale(ma2):
    """The fused loop's threshold-culled merge must stay BIT-identical to
    the flat merge end-to-end.  The culled body only activates at
    bench-scale batches (``CULL_MIN_BATCH`` = 2^18, ``CULL_SMALL_K`` =
    4096), so the thresholds are patched DOWN to make batch_size 8192
    take the culled path for real (8192 >= min batch, > 4*small_k; 10
    scan iterations cross the count<=small_k boundary) — without the
    patch both runs compile the flat merge and the test is vacuous."""
    from elfi_tpu.ops import topk as topk_mod

    assert topk_mod.MERGE_VARIANT == "culled"  # the shipped default
    saved = (topk_mod.MERGE_VARIANT, topk_mod.CULL_SMALL_K,
             topk_mod.CULL_MIN_BATCH)
    try:
        topk_mod.CULL_SMALL_K = 512
        topk_mod.CULL_MIN_BATCH = 8192
        res_c = elfi.Rejection(ma2["d"], batch_size=8192, seed=17).sample(
            50, n_sim=81920, fused=True, bar=False)
        topk_mod.MERGE_VARIANT = "flat"
        res_f = elfi.Rejection(ma2["d"], batch_size=8192, seed=17).sample(
            50, n_sim=81920, fused=True, bar=False)
    finally:
        (topk_mod.MERGE_VARIANT, topk_mod.CULL_SMALL_K,
         topk_mod.CULL_MIN_BATCH) = saved
    for k in res_c.outputs:
        np.testing.assert_array_equal(np.asarray(res_c.outputs[k]),
                                      np.asarray(res_f.outputs[k]),
                                      err_msg=k)


def test_sharded_culled_merge_equals_native_flat(ma2):
    """Culled merge under batch-axis sharding over the 8-device mesh: the
    cond predicate is a replicated scalar and the small top_k runs over a
    sharded operand — results must match the native flat path bit-for-bit
    (thresholds patched down so the culled body activates at test scale)."""
    from elfi_tpu.ops import topk as topk_mod

    pre = elfi.get_client()
    saved = (topk_mod.MERGE_VARIANT, topk_mod.CULL_SMALL_K,
             topk_mod.CULL_MIN_BATCH)
    try:
        topk_mod.MERGE_VARIANT = "flat"
        elfi.set_client(elfi.NativeBackend())
        res_n = elfi.Rejection(ma2["d"], batch_size=1024, seed=23).sample(
            32, n_sim=8192, fused=True, bar=False)
        topk_mod.MERGE_VARIANT = "culled"
        topk_mod.CULL_SMALL_K = 64
        topk_mod.CULL_MIN_BATCH = 1024
        elfi.set_client(elfi.ShardedBackend())
        res_s = elfi.Rejection(ma2["d"], batch_size=1024, seed=23).sample(
            32, n_sim=8192, fused=True, bar=False)
        for k in res_n.outputs:
            np.testing.assert_allclose(np.asarray(res_n.outputs[k]),
                                       np.asarray(res_s.outputs[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)
    finally:
        (topk_mod.MERGE_VARIANT, topk_mod.CULL_SMALL_K,
         topk_mod.CULL_MIN_BATCH) = saved
        elfi.set_client(pre)


def test_seed_determinism(ma2):
    r1 = elfi.Rejection(ma2["d"], batch_size=32, seed=5).sample(
        8, n_sim=64, bar=False)
    r2 = elfi.Rejection(ma2["d"], batch_size=32, seed=5).sample(
        8, n_sim=64, bar=False)
    r3 = elfi.Rejection(ma2["d"], batch_size=32, seed=6).sample(
        8, n_sim=64, bar=False)
    np.testing.assert_array_equal(r1.samples["t1"], r2.samples["t1"])
    assert not np.allclose(r1.samples["t1"], r3.samples["t1"])


def test_backends_agree(ma2, with_all_clients):
    """Same seed must give bit-identical results on every backend
    (the reference only guarantees this per-backend; we guarantee it
    globally because all backends run the same XLA program)."""
    if not isinstance(with_all_clients, elfi.NativeBackend):
        rej = elfi.Rejection(ma2["d"], batch_size=40, seed=9)
        res = rej.sample(10, n_sim=80, fused=False, bar=False)
        elfi.set_client(elfi.NativeBackend())
        rejn = elfi.Rejection(ma2["d"], batch_size=40, seed=9)
        resn = rejn.sample(10, n_sim=80, fused=False, bar=False)
        np.testing.assert_allclose(np.asarray(res.samples["t1"]),
                                   np.asarray(resn.samples["t1"]),
                                   rtol=1e-6)


def test_output_names_extra(ma2):
    rej = elfi.Rejection(ma2["d"], output_names=["S1"], batch_size=32,
                         seed=5)
    res = rej.sample(8, n_sim=64, bar=False)
    assert "S1" in res.outputs
    assert res.outputs["S1"].shape == (8,)


def test_multivariate(multivariate_model):
    rej = elfi.Rejection(multivariate_model["d"], batch_size=32, seed=5)
    res = rej.sample(8, n_sim=64, bar=False)
    assert res.samples["t1"].shape == (8, 2)


def test_sharded_fused_equals_native_fused(ma2):
    """The fused scan with batch-axis sharding over an 8-device mesh must
    produce the same samples as the single-device fused path."""
    pre = elfi.get_client()
    try:
        elfi.set_client(elfi.NativeBackend())
        res_n = elfi.Rejection(ma2["d"], batch_size=64, seed=21).sample(
            16, n_sim=640, fused=True, bar=False)
        elfi.set_client(elfi.ShardedBackend())
        res_s = elfi.Rejection(ma2["d"], batch_size=64, seed=21).sample(
            16, n_sim=640, fused=True, bar=False)
        for k in res_n.outputs:
            np.testing.assert_allclose(np.asarray(res_n.outputs[k]),
                                       np.asarray(res_s.outputs[k]),
                                       rtol=1e-5, atol=1e-6)
    finally:
        elfi.set_client(pre)


def test_multihost_backend_single_process(ma2):
    """MultihostBackend degrades to the native path in a 1-process job and
    must produce identical results (batches are pure functions of
    (seed, batch_index) on every backend)."""
    from elfi_tpu.parallel.backends import NativeBackend, set_client
    from elfi_tpu.parallel.multihost import MultihostBackend

    set_client(NativeBackend())
    r_native = elfi.Rejection(ma2["d"], batch_size=300, seed=21).sample(
        30, n_sim=900, bar=False, fused=False)
    set_client(MultihostBackend())
    try:
        assert elfi.get_client().num_processes == 1
        r_mh = elfi.Rejection(ma2["d"], batch_size=300, seed=21).sample(
            30, n_sim=900, bar=False)
    finally:
        set_client(NativeBackend())
    np.testing.assert_array_equal(r_native.samples_array, r_mh.samples_array)
