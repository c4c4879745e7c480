import os

import numpy as np
import pytest

import elfi_tpu as elfi
from elfi_tpu.store import ArrayStore, NpyArray, NpyStore


class TestNpyArray:
    def test_append_and_read(self, tmp_path):
        f = str(tmp_path / "a.npy")
        arr = NpyArray(f)
        a = np.random.rand(10, 3).astype(np.float32)
        b = np.random.rand(5, 3).astype(np.float32)
        arr.append(a)
        arr.append(b)
        np.testing.assert_array_equal(arr[:], np.vstack([a, b]))
        assert len(arr) == 15

    def test_standard_npy_readable(self, tmp_path):
        f = str(tmp_path / "a.npy")
        arr = NpyArray(f)
        a = np.arange(12, dtype=np.int64).reshape(4, 3)
        arr.append(a)
        arr.close()
        loaded = np.load(f)
        np.testing.assert_array_equal(loaded, a)

    def test_truncate(self, tmp_path):
        f = str(tmp_path / "a.npy")
        arr = NpyArray(f)
        arr.append(np.arange(10.0))
        arr.truncate(4)
        np.testing.assert_array_equal(arr[:], np.arange(4.0))
        arr.append(np.array([99.0]))
        np.testing.assert_array_equal(arr[:],
                                      np.array([0, 1, 2, 3, 99.0]))

    def test_reopen(self, tmp_path):
        f = str(tmp_path / "a.npy")
        arr = NpyArray(f)
        arr.append(np.ones((3, 2)))
        arr.close()
        arr2 = NpyArray(f)
        assert len(arr2) == 3
        arr2.append(np.zeros((2, 2)))
        assert len(arr2) == 5

    def test_shape_mismatch(self, tmp_path):
        arr = NpyArray(str(tmp_path / "a.npy"))
        arr.append(np.ones((3, 2)))
        with pytest.raises(ValueError):
            arr.append(np.ones((3, 5)))

    def test_pickle_by_filename(self, tmp_path):
        import pickle
        arr = NpyArray(str(tmp_path / "a.npy"))
        arr.append(np.arange(6.0).reshape(2, 3))
        arr2 = pickle.loads(pickle.dumps(arr))
        np.testing.assert_array_equal(arr2[:], arr[:])


class TestArrayStore:
    def test_batch_semantics(self):
        store = ArrayStore(np.zeros((20, 2)), batch_size=5)
        data = np.random.rand(5, 2)
        store[0] = data
        assert 0 in store and 1 not in store
        np.testing.assert_array_equal(store[0], data)
        with pytest.raises(IndexError):
            store[3] = data  # can't skip ahead
        store[1] = data
        del store[1]
        assert len(store) == 1
        with pytest.raises(KeyError):
            store[1]


class TestPools:
    def test_output_pool_roundtrip(self, ma2):
        pool = elfi.OutputPool(["t1", "t2", "d"])
        rej = elfi.Rejection(ma2["d"], batch_size=10, seed=1, pool=pool)
        res = rej.sample(5, n_sim=30, fused=False, bar=False)
        assert len(pool) == 3
        batch = pool.get_batch(0)
        assert set(batch) == {"t1", "t2", "d"}
        assert len(batch["t1"]) == 10

    def test_pool_replay_matches(self, ma2):
        pool = elfi.OutputPool(["t1", "t2", "d"])
        rej = elfi.Rejection(ma2["d"], batch_size=10, seed=3, pool=pool)
        res1 = rej.sample(5, n_sim=30, fused=False, bar=False)
        # replay: same pool, same seed -> identical result, no re-simulation
        rej2 = elfi.Rejection(ma2["d"], batch_size=10, seed=3, pool=pool)
        res2 = rej2.sample(5, n_sim=30, fused=False, bar=False)
        np.testing.assert_array_equal(res1.samples["t1"], res2.samples["t1"])
        np.testing.assert_array_equal(res1.outputs["d"], res2.outputs["d"])

    def test_pool_context_mismatch(self, ma2):
        pool = elfi.OutputPool(["t1"])
        elfi.Rejection(ma2["d"], batch_size=10, seed=3, pool=pool)
        with pytest.raises(ValueError):
            elfi.Rejection(ma2["d"], batch_size=20, seed=3, pool=pool)

    def test_array_pool_save_open_delete(self, tmp_path, ma2):
        pool = elfi.ArrayPool(["t1", "d"], name="testpool",
                              prefix=str(tmp_path))
        rej = elfi.Rejection(ma2["d"], batch_size=10, seed=2, pool=pool)
        rej.sample(5, n_sim=20, fused=False, bar=False)
        pool.save()
        pool2 = elfi.ArrayPool.open("testpool", prefix=str(tmp_path))
        np.testing.assert_array_equal(pool2.get_batch(0)["t1"],
                                      pool.get_batch(0)["t1"])
        assert pool2.seed == pool.seed
        pool2.delete()
        assert not os.path.isdir(os.path.join(str(tmp_path), "testpool"))
