import os

import numpy as np
import pytest

from im23d_tpu.data.fastloader import NpzPool, available


def make_npz(tmp_path, n=6):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = str(tmp_path / f"{i}.npz")
        np.savez_compressed(
            p,
            a=rng.randn(3, 32, 32).astype(np.float16),
            b=(rng.rand(1, 32, 32) > 0.5).astype(np.float16),
            obj=np.array({"mesh": rng.randn(3, 4, 4).astype(np.float16)},
                         dtype=object),
        )
        paths.append(p)
    return paths


def test_fallback_path_without_lib(tmp_path, monkeypatch):
    import im23d_tpu.data.fastloader as fl

    monkeypatch.setattr(fl, "_LIB", None)
    monkeypatch.setattr(fl, "_load_lib", lambda: None)
    paths = make_npz(tmp_path, 2)
    pool = fl.NpzPool(2)
    out = pool.get(pool.submit(paths[0]), paths[0])
    ref = np.load(paths[0], allow_pickle=True)
    np.testing.assert_array_equal(out["a"], ref["a"])


@pytest.mark.skipif(not available(), reason="native loader not built")
def test_native_matches_numpy(tmp_path):
    paths = make_npz(tmp_path)
    pool = NpzPool(3)
    outs = pool.load_many(paths)
    for p, out in zip(paths, outs):
        ref = np.load(p, allow_pickle=True)
        assert set(out) == set(ref.files)
        np.testing.assert_array_equal(out["a"], ref["a"])
        np.testing.assert_array_equal(out["b"], ref["b"])
        np.testing.assert_array_equal(
            out["obj"].item()["mesh"], ref["obj"].item()["mesh"]
        )


@pytest.mark.skipif(not available(), reason="native loader not built")
def test_native_uncompressed_and_reuse(tmp_path):
    rng = np.random.RandomState(1)
    p = str(tmp_path / "stored.npz")
    np.savez(p, x=rng.randn(16, 16).astype(np.float32))  # stored, method 0
    pool = NpzPool(2)
    for _ in range(3):  # pool reuse
        out = pool.get(pool.submit(p), p)
        np.testing.assert_array_equal(out["x"], np.load(p)["x"])
