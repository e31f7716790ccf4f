"""Native C++ data runtime tests: build, npy loading, windowing, stats,
shuffles — all golden-checked against the numpy implementations."""

import os

import numpy as np
import pytest

from bridgerl_tpu import runtime
from bridgerl_tpu.data.pipeline import slice_windows as np_slice


@pytest.fixture(scope="module", autouse=True)
def built():
    if not runtime.ensure_built():
        pytest.skip("g++ unavailable; native runtime not built")


def test_library_builds_and_loads():
    assert runtime.available()


def test_load_npy_matches_numpy(tmp_path, rng):
    for shape in [(100, 29), (50, 10, 29), (7,)]:
        a = rng.normal(size=shape).astype(np.float32)
        p = str(tmp_path / f"a{len(shape)}.npy")
        np.save(p, a)
        b = runtime.load_npy_f32(p)
        assert b.shape == a.shape
        np.testing.assert_array_equal(a, b)


def test_load_npy_fallback_for_unsupported_dtype(tmp_path, rng):
    a = rng.normal(size=(10, 3))  # float64 -> native rejects -> numpy fallback
    p = str(tmp_path / "f64.npy")
    np.save(p, a)
    b = runtime.load_npy_f32(p)
    np.testing.assert_allclose(b, a.astype(np.float32))


def test_slice_windows_matches_numpy(rng):
    motion = rng.normal(size=(157, 29)).astype(np.float32)
    for window, stride in [(10, 1), (10, 3), (64, 20), (157, 1), (200, 1)]:
        ours = runtime.slice_windows(motion, window, stride)
        ref = np_slice(motion, window, stride)
        assert ours.shape == ref.shape
        np.testing.assert_array_equal(ours, ref)


def test_mean_std_matches_numpy(rng):
    data = rng.normal(2.0, 3.0, size=(5000, 29)).astype(np.float32)
    mean, std = runtime.mean_std(data)
    np.testing.assert_allclose(mean, data.mean(0), atol=1e-4)
    np.testing.assert_allclose(std, data.std(0) + 1e-6, atol=1e-4)


def test_shuffle_deterministic_permutation():
    a = runtime.shuffle_indices(1000, seed=42)
    b = runtime.shuffle_indices(1000, seed=42)
    c = runtime.shuffle_indices(1000, seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(1000))


def test_normalize_inplace(rng):
    data = rng.normal(5, 2, size=(200, 29)).astype(np.float32)
    mean, std = runtime.mean_std(data)
    ref = (data - mean) / std
    out = runtime.normalize_inplace(data.copy(), mean, std)
    np.testing.assert_allclose(out, ref, atol=1e-5)
