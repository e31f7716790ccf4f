"""ctypes bindings for the native motiondata runtime (libmotiondata.so).

The C++ library (motiondata.cpp) provides the host-side data runtime: npy
float32 loading, multithreaded window slicing, normalization statistics and
deterministic epoch shuffles. Python falls back to the numpy implementations
in bridgerl_tpu.data when the library is absent; `ensure_built()` compiles it
on demand with g++ (no pip dependencies).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmotiondata.so")
_LIB: Optional[ctypes.CDLL] = None


def ensure_built(rebuild: bool = False) -> bool:
    """Compile the shared library if needed; returns availability."""
    src = os.path.join(_DIR, "motiondata.cpp")
    if rebuild or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
                 "-shared", "-o", _SO, src],
                check=True, capture_output=True, cwd=_DIR)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False
    return os.path.exists(_SO)


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    lib.md_load_npy_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                    i64 * 4, ctypes.POINTER(ctypes.c_int)]
    lib.md_load_npy_f32.restype = ctypes.c_int
    lib.md_free.argtypes = [ctypes.c_void_p]
    lib.md_num_windows.argtypes = [i64, i64, i64]
    lib.md_num_windows.restype = i64
    lib.md_slice_windows.argtypes = [ctypes.POINTER(ctypes.c_float), i64, i64, i64, i64,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.md_slice_windows.restype = ctypes.c_int
    lib.md_mean_std.argtypes = [ctypes.POINTER(ctypes.c_float), i64, i64,
                                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                                ctypes.c_float]
    lib.md_shuffle_indices.argtypes = [i64, ctypes.c_uint64, ctypes.POINTER(i64)]
    lib.md_normalize.argtypes = [ctypes.POINTER(ctypes.c_float), i64, i64,
                                 ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_npy_f32(path: str) -> np.ndarray:
    lib = load_library()
    if lib is None:
        return np.load(path).astype(np.float32)
    data = ctypes.POINTER(ctypes.c_float)()
    shape = (ctypes.c_int64 * 4)()
    ndim = ctypes.c_int(0)
    rc = lib.md_load_npy_f32(path.encode(), ctypes.byref(data), shape, ctypes.byref(ndim))
    if rc != 0:  # unsupported dtype/layout -> numpy fallback
        return np.load(path).astype(np.float32)
    dims = tuple(shape[i] for i in range(ndim.value))
    n = int(np.prod(dims))
    out = np.ctypeslib.as_array(data, shape=(n,)).reshape(dims).copy()
    lib.md_free(data)
    return out


def slice_windows(motion: np.ndarray, window: int, stride: int) -> np.ndarray:
    """Native strided windowing; numpy fallback preserves exact semantics."""
    lib = load_library()
    motion = np.ascontiguousarray(motion, dtype=np.float32)
    T, D = motion.shape
    if lib is None:
        from ..data.pipeline import slice_windows as np_slice
        return np_slice(motion, window, stride)
    K = lib.md_num_windows(T, window, stride)
    out = np.empty((K, window, D), np.float32)
    if K > 0:
        lib.md_slice_windows(_fptr(motion), T, D, window, stride, _fptr(out))
    return out


def mean_std(data: np.ndarray, eps: float = 1e-6) -> Tuple[np.ndarray, np.ndarray]:
    """Per-dim mean and (std + eps) over flattened frames."""
    lib = load_library()
    flat = np.ascontiguousarray(data.reshape(-1, data.shape[-1]), dtype=np.float32)
    if lib is None:
        return flat.mean(0), flat.std(0) + eps
    n, d = flat.shape
    mean = np.empty(d, np.float32)
    std = np.empty(d, np.float32)
    lib.md_mean_std(_fptr(flat), n, d, _fptr(mean), _fptr(std), eps)
    return mean, std


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    lib = load_library()
    if lib is None:
        return np.random.default_rng(seed).permutation(n)
    out = np.empty(n, np.int64)
    lib.md_shuffle_indices(n, np.uint64(seed),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def normalize_inplace(data: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    lib = load_library()
    data = np.ascontiguousarray(data, dtype=np.float32)
    if lib is None:
        return (data - mean) / std
    flat = data.reshape(-1, data.shape[-1])
    lib.md_normalize(_fptr(flat), flat.shape[0], flat.shape[1],
                     _fptr(np.ascontiguousarray(mean, np.float32)),
                     _fptr(np.ascontiguousarray(std, np.float32)))
    return data
