"""Native (C++) runtime components, loaded via ctypes.

Builds lazily with g++ on first use (no pybind11 dependency); every entry
point has a pure-Python fallback so the framework works without a
toolchain. See src/ for the kernels.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LIB_PATH = os.path.join(_HERE, "libdqm_runtime.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build(force: bool = False) -> Optional[str]:
    """Compile the runtime library. Returns the .so path or None."""
    global _build_failed
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    srcs = [os.path.join(_SRC, f) for f in sorted(os.listdir(_SRC))
            if f.endswith(".cpp")]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-o", _LIB_PATH] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        _build_failed = True
        return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed). None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.sample_window_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sample_window_batch.restype = None
    _lib = lib
    return _lib


def sample_window_batch_native(data, bsz: int, T: int, seed: int):
    """Native batched window sampling; returns None if the library is
    unavailable (caller falls back to the Python sampler)."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    states = np.ascontiguousarray(data["state"], np.float32)
    actions = np.ascontiguousarray(data["action"], np.float32)
    mask = np.ascontiguousarray(data["mask"], np.float32)
    N, nx = states.shape
    nu = actions.shape[1]
    out_s = np.empty((bsz, T, nx), np.float32)
    out_a = np.empty((bsz, T, nu), np.float32)
    out_m = np.empty((bsz, T), np.float32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.sample_window_batch(fp(states), fp(actions), fp(mask),
                            N, nx, nu, T, bsz, seed,
                            fp(out_s), fp(out_a), fp(out_m))
    return {"state": out_s, "action": out_a, "mask": out_m}
