"""ctypes bindings for the native C++ ground-truth engine (native/).

The reference's entire main path is native C++ (SURVEY.md §2); the rebuild
keeps a native oracle as an *independent* double-precision cross-check for
the JAX engines — including bit-exact validation of the mt19937 initializer
(both this library and :mod:`ppsim_tpu.initlib` must reproduce
part1/main.cpp:31-59 exactly, through entirely different code).

The shared library is built on demand with one ``g++`` invocation (CMake
build in ``native/`` is equivalent); binding is ctypes per environment
constraints (no pybind11).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ppsim_tpu.config import SimConfig

__all__ = ["load", "available", "native_init", "native_run", "native_frame_stats"]

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "ppsim_native.cpp")
_LIB_CANDIDATES = [
    os.path.join(_ROOT, "native", "build", "libppsim_native.so"),
    os.path.join(_ROOT, "native", "libppsim_native.so"),
]

_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_D = ctypes.POINTER(ctypes.c_double)


def _build() -> Optional[str]:
    out = _LIB_CANDIDATES[1]
    tmp = out + f".tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        # Atomic replace = fresh inode: dlopen caches by (dev, ino), so an
        # in-place overwrite of an already-loaded library would hand back
        # the stale handle (or stale mapped pages) on re-load.
        os.replace(tmp, out)
        return out
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    path = next((p for p in _LIB_CANDIDATES if os.path.exists(p)), None)
    if path is not None and os.path.getmtime(path) < os.path.getmtime(_SRC):
        path = _build() or path  # stale prebuilt: refresh before first dlopen
    if path is None:
        path = _build()
    if path is None:
        _load_failed = True
        return None
    lib = ctypes.CDLL(path)
    if not hasattr(lib, "ppsim_frame_stats"):
        # Library predates the checker kernel and the mtime heuristic missed
        # it. Rebuild and load under a UNIQUE pathname: glibc's dlopen caches
        # handles by name, so re-opening the just-replaced canonical path
        # would hand back the stale mapping.
        built = _build()
        if built is None:
            _load_failed = True
            return None
        uniq = built + f".load{os.getpid()}"
        import shutil

        shutil.copy2(built, uniq)
        try:
            lib = ctypes.CDLL(uniq)
        finally:
            os.remove(uniq)  # the mapping outlives the unlinked file
    i64, f64, i32 = ctypes.c_int64, ctypes.c_double, ctypes.c_int
    lib.ppsim_init_particles.argtypes = [_D, _D, _D, _D, i64, f64, i32]
    lib.ppsim_run_oracle.argtypes = [_D, _D, _D, _D, i64, f64, i64, f64, f64, f64, f64]
    lib.ppsim_run_cells.argtypes = lib.ppsim_run_oracle.argtypes
    lib.ppsim_frame_stats.argtypes = [_D, i64, i32, f64, _D]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_D)


def native_init(num_parts: int, size: float, seed: int):
    """Bit-faithful reference initializer via the native library.

    Returns (pos (N,2), vel (N,2)) float64.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed?)")
    x = np.empty(num_parts, np.float64)
    y = np.empty(num_parts, np.float64)
    vx = np.empty(num_parts, np.float64)
    vy = np.empty(num_parts, np.float64)
    lib.ppsim_init_particles(_ptr(x), _ptr(y), _ptr(vx), _ptr(vy),
                             num_parts, size, seed)
    return np.stack([x, y], -1), np.stack([vx, vy], -1)


def native_frame_stats(pos: np.ndarray, cutoff: float):
    """(dmin, dsum, dcount) of sub-cutoff pair distances in one (N, dim)
    frame via the native cell-list pass (each unordered pair counted once).
    Returns None when the native library is unavailable (callers fall back
    to the numpy path)."""
    lib = load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    n, dim = pos.shape
    out = np.empty(3, np.float64)
    lib.ppsim_frame_stats(_ptr(pos), n, dim, cutoff, _ptr(out))
    dmin = float(out[0]) if out[0] < 1e29 else float("inf")
    return dmin, float(out[1]), int(out[2])


def native_run(pos, vel, config: SimConfig, nsteps: int, engine: str = "cells"):
    """Run the native engine in-place on float64 copies; returns (pos, vel)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed?)")
    pos = np.array(pos, np.float64, order="C")
    vel = np.array(vel, np.float64, order="C")
    x = np.ascontiguousarray(pos[:, 0])
    y = np.ascontiguousarray(pos[:, 1])
    vx = np.ascontiguousarray(vel[:, 0])
    vy = np.ascontiguousarray(vel[:, 1])
    fn = {"oracle": lib.ppsim_run_oracle, "cells": lib.ppsim_run_cells}[engine]
    fn(_ptr(x), _ptr(y), _ptr(vx), _ptr(vy), pos.shape[0], config.size,
       nsteps, config.cutoff, config.min_r, config.mass, config.dt)
    return np.stack([x, y], -1), np.stack([vx, vy], -1)
