"""Build + load the native host library (g++ -> .so, ctypes ABI).

One shared object covers the host-side native components (mirroring the
reference's C++ nodes): the BFS/Held-Karp planner (planner.cpp) and the
scan-filter/replay preprocessor (scanfilter.cpp).  Compiled on first use
into the package directory; stale objects (older than any source) rebuild.
Callers must handle load_native() returning None (no toolchain) and fall
back to the pure-Python implementations.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

_DIR = osp.dirname(osp.abspath(__file__))
_SOURCES = [osp.join(_DIR, "planner.cpp"), osp.join(_DIR, "scanfilter.cpp"),
            osp.join(_DIR, "raster.cpp")]
_LIB = osp.join(_DIR, "libmclnative.so")
_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", *_SOURCES,
           "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Returns the loaded library with argtypes configured, or None."""
    global _CACHED, _FAILED
    with _LOCK:
        if _CACHED is not None:
            return _CACHED
        if _FAILED:
            return None
        src_mtime = max(os.stat(s).st_mtime for s in _SOURCES)
        need_build = (not osp.exists(_LIB)
                      or os.stat(_LIB).st_mtime < src_mtime)
        if need_build and not _build():
            _FAILED = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _FAILED = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32, f32 = ctypes.c_int32, ctypes.c_float
        lib.mcl_bfs_path.restype = i32
        lib.mcl_bfs_path.argtypes = [u8p, i32, i32, i32, i32, i32, i32,
                                     i32p, i32]
        lib.mcl_bfs_all_pairs.restype = i32
        lib.mcl_bfs_all_pairs.argtypes = [u8p, i32, i32, i32p, i32, i32p]
        lib.mcl_held_karp.restype = ctypes.c_int64
        lib.mcl_held_karp.argtypes = [i32p, i32, i32p]
        lib.mcl_filter_scan.restype = i32
        lib.mcl_filter_scan.argtypes = [f32p, i32, f32, f32, f32, f32, f32,
                                        f32, i32, f32p, f32p, i32]
        lib.mcl_rasterize.restype = i32
        lib.mcl_rasterize.argtypes = [u8p, i32p, i32, i32, i32,
                                      ctypes.c_uint8, u8p]
        lib.mcl_filter_episode.restype = i32
        lib.mcl_filter_episode.argtypes = [f32p, i32, i32, f32, f32, f32,
                                           f32, f32, f32, i32, f32p, f32p,
                                           u8p, i32]
        _CACHED = lib
        return lib


def load_planner() -> Optional[ctypes.CDLL]:
    """Back-compat alias (planner entry points live in the same library)."""
    return load_native()
