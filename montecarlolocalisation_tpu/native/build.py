"""Build + load the native planner library (g++ -> .so, ctypes ABI).

The .so is compiled on first use into the package directory and reused; a
stale object (older than the source) is rebuilt.  Callers must handle
load_planner() returning None (no toolchain) and fall back to the pure
Python implementations in planning/.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "planner.cpp")
_LIB = osp.join(_DIR, "libmclplanner.so")
_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load_planner() -> Optional[ctypes.CDLL]:
    """Returns the loaded library with argtypes configured, or None."""
    global _CACHED, _FAILED
    with _LOCK:
        if _CACHED is not None:
            return _CACHED
        if _FAILED:
            return None
        need_build = (not osp.exists(_LIB)
                      or os.stat(_LIB).st_mtime < os.stat(_SRC).st_mtime)
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
        lib.mcl_bfs_path.restype = ctypes.c_int32
        lib.mcl_bfs_path.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
            ctypes.c_int32]
        lib.mcl_bfs_all_pairs.restype = ctypes.c_int32
        lib.mcl_bfs_all_pairs.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, i32p, ctypes.c_int32, i32p]
        lib.mcl_held_karp.restype = ctypes.c_int64
        lib.mcl_held_karp.argtypes = [i32p, ctypes.c_int32, i32p]
        _CACHED = lib
        return lib
