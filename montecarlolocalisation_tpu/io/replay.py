"""Raw-log replay preprocessing: LaserScan episodes -> fixed beam tables.

Reproduces the reference's inline scan filtering
(monte_carlo.cpp:254-278,610-620,650) over whole recorded episodes, using
the native C++ batch filter (native/scanfilter.cpp) when available and the
NumPy path otherwise.  Output shapes are static ([T, B] + mask) so the
jit-compiled filter replays the log under one lax.scan.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from ..config import SensorModelConfig
from ..models.sensor import filter_scan
from ..native.build import load_native


def preprocess_episode(
    raw_ranges: np.ndarray,       # [T, R] raw radii (NaN/Inf allowed)
    angle_min: float,
    angle_increment: float,
    range_min: float,
    range_max: float,
    cfg: SensorModelConfig = SensorModelConfig(),
    pad_to: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[T, R] raw log -> (angles [T, B], radii [T, B], mask [T, B])."""
    raw = np.ascontiguousarray(np.asarray(raw_ranges, dtype=np.float32))
    t, n = raw.shape
    if pad_to is None:
        # Upper bound: every beam survives.
        pad_to = (n + cfg.beam_skip - 1) // cfg.beam_skip

    lib = load_native()
    if lib is not None:
        angles = np.zeros((t, pad_to), dtype=np.float32)
        radii = np.zeros((t, pad_to), dtype=np.float32)
        mask = np.zeros((t, pad_to), dtype=np.uint8)
        lib.mcl_filter_episode(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, n,
            float(angle_min), float(angle_increment), float(range_min),
            float(range_max), float(cfg.invalid_beam_range),
            float(cfg.angle_crop_deg), int(cfg.beam_skip),
            angles.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            radii.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), pad_to)
        return angles, radii, mask.astype(bool)

    angles = np.zeros((t, pad_to), dtype=np.float32)
    radii = np.zeros((t, pad_to), dtype=np.float32)
    mask = np.zeros((t, pad_to), dtype=bool)
    for k in range(t):
        a, r, mk = filter_scan(raw[k], angle_min, angle_increment,
                               range_min, range_max, cfg, pad_to=pad_to)
        angles[k], radii[k], mask[k] = a, r, mk
    return angles, radii, mask
