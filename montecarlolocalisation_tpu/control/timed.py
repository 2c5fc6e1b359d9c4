"""Timed open-loop motion primitives (rotate_degree / drive_distance).

Reference: wanderer_try_final.cpp:63-124 (also linked into PID/align/
execute_plan as `wanderer_lib`): rotation/drive durations derive from the
wheel kinematics omega = speed * (wheel_size/2) / (wheel_space/2) and
v = speed * wheel_size/2; the reference then BLOCKS in ros::Duration sleeps.
Here each primitive is a tick-counted command stream suitable for lax.scan.

drive_distance carries the obstacle abort of execute_plan_server.cpp:375-439
with the INTENDED min-range semantics.  (The reference's wandererThreshold1
at :358-368 actually compares `laser_data.size()/2` — the beam COUNT — to
the 0.2 m threshold, so its abort can never fire on a real scan; a
preserved-bug mode is available via `count_bug_compat=True`.)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MotionModelConfig

SONG_ABORT = 1  # failure song played on abort (execute_plan_server.cpp:404)


def rotate_ticks(angle_rad: float, speed: float, dt: float = 0.1,
                 cfg: MotionModelConfig = MotionModelConfig()) -> int:
    """Number of ticks for a timed in-place rotation
    (calculate_rotate_time, wanderer_try_final.cpp:63-72)."""
    omega = speed * (cfg.wheel_size / 2.0) / (cfg.wheel_space / 2.0)
    if omega == 0:
        return 0
    return max(int(math.ceil(abs(angle_rad) / omega / dt)), 0)


def drive_ticks(distance_m: float, speed: float, dt: float = 0.1,
                cfg: MotionModelConfig = MotionModelConfig()) -> int:
    """Ticks for a timed straight drive (calculate_drive_time :74-78)."""
    v = abs(speed) * cfg.wheel_size / 2.0
    if v == 0:
        return 0
    return max(int(math.ceil(abs(distance_m) / v / dt)), 0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TimedState:
    ticks_left: jax.Array   # int32
    aborted: jax.Array      # bool
    wheel_left: jax.Array
    wheel_right: jax.Array


def start_rotate(angle_rad: float, speed: float, dt: float = 0.1,
                 cfg: MotionModelConfig = MotionModelConfig()) -> TimedState:
    """Rotation command: positive angle turns 'right' (dL=+, dR=-),
    matching rotate_radian's Direction handling (:81-112)."""
    n = rotate_ticks(angle_rad, speed, dt, cfg)
    s = speed if angle_rad >= 0 else -speed
    return TimedState(ticks_left=jnp.int32(n), aborted=jnp.bool_(False),
                      wheel_left=jnp.float32(s), wheel_right=jnp.float32(-s))


def start_drive(distance_m: float, speed: float, dt: float = 0.1,
                cfg: MotionModelConfig = MotionModelConfig()) -> TimedState:
    """Straight drive; negative speed backs up (driveFromWall uses -5)."""
    n = drive_ticks(distance_m, speed, dt, cfg)
    return TimedState(ticks_left=jnp.int32(n), aborted=jnp.bool_(False),
                      wheel_left=jnp.float32(speed),
                      wheel_right=jnp.float32(speed))


def timed_tick(st: TimedState, scan_ranges=None, scan_mask=None,
               abort_range: float = 0.2,
               count_bug_compat: bool = False
               ) -> Tuple[TimedState, Tuple[jax.Array, jax.Array],
                          jax.Array]:
    """One tick -> (state, (wheel_l, wheel_r), song_event).

    The laser abort stops the drive and emits the failure song
    (execute_plan_server.cpp:398-411).
    """
    active = (st.ticks_left > 0) & ~st.aborted
    abort = jnp.bool_(False)
    if scan_ranges is not None:
        if count_bug_compat:
            # Preserved reference bug: 'min_range' = beam count / 2.
            metric = jnp.float32(scan_ranges.shape[-1] // 2)
        else:
            big = jnp.float32(9.99)
            r = scan_ranges if scan_mask is None else jnp.where(
                scan_mask, scan_ranges, big)
            metric = jnp.min(r)
        abort = active & (metric <= abort_range)
    aborted = st.aborted | abort
    run = active & ~abort
    left = jnp.where(run, st.wheel_left, 0.0)
    right = jnp.where(run, st.wheel_right, 0.0)
    ticks = jnp.where(run, st.ticks_left - 1, st.ticks_left)
    song = jnp.where(abort, SONG_ABORT, 0).astype(jnp.int32)
    return (TimedState(ticks_left=ticks, aborted=aborted,
                       wheel_left=st.wheel_left,
                       wheel_right=st.wheel_right),
            (left, right), song)


def is_done(st: TimedState):
    return (st.ticks_left <= 0) | st.aborted
