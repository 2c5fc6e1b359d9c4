"""End-to-end wall alignment in simulation: the align_call service flow.

Reference flow (align_server.cpp laserCallback + align:758-798): scan ->
RANSAC lines -> faceWall/driveFromWall timed motions.  Here the same
pipeline closes through the simulated dynamics: simulate a full-circle
scan from the true pose, extract walls, build the AlignPlan, and execute
its rotate/drive actions tick by tick.

Host-driven (the service is a one-shot behavior, not the filter hot loop).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlignConfig, FilterConfig
from ..control import align, timed
from ..maps.grid import MazeMap
from ..models import sensor
from . import robot as R


def full_circle_scan(m: MazeMap, pose, cfg: FilterConfig, n_beams: int = 360):
    """Simulate a 360-degree scan and return robot-frame points.

    simulate_scan casts beam a along world angle theta - a (the reference's
    negated-mount convention), so the return lies at robot-frame angle -a:
    convert with negated angles to stay in the physical robot frame.
    """
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False).astype(
        np.float32)
    scan = sensor.simulate_scan(m, pose, angles, cfg.sensor)
    r = np.asarray(scan.ranges)
    # Returns at max_range are non-returns for RANSAC purposes.
    mask = r < cfg.sensor.max_range - 1e-4
    px = r * np.cos(-angles)
    py = r * np.sin(-angles)
    return px, py, mask


def run_align(key, m: MazeMap, cfg: FilterConfig, start_pose,
              acfg: AlignConfig = AlignConfig(), dt: float = 0.1,
              max_ticks_per_action: int = 400
              ) -> Tuple[R.RobotState, List[align.AlignAction]]:
    """Full align service: returns (final robot state, executed plan)."""
    rb = R.make_robot(*start_pose)
    px, py, mask = full_circle_scan(m, rb.pose, cfg)
    lines = align.ransac_extract(key, jnp.asarray(px), jnp.asarray(py),
                                 mask, acfg)
    if len(lines) < 2:
        return rb, []
    plan = align.align_plan(lines[0], lines[1], acfg)
    for act in plan:
        if act.kind == "rotate":
            st = timed.start_rotate(np.deg2rad(act.value), abs(act.speed),
                                    dt, cfg.motion)
        else:
            st = timed.start_drive(act.value, act.speed, dt, cfg.motion)
        for _ in range(max_ticks_per_action):
            if bool(timed.is_done(st)):
                break
            st, (wl, wr), _ = timed.timed_tick(st)
            dl, dr = R.wheel_arcs_from_speeds(wl, wr, dt, cfg.motion)
            rb = R.step_dynamics(rb, dl, dr, cfg.motion)
    return rb, plan
