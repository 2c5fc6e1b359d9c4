"""Closed-loop episodes: MCL + controllers + plan execution in ONE jit scan.

The reference runs this loop as five ROS processes (sensors -> monte_carlo ->
moveToPosition_server -> PID/wanderer -> diff_drive).  Here the whole control
stack closes through the simulated robot inside a single lax.scan step:

  tick:
    1. LIDAR scan simulated from the ground-truth pose (shared ray caster)
    2. full MCL tick (models/filter.mcl_step)
    3. behavior: wanderer while delocalized (the filter's wanderer_cmd
       events, monte_carlo.cpp:243-246), waypoint-following P-control on the
       MCL pose estimate when confident (goToTargetGlobal,
       moveToPosition_server.cpp:529-606, 0.2 m arrival tolerance)
    4. wheel commands integrate through the diff-drive dynamics; encoders
       feed back into the next MCL tick.

vmap over episode keys turns this into the BASELINE.md closed-loop sweep.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FilterConfig, WandererConfig
from ..control import controllers as C
from ..maps.grid import MazeMap
from ..models import filter as mcl
from ..models import sensor
from . import robot as R


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClosedLoopState:
    robot: R.RobotState
    filt: mcl.MCLState
    wanderer: C.WandererState
    wanderer_on: jax.Array     # bool: latched by the filter's events
    wp_idx: jax.Array          # int32 current waypoint


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClosedLoopOutput:
    true_pose: jax.Array       # [3]
    est_pose: jax.Array        # [3] or sentinel
    confidence: jax.Array
    wp_idx: jax.Array
    wheel_cmd: jax.Array       # [2]


def closed_loop_step(
    state: ClosedLoopState, tick_key, waypoints, m: MazeMap,
    cfg: FilterConfig, scan_angles, wcfg: WandererConfig = WandererConfig(),
    base_speed: float = 10.0, arrival_tol: float = 0.2,
    scan_noise: float = 0.02, sense_m: MazeMap = None,
) -> Tuple[ClosedLoopState, ClosedLoopOutput]:
    angles = jnp.asarray(scan_angles, jnp.float32)
    n_wp = waypoints.shape[0]

    # 1. Sense.  `sense_m` (default: the filter map `m`) is the TRUE world
    # the LIDAR sees — pass a different map to drive on a LEARNED map
    # (mapping/SLAM autonomy loop: plan+localize on the robot's own map,
    # sense the real maze).
    scan = sensor.simulate_scan(m if sense_m is None else sense_m,
                                state.robot.pose, angles, cfg.sensor,
                                key=tick_key, noise_sigma=scan_noise)

    # 2. Localize.
    filt, out = mcl.mcl_step(
        state.filt, state.robot.encoder_left, state.robot.encoder_right,
        scan, m, cfg)
    wanderer_on = jnp.where(
        out.wanderer_cmd == mcl.WANDERER_START, True,
        jnp.where(out.wanderer_cmd == mcl.WANDERER_STOP, False,
                  state.wanderer_on))

    # 3. Behave.
    wp = waypoints[jnp.clip(state.wp_idx, 0, n_wp - 1)]
    est = out.exact_pose
    est_valid = est[0] >= 0
    # Waypoint arrival: |dx|,|dy| <= tol (moveToPosition_server.cpp:581).
    arrived = (est_valid
               & (jnp.abs(est[0] - wp[0]) <= arrival_tol)
               & (jnp.abs(est[1] - wp[1]) <= arrival_tol))
    wp_idx = jnp.where(arrived, jnp.minimum(state.wp_idx + 1, n_wp),
                       state.wp_idx)
    wp_active = wp_idx < n_wp
    wp_next = waypoints[jnp.clip(wp_idx, 0, n_wp - 1)]

    gl, gr, _ = C.global_p_drive(est, wp_next, base_speed)
    wst, (wl, wr) = C.wanderer_tick(
        state.wanderer, scan.ranges, scan.mask,
        jnp.asarray(wanderer_on), wcfg, cfg.tick_dt)
    use_goal = est_valid & ~wanderer_on & wp_active
    left = jnp.where(use_goal, gl, wl)
    right = jnp.where(use_goal, gr, wr)
    left, right = C.clamp_wheels(left, right)

    # 4. Act.
    dl, dr = R.wheel_arcs_from_speeds(left, right, cfg.tick_dt, cfg.motion)
    rb = R.step_dynamics(state.robot, dl, dr, cfg.motion)

    new_state = ClosedLoopState(robot=rb, filt=filt, wanderer=wst,
                                wanderer_on=wanderer_on, wp_idx=wp_idx)
    out2 = ClosedLoopOutput(
        true_pose=rb.pose, est_pose=est, confidence=out.confidence,
        wp_idx=wp_idx, wheel_cmd=jnp.stack([left, right]))
    return new_state, out2


def run_closed_loop(
    key, m: MazeMap, cfg: FilterConfig, waypoints, num_ticks: int,
    scan_angles, start_pose=(1.25, 1.25, 0.0), known_start: bool = False,
    **kw,
) -> Tuple[ClosedLoopState, ClosedLoopOutput]:
    """Full closed-loop episode under lax.scan (jit/vmap-able).

    `known_start=True` initializes the filter TRACKING at start_pose
    (mcl.init_tracking_state) instead of the global uniform cloud — the
    post-SLAM deployment mode (the robot knows where it finished
    mapping); wanderer starts off since the filter is born confident.
    """
    k_init, k_run = jax.random.split(key)
    state = ClosedLoopState(
        robot=R.make_robot(*start_pose),
        filt=(mcl.init_tracking_state(k_init, m, cfg, start_pose)
              if known_start else mcl.init_state(k_init, m, cfg)),
        wanderer=C.wanderer_init(),
        wanderer_on=jnp.bool_(not known_start),
        wp_idx=jnp.int32(0))
    wps = jnp.asarray(waypoints, jnp.float32)
    step = functools.partial(closed_loop_step, waypoints=wps, m=m, cfg=cfg,
                             scan_angles=scan_angles, **kw)
    keys = jax.random.split(k_run, num_ticks)
    return jax.lax.scan(lambda s, k: step(s, k), state, keys)


def mission_waypoints(plan_cells, cell_meters: float = 0.8) -> np.ndarray:
    """Cell path -> world waypoint array (x from col, y from row).

    Thin wrapper over planning/executor.waypoint_targets so the cell-center
    convention lives in one place."""
    from ..planning import executor

    return np.asarray(executor.waypoint_targets(plan_cells, cell_meters),
                      dtype=np.float32)
