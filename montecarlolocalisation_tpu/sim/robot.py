"""Ground-truth robot simulator: diff-drive dynamics + synthetic sensor logs.

Replaces the reference's physical iRobot Create + create_fundamentals driver
(SURVEY.md layer 0) for offline episodes: wheel commands integrate through the
same midpoint diff-drive kinematics the filter assumes
(monte_carlo.cpp:719-739), encoders accumulate radians
(d = delta_ticks * wheel_size * 0.5), and scans come from the shared ray
caster (models/sensor.simulate_scan).  Everything is jit-compiled and
vmappable over episodes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import FilterConfig, MotionModelConfig
from ..maps.grid import MazeMap
from ..models import sensor
from ..models.raycast import raycast
from ..utils.angles import normalize_angle


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotState:
    """Ground-truth pose + cumulative encoder readings (radians)."""

    x: jax.Array
    y: jax.Array
    theta: jax.Array
    encoder_left: jax.Array
    encoder_right: jax.Array

    @property
    def pose(self):
        return jnp.stack([self.x, self.y, self.theta])


def make_robot(x, y, theta) -> RobotState:
    return RobotState(
        x=jnp.float32(x), y=jnp.float32(y), theta=jnp.float32(theta),
        encoder_left=jnp.float32(0.0), encoder_right=jnp.float32(0.0))


def step_dynamics(state: RobotState, d_left, d_right,
                  cfg: MotionModelConfig) -> RobotState:
    """Advance ground truth by per-wheel arc lengths (meters).

    Encoder radians accumulate so that the filter's
    delta_ticks * wheel_size * 0.5 recovers the arcs exactly.
    """
    d_center = 0.5 * (d_left + d_right)
    delta_theta = (d_left - d_right) / cfg.wheel_space
    x = state.x + d_center * jnp.cos(state.theta + 0.5 * delta_theta)
    y = state.y + d_center * jnp.sin(state.theta + 0.5 * delta_theta)
    theta = normalize_angle(state.theta + delta_theta)
    tick = cfg.wheel_size * 0.5
    return RobotState(
        x=x, y=y, theta=theta,
        encoder_left=state.encoder_left + d_left / tick,
        encoder_right=state.encoder_right + d_right / tick)


def wheel_arcs_from_speeds(speed_left, speed_right, dt,
                           cfg: MotionModelConfig):
    """Reference wheel-command units -> arc meters per tick.

    diff_drive speeds are wheel angular velocities in rad/s
    (create_fundamentals convention); arc = omega * dt * wheel_size * 0.5,
    the same kinematics as wanderer_try_final.cpp:63-78.
    """
    k = dt * cfg.wheel_size * 0.5
    return speed_left * k, speed_right * k


def generate_wander_episode(
    key,
    m: MazeMap,
    cfg: FilterConfig,
    scan_angles,
    num_ticks: int,
    start_pose=(1.25, 1.25, 0.0),
    speed: float = 0.04,
    obstacle_stop: float = 0.4,
    turn_ticks: int = 10,
    scan_noise: float = 0.02,
    kidnap_tick=None,
    kidnap_pose=(0.45, 0.45, 0.0),
    dropout_p: float = 0.0,
    outlier_p: float = 0.0,
    moving_obstacle=None,
    slip_noise: float = 0.0,
    explore: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scripted wall-avoiding wander -> (encoders [T,2], scans [T,B], poses [T,3]).

    Drives straight `speed` m/tick; when the forward ray reports an obstacle
    within `obstacle_stop`, rotates in place ~90 degrees over `turn_ticks`
    ticks (mimicking the reference wanderer's stop-and-turn behavior,
    wanderer_try_final.cpp:167-191).  Returns the encoder log, noisy scan
    ranges, and the ground-truth pose trace.

    Robustness stressors: `dropout_p`/`outlier_p` per-beam sensor faults
    (sensor.simulate_scan); `moving_obstacle` = (cx, cy, orbit_radius,
    disc_radius, rad_per_tick) — an UNMAPPED disc circling (cx, cy) that
    the scans see but the map does not (a person walking the maze);
    `slip_noise` — per-tick multiplicative WHEEL SLIP std: the ground
    motion gets arc*(1 + eps) while the encoders record the commanded
    arcs, so dead reckoning drifts away from truth — the actuation noise
    the filter's alpha parameters model (monte_carlo.cpp:1198).  All
    stressors default off and consume no RNG when off (existing episode
    streams are bit-identical).

    `explore=True` replaces the fixed same-direction 90° turn with the
    reference wanderer's freer-side rule (turn toward whichever ±60°
    probe ray reports more open space, wanderer_try_final.cpp's halves
    compare) plus a randomized turn duration — the fixed-turn walk is a
    LIMIT CYCLE (measured: it saturates at ~10 cells by tick 300 and
    orbits a 1 m pocket forever), which starves mapping/SLAM coverage.
    Off by default: existing episode streams stay bit-identical.
    """
    angles = jnp.asarray(scan_angles, jnp.float32)
    mcfg = cfg.motion
    turn_arc = (jnp.pi / 2) * mcfg.wheel_space / (2.0 * turn_ticks)

    def body(carry, xs):
        robot, turning, tsign = carry
        tick, tick_key = xs
        if kidnap_tick is not None:
            # Kidnapped-robot event: teleport the TRUE pose while encoders
            # keep integrating smoothly — the fault the adaptive-injection
            # machinery exists to recover from (SURVEY.md §5).
            kp = jnp.asarray(kidnap_pose, jnp.float32)
            hit = tick == kidnap_tick
            robot = RobotState(
                x=jnp.where(hit, kp[0], robot.x),
                y=jnp.where(hit, kp[1], robot.y),
                theta=jnp.where(hit, kp[2], robot.theta),
                encoder_left=robot.encoder_left,
                encoder_right=robot.encoder_right)
        ahead = raycast(m, robot.x, robot.y, robot.theta, cfg.sensor)
        start_turn = (ahead < obstacle_stop) & (turning == 0)
        if explore:
            # Freer-side turn direction (±60° probe rays) + randomized
            # duration in [turn_ticks/2, 2*turn_ticks] — breaks the
            # fixed-turn limit cycle so coverage keeps growing.
            free_l = raycast(m, robot.x, robot.y,
                             robot.theta + jnp.pi / 3, cfg.sensor)
            free_r = raycast(m, robot.x, robot.y,
                             robot.theta - jnp.pi / 3, cfg.sensor)
            tie = 0.05 * jax.random.normal(jax.random.fold_in(tick_key, 2))
            # tsign +1 raises theta (step_dynamics: (d_l - d_r)/wheel_space)
            # = toward the +60° probe.
            new_sign = jnp.where(free_l + tie > free_r, 1.0, -1.0)
            dur = jax.random.randint(
                jax.random.fold_in(tick_key, 3), (),
                max(turn_ticks // 2, 1), 2 * turn_ticks + 1)
        else:
            new_sign = jnp.float32(1.0)
            dur = jnp.int32(turn_ticks)
        tsign = jnp.where(start_turn, new_sign, tsign)
        turning = jnp.where(start_turn, dur, turning)
        is_turning = turning > 0
        d_left = jnp.where(is_turning, tsign * turn_arc, speed)
        d_right = jnp.where(is_turning, -tsign * turn_arc, speed)
        if slip_noise:
            eps = slip_noise * jax.random.normal(
                jax.random.fold_in(tick_key, 1), (2,))
            enc_l, enc_r = robot.encoder_left, robot.encoder_right
            robot = step_dynamics(robot, d_left * (1.0 + eps[0]),
                                  d_right * (1.0 + eps[1]), mcfg)
            # Encoders record the COMMANDED arcs (the wheel turned as
            # commanded; the ground contact slipped).
            tick_m = mcfg.wheel_size * 0.5
            robot = dataclasses.replace(
                robot, encoder_left=enc_l + d_left / tick_m,
                encoder_right=enc_r + d_right / tick_m)
        else:
            robot = step_dynamics(robot, d_left, d_right, mcfg)
        turning = jnp.maximum(turning - 1, 0)
        obstacle = None
        if moving_obstacle is not None:
            ocx, ocy, orbit_r, disc_r, omega = moving_obstacle
            phase = omega * tick.astype(jnp.float32)
            obstacle = (ocx + orbit_r * jnp.cos(phase),
                        ocy + orbit_r * jnp.sin(phase), disc_r)
        scan = sensor.simulate_scan(
            m, robot.pose, angles, cfg.sensor, key=tick_key,
            noise_sigma=scan_noise, dropout_p=dropout_p,
            outlier_p=outlier_p, obstacle=obstacle)
        enc = jnp.stack([robot.encoder_left, robot.encoder_right])
        return (robot, turning, tsign), (enc, scan.ranges, robot.pose)

    robot0 = make_robot(*start_pose)
    keys = jax.random.split(key, num_ticks)
    ticks = jnp.arange(num_ticks, dtype=jnp.int32)
    (_, _, _), (encoders, ranges, poses) = jax.lax.scan(
        body, (robot0, jnp.int32(0), jnp.float32(1.0)), (ticks, keys))
    return encoders, ranges, poses
