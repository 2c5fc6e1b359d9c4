"""Odometry / motion model: diff-drive dead reckoning + rot1-trans-rot2 noise.

Reference: monte_carlo.cpp:695-761.
  * diffDriveModel (:719-739): per-wheel arc d = delta_ticks * wheel_size * 0.5,
    d_center = mean, delta_theta = (d_L - d_R) / wheel_space, midpoint-heading
    pose integration; theta wrapped via atan2(sin, cos).
  * sampleMotionModelOdometry (:695-715): decompose (prev -> cur) into
    rot1 = atan2(dy, dx) - theta_prev, trans = hypot, rot2 = dtheta - rot1;
    perturb each with zero-mean Gaussians whose VARIANCE is
    alpha_1*|rot| + alpha_2*trans (rotations) and
    alpha_3*trans + alpha_4*(|rot1|+|rot2|) (translation).
  * updateParticlePos (:740-755): x += trans*cos(theta+rot1),
    y += trans*sin(theta+rot1), theta += rot1 + rot2.  The reference applies
    ONE shared noisy triple to all particles; per-particle noise is the
    statistically correct option (cfg.shared_noise=False).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MotionModelConfig
from ..utils.angles import normalize_angle


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OdometryState:
    """Dead-reckoned robot pose + last-seen encoder values (radians)."""

    x: jax.Array
    y: jax.Array
    theta: jax.Array
    encoder_left: jax.Array
    encoder_right: jax.Array

    @staticmethod
    def zero() -> "OdometryState":
        z = jnp.float32(0.0)
        return OdometryState(x=z, y=z, theta=z, encoder_left=z, encoder_right=z)


def diff_drive_update(
    state: OdometryState, encoder_left, encoder_right, cfg: MotionModelConfig
) -> Tuple[OdometryState, jax.Array, jax.Array, jax.Array]:
    """Integrate encoders -> new odometry state + noise-free (rot1,trans,rot2).

    Mirrors diffDriveModel + the decomposition part of
    sampleMotionModelOdometry (monte_carlo.cpp:695-739).
    """
    d_left = (encoder_left - state.encoder_left) * cfg.wheel_size * 0.5
    d_right = (encoder_right - state.encoder_right) * cfg.wheel_size * 0.5
    d_center = 0.5 * (d_left + d_right)
    delta_theta = (d_left - d_right) / cfg.wheel_space
    theta = state.theta + delta_theta
    x = state.x + d_center * jnp.cos(state.theta + 0.5 * delta_theta)
    y = state.y + d_center * jnp.sin(state.theta + 0.5 * delta_theta)
    new = OdometryState(
        x=x, y=y, theta=normalize_angle(theta),
        encoder_left=jnp.asarray(encoder_left, jnp.float32),
        encoder_right=jnp.asarray(encoder_right, jnp.float32),
    )
    rot1 = jnp.arctan2(y - state.y, x - state.x) - state.theta
    trans = jnp.sqrt((y - state.y) ** 2 + (x - state.x) ** 2)
    rot2 = new.theta - state.theta - rot1
    return new, rot1, trans, rot2


def sample_motion_noise(key, rot1, trans, rot2, cfg: MotionModelConfig,
                        shape=()):
    """Noisy (rot1, trans, rot2) per sampleMotionModelOdometry.

    `shape` broadcasts to per-particle noise when cfg.shared_noise is False.
    The alphas parameterize VARIANCE (the reference samples with
    std = sqrt(alpha-combination), monte_carlo.cpp:410-414).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    var_r1 = cfg.alpha_1 * jnp.abs(rot1) + cfg.alpha_2 * trans
    var_tr = cfg.alpha_3 * trans + cfg.alpha_4 * (jnp.abs(rot1) + jnp.abs(rot2))
    var_r2 = cfg.alpha_1 * jnp.abs(rot2) + cfg.alpha_2 * trans
    n_rot1 = rot1 + jnp.sqrt(var_r1) * jax.random.normal(k1, shape)
    n_trans = trans + jnp.sqrt(var_tr) * jax.random.normal(k2, shape)
    n_rot2 = rot2 + jnp.sqrt(var_r2) * jax.random.normal(k3, shape)
    return n_rot1, n_trans, n_rot2


def propagate_particles(particles, rot1, trans, rot2):
    """updateParticlePos (monte_carlo.cpp:740-755): vectorized propagation.

    particles: [N, 3]; rot1/trans/rot2 scalars (shared) or [N] (per-particle).
    NOTE: theta is NOT re-wrapped here, matching the reference (it only wraps
    at resampling via atan2).
    """
    theta = particles[..., 2]
    moved = theta + rot1
    dx = trans * jnp.cos(moved)
    dy = trans * jnp.sin(moved)
    return jnp.stack(
        [particles[..., 0] + dx, particles[..., 1] + dy, theta + rot1 + rot2],
        axis=-1,
    )


def motion_update(key, particles, state: OdometryState, encoder_left,
                  encoder_right, cfg: MotionModelConfig):
    """One full odometry tick: integrate encoders, sample noise, propagate.

    Returns (new_odometry_state, new_particles).
    """
    new_state, rot1, trans, rot2 = diff_drive_update(
        state, encoder_left, encoder_right, cfg)
    shape = () if cfg.shared_noise else particles.shape[:-1]
    n_rot1, n_trans, n_rot2 = sample_motion_noise(
        key, rot1, trans, rot2, cfg, shape)
    return new_state, propagate_particles(particles, n_rot1, n_trans, n_rot2)
