"""Differentiable calibration: fit physical parameters from recorded logs.

A capability the reference stack cannot express: its geometry and sensor
constants (wheel_size / wheel_space, PID_lib.hpp:19-20; sensor sigma,
monte_carlo.cpp:180) are hand-tuned compile-time numbers.  Here the motion
and sensor models are pure JAX functions, so the same code the filter runs
is differentiable end-to-end — calibration is just gradient descent:

  * fit_motion_params — dead-reckon an encoder log through
    models/motion.diff_drive_update under trial (wheel_size, wheel_space)
    and descend the pose error against ground truth (or any independent
    pose source, e.g. a motion-capture rig).
  * fit_sensor_sigma — maximize the beam-mixture log-likelihood
    (monte_carlo.cpp:623-682's model, smooth in sigma) of recorded scans
    at known poses.  Expected ranges depend only on the poses/map, so the
    ray caster runs ONCE outside the optimization loop.

Both run entirely on-device (optax + lax.scan epochs) and vmap over
episodes.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import MotionModelConfig, SensorModelConfig
from ..maps.grid import MazeMap
from . import motion, sensor


def integrate_odometry(encoders, start_pose, cfg: MotionModelConfig,
                       wheel_size=None, wheel_space=None):
    """Dead-reckon an encoder log [T, 2] -> poses [T, 3].

    wheel_size/wheel_space override cfg (traceable, so gradients flow).
    """
    ws = cfg.wheel_size if wheel_size is None else wheel_size
    wsp = cfg.wheel_space if wheel_space is None else wheel_space
    # Trace the trial parameters through the SAME update the filter uses
    # (frozen dataclasses carry traced leaves fine — only arithmetic
    # touches them in diff_drive_update).
    traced_cfg = dataclasses.replace(cfg, wheel_size=ws, wheel_space=wsp)
    start_pose = jnp.asarray(start_pose, jnp.float32)
    state0 = motion.OdometryState(
        x=start_pose[0], y=start_pose[1], theta=start_pose[2],
        encoder_left=jnp.float32(0.0), encoder_right=jnp.float32(0.0))

    def step(st, enc):
        new, _, _, _ = motion.diff_drive_update(st, enc[0], enc[1],
                                                traced_cfg)
        return new, jnp.stack([new.x, new.y, new.theta])

    _, poses = jax.lax.scan(step, state0, jnp.asarray(encoders, jnp.float32))
    return poses


def _pose_loss(pred, truth):
    """xy MSE + angular (1 - cos) error, both in comparable units."""
    dxy = jnp.mean((pred[:, :2] - truth[:, :2]) ** 2)
    dth = jnp.mean(1.0 - jnp.cos(pred[:, 2] - truth[:, 2]))
    return dxy + 0.1 * dth


def fit_motion_params(
    encoders, true_poses, cfg: MotionModelConfig = MotionModelConfig(),
    init: Optional[Dict[str, float]] = None, steps: int = 400,
    lr: float = 3e-3, start_poses=None,
) -> Dict[str, jax.Array]:
    """Recover (wheel_size, wheel_space) from encoder + ground-truth logs.

    encoders [T, 2] (or [E, T, 2] for an episode batch), true_poses
    [T, 3] / [E, T, 3].  `start_poses` ([3] / [E, 3]) anchors the
    integration; it defaults to true_poses[0], which lags the real start
    by one tick (a small bias — pass the true start when known).
    Returns {"wheel_size", "wheel_space", "loss"}.  Parameters are
    log-space so positivity is structural.
    """
    import optax

    enc = jnp.asarray(encoders, jnp.float32)
    truth = jnp.asarray(true_poses, jnp.float32)
    if enc.ndim == 2:
        enc, truth = enc[None], truth[None]
        if start_poses is not None:
            start_poses = jnp.asarray(start_poses, jnp.float32)[None]
    starts = (truth[:, 0] if start_poses is None
              else jnp.asarray(start_poses, jnp.float32))
    init = init or {}
    params = {
        "log_ws": jnp.log(jnp.float32(init.get("wheel_size",
                                               cfg.wheel_size))),
        "log_wsp": jnp.log(jnp.float32(init.get("wheel_space",
                                                cfg.wheel_space))),
    }

    def loss_fn(p):
        ws = jnp.exp(p["log_ws"])
        wsp = jnp.exp(p["log_wsp"])
        pred = jax.vmap(
            lambda e, t0: integrate_odometry(e, t0, cfg, ws, wsp)
        )(enc, starts)
        return jax.vmap(_pose_loss)(pred, truth).mean()

    opt = optax.adam(lr)

    @jax.jit
    def run(params):
        state = opt.init(params)

        def epoch(carry, _):
            params, state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, state = opt.update(grads, state)
            params = optax.apply_updates(params, updates)
            return (params, state), loss

        (params, _), losses = jax.lax.scan(
            epoch, (params, state), None, length=steps)
        return params, losses

    params, losses = run(params)
    return {
        "wheel_size": jnp.exp(params["log_ws"]),
        "wheel_space": jnp.exp(params["log_wsp"]),
        "loss": losses[-1],
    }


def fit_sensor_sigma(
    m: MazeMap, poses, scan_ranges, scan_angles,
    cfg: SensorModelConfig = SensorModelConfig(),
    init_sigma: Optional[float] = None, steps: int = 300, lr: float = 5e-2,
) -> Dict[str, jax.Array]:
    """Max-likelihood sigma of the beam mixture from scans at known poses.

    poses [T, 3], scan_ranges [T, B], scan_angles [B].  The mixture is the
    filter's own per-beam model (w_hit * TruncGauss_sigma + w_rand * rand,
    monte_carlo.cpp:663-672) with a flat floor so far-outlier beams stay
    finite; expected ranges are ray-cast once up front (independent of
    sigma).  Returns {"sigma", "loss"}.
    """
    import optax

    poses = jnp.asarray(poses, jnp.float32)
    observed = jnp.asarray(scan_ranges, jnp.float32)
    expected = sensor.expected_ranges(
        m, poses, jnp.asarray(scan_angles, jnp.float32), cfg)  # [T, B]
    diff = jnp.abs(observed - expected)
    in_window = diff <= cfg.gauss_max_diff
    p_rand = (jnp.abs(observed - cfg.max_range)
              < cfg.rand_window).astype(jnp.float32)
    # Censoring mask: ranges clip to [0, max_range], so saturated beams
    # pile exact-zero diffs at the boundary and bias the MLE low.  Fit on
    # interior beams only (the uncensored half of a boundary Gaussian is
    # still sigma-unbiased through |diff|).
    valid = ((observed > 1e-6) & (observed < cfg.max_range - 1e-6)
             ).astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)

    def nll(log_sigma):
        s = jnp.exp(log_sigma)
        gauss = jnp.where(
            in_window,
            jnp.exp(-(diff * diff) / (2.0 * s * s))
            / (s * math.sqrt(2.0 * math.pi)),
            0.0)
        lik = cfg.w_hit * gauss + cfg.w_rand * p_rand
        return -jnp.sum(jnp.log(lik + 1e-3) * valid) / n_valid

    log_sigma = jnp.log(jnp.float32(init_sigma if init_sigma is not None
                                    else cfg.sigma))
    opt = optax.adam(lr)

    @jax.jit
    def run(log_sigma):
        state = opt.init(log_sigma)

        def epoch(carry, _):
            ls, state = carry
            loss, g = jax.value_and_grad(nll)(ls)
            updates, state = opt.update(g, state)
            ls = optax.apply_updates(ls, updates)
            return (ls, state), loss

        (ls, _), losses = jax.lax.scan(
            epoch, (log_sigma, state), None, length=steps)
        return ls, losses

    log_sigma, losses = run(log_sigma)
    return {"sigma": jnp.exp(log_sigma), "loss": losses[-1]}
