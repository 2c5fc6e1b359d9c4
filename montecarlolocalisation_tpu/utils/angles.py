"""Angle helpers shared across the stack (jit-safe, work on arrays)."""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def wrap_to_2pi(angle):
    """[0, 2pi) wrap (reference: monte_carlo.cpp:951-957 wrapTo2Pi)."""
    wrapped = jnp.mod(angle, TWO_PI)
    return jnp.where(wrapped < 0, wrapped + TWO_PI, wrapped)


def normalize_angle(angle):
    """(-pi, pi] wrap via atan2 (reference idiom, e.g. monte_carlo.cpp:549)."""
    return jnp.arctan2(jnp.sin(angle), jnp.cos(angle))


def quantize_orientation(theta):
    """45-degree-banded orientation quantizer.

    Reference: monte_carlo.cpp:981-994 (publishPosMsg).
    [45,135) -> DOWN(3); [135,225) -> LEFT(2); [225,315) -> UP(1); else RIGHT(0).
    """
    deg = wrap_to_2pi(theta) * (180.0 / jnp.pi)
    down = (deg >= 45.0) & (deg < 135.0)
    left = (deg >= 135.0) & (deg < 225.0)
    up = (deg >= 225.0) & (deg < 315.0)
    return jnp.where(down, 3, jnp.where(left, 2, jnp.where(up, 1, 0))).astype(jnp.int32)


def yaw_to_quaternion_z(theta):
    """Yaw -> quaternion z-component, sin(theta / 2).

    Analog of the ExactPose.thetaQuaternion field (msg/ExactPose.msg): a
    single float carrying the yaw in quaternion form (the z component of
    the pure-yaw quaternion [0, 0, sin(t/2), cos(t/2)]; w is recoverable
    as cos(t/2) up to the sign convention).  Note the reference DECLARES
    the field but never assigns it (publishExactPose,
    monte_carlo.cpp:995-1004 — "In quaternion sollte radiants sein"), so
    it is always 0.0 on the wire there; here it is actually populated.
    """
    return jnp.sin(0.5 * theta)


def circular_mean(theta, weights=None, axis=None):
    """Mean angle via sin/cos sums (reference: monte_carlo.cpp:925-934)."""
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    if weights is not None:
        s = s * weights
        c = c * weights
    return jnp.arctan2(jnp.sum(s, axis=axis), jnp.sum(c, axis=axis))
