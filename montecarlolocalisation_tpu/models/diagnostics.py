"""Auxiliary estimators & diagnostics from the reference's variant files.

The reference carries several alternative confidence/estimation routines in
monte_carlo.cpp and the experimental sandbox playground.cpp (not built into
the catkin package but part of the project's algorithm surface — SURVEY.md
§2.1).  All are vectorized here:

  * weighted-mean pose      — estimateWeightedPose (monte_carlo.cpp:782-800,
                              defined but never called in the reference)
  * pairwise-density lost detector — playground.cpp:745-774 (O(N^2)
                              neighbor counting; here blocked matmul-style)
  * max-weight-particle confidence — localisationConfinent
                              (playground.cpp:812-855)
  * Bresenham line-of-sight — isPathValid (playground.cpp:288-320)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maps.grid import MazeMap, world_to_map, get_cell
from ..utils.angles import circular_mean


def weighted_mean_pose(particles, weights):
    """Weight-averaged (x, y) + circular-mean theta
    (monte_carlo.cpp:782-800)."""
    w = weights / jnp.maximum(jnp.sum(weights), 1e-30)
    x = jnp.sum(w * particles[:, 0])
    y = jnp.sum(w * particles[:, 1])
    theta = circular_mean(particles[:, 2], weights=w)
    return jnp.stack([x, y, theta])


def pairwise_density_ratio(particles, radius: float = 0.4,
                           block: int = 1024):
    """Fraction of particle pairs within `radius` — the sandbox's O(N^2)
    density-based lost detector (playground.cpp:745-774), computed in
    blocks so 100k+ particles don't materialize an [N, N] matrix."""
    xy = particles[:, :2]
    n = xy.shape[0]
    r2 = radius * radius
    pad = (-n) % block
    xyp = jnp.pad(xy, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad))
    nb = xyp.shape[0] // block
    blocks = xyp.reshape(nb, block, 2)
    vblocks = valid.reshape(nb, block)

    def count_vs_all(carry, i):
        q = blocks[i]          # [block, 2]
        qv = vblocks[i]
        d2 = jnp.sum((q[:, None, :] - xyp[None, :, :]) ** 2, axis=-1)
        c = jnp.sum((d2 <= r2) * valid[None, :] * qv[:, None])
        return carry + c, None

    total, _ = jax.lax.scan(count_vs_all, jnp.float32(0.0),
                            jnp.arange(nb))
    return total / (jnp.float32(n) * n)


def max_weight_confidence(particles, weights, radius: float = 0.4):
    """Confidence around the single max-weight particle
    (playground.cpp:812-855 localisationConfinent): fraction of particles
    within `radius` of it; returns (ratio, best_particle_pose)."""
    best = jnp.argmax(weights)
    bx, by = particles[best, 0], particles[best, 1]
    d2 = (particles[:, 0] - bx) ** 2 + (particles[:, 1] - by) ** 2
    ratio = jnp.mean((d2 <= radius * radius).astype(jnp.float32))
    return ratio, particles[best]


def bresenham_path_valid(m: MazeMap, x0, y0, x1, y1, max_steps: int = 128):
    """Integer Bresenham line-of-sight between two world points
    (playground.cpp:288-320 isPathValid): True when no wall pixel lies on
    the pixel line.  Bounded-iteration; vectorizes over broadcast inputs."""
    ax, ay, a_in = world_to_map(m, jnp.asarray(x0, jnp.float32),
                                jnp.asarray(y0, jnp.float32))
    bx, by, b_in = world_to_map(m, jnp.asarray(x1, jnp.float32),
                                jnp.asarray(y1, jnp.float32))
    dx = jnp.abs(bx - ax)
    dy = -jnp.abs(by - ay)
    sx = jnp.where(ax < bx, 1, -1)
    sy = jnp.where(ay < by, 1, -1)

    def body(_, carry):
        cx, cy, err, blocked, done = carry
        blocked = blocked | get_cell(m, cx, cy)
        done = done | ((cx == bx) & (cy == by))
        e2 = 2 * err
        step_x = (e2 >= dy) & ~done
        step_y = (e2 <= dx) & ~done
        err = err + jnp.where(step_x, dy, 0) + jnp.where(step_y, dx, 0)
        cx = cx + jnp.where(step_x, sx, 0)
        cy = cy + jnp.where(step_y, sy, 0)
        return cx, cy, err, blocked, done

    init = (ax, ay, dx + dy, jnp.zeros_like(a_in), jnp.zeros_like(a_in))
    _, _, _, blocked, done = jax.lax.fori_loop(0, max_steps, body, init)
    return a_in & b_in & done & ~blocked
