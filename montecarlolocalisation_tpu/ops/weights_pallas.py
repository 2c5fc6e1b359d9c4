"""Fused Pallas TPU kernel: ray-march beam likelihood for the whole tile.

This is the hot op of the framework (SURVEY.md §7 stage 7): per particle x
beam, march the ray in fixed 0.1 m steps against the occupancy raster and
accumulate the reference likelihood (monte_carlo.cpp:623-682), all in one
kernel.

Why a kernel: the pure-XLA one-hot-matmul formulation materializes
[N*B, 49]-sized one-hots in HBM every march step (~100 GB of traffic per
1M-particle step measured).  Here each particle tile stays resident in VMEM:
one-hots are built in registers/VMEM, contracted on the MXU against the
VMEM-resident padded raster, and only the weight tile is written back.  Map
lookups use the one-hot trick because TPU has no per-lane gather.

Semantics match models/sensor.beam_weights with ray_mode="fixed" exactly
(same trunc-toward-zero worldToMap, same masked-min first-hit, same
truncated-Gaussian + random-hit mixture, same dilated-raster validity).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SensorModelConfig
from ..maps.grid import MazeMap

# Tile of particles per grid step; laid out as (4, 128) f32 rows.
TILE = 512


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def pad_map_table(table: np.ndarray) -> np.ndarray:
    """Pad a [H, W] 0/1 table to MXU-friendly (mult-16, mult-128) f32."""
    h, w = table.shape
    t = np.zeros((_round_up(h, 16), _round_up(w, 128)), dtype=np.float32)
    t[:h, :w] = np.asarray(table, dtype=np.float32)
    return t


def _weights_kernel(x_ref, y_ref, th_ref, ang_ref, obs_ref, msk_ref,
                    occ_ref, dil_ref, out_ref, *, cfg: SensorModelConfig,
                    num_beams: int, geom: tuple, h_pad: int, w_pad: int):
    (res, origin_x, origin_y, extent_x, extent_y) = geom
    x = x_ref[0, :]          # [TILE]
    y = y_ref[0, :]
    th = th_ref[0, :]
    inv_res = 1.0 / res

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, h_pad), 1)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, w_pad), 1)

    def lookup(table_ref, my, mx):
        """table[my, mx] via two-stage one-hot contraction; False outside
        (out-of-range indices make all-zero one-hots)."""
        rowoh = (my[:, None] == rows_i).astype(jnp.bfloat16)
        coloh = (mx[:, None] == cols_i).astype(jnp.float32)
        rows = jnp.dot(rowoh, table_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)  # [TILE, w_pad]
        return jnp.sum(rows * coloh, axis=-1) > 0.5

    def to_px(wx, wy):
        # C++ static_cast<int> truncation (worldToMap, monte_carlo.cpp:305).
        mx = ((wx - origin_x) * inv_res).astype(jnp.int32)
        my = ((wy - origin_y) * inv_res).astype(jnp.int32)
        return mx, my

    # Ray origin: laser_offset ahead of the pose (monte_carlo.cpp:643-645).
    ox = x + cfg.laser_offset * jnp.cos(th)
    oy = y + cfg.laser_offset * jnp.sin(th)
    sign = -1.0 if cfg.negate_beam_angle else 1.0

    sigma = cfg.sigma
    denom = 1.0 / (sigma * math.sqrt(2.0 * math.pi))
    prob = jnp.zeros((TILE,), jnp.float32)

    for b in range(num_beams):
        beam_angle = ang_ref[b]
        obs = obs_ref[b]
        bmask = msk_ref[b]
        ray = th + sign * beam_angle
        dx = jnp.cos(ray)
        dy = jnp.sin(ray)
        dist = jnp.full((TILE,), cfg.max_range, jnp.float32)
        for s in range(cfg.num_ray_steps):
            r = cfg.ray_step * s
            mx, my = to_px(ox + r * dx, oy + r * dy)
            hit = lookup(occ_ref, my, mx)
            dist = jnp.minimum(dist, jnp.where(hit, r, cfg.max_range))
        diff = jnp.abs(obs - dist)
        gauss = jnp.where(
            diff <= cfg.gauss_max_diff,
            jnp.exp(-(diff * diff) / (2.0 * sigma * sigma)) * denom, 0.0)
        p_rand = jnp.where(jnp.abs(obs - cfg.max_range) < cfg.rand_window,
                           1.0, 0.0)
        prob = prob + bmask * (cfg.w_hit * gauss + cfg.w_rand * p_rand)

    # Validity: dilated-raster lookup + world-extent bounds (isValidPos).
    pmx, pmy = to_px(x, y)
    invalid = lookup(dil_ref, pmy, pmx)
    inside = ((x >= origin_x) & (x < extent_x)
              & (y >= origin_y) & (y < extent_y))
    out_ref[0, :] = jnp.where(inside & ~invalid, prob, 0.0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "geom", "num_beams", "interpret"))
def _beam_weights_call(x, y, th, angles, ranges, mask, occ_pad, dil_pad,
                       geom, num_beams: int, cfg: SensorModelConfig,
                       interpret: bool):
    grid = x.shape[0] // TILE
    h_pad, w_pad = occ_pad.shape
    x = x.reshape(grid, TILE)
    y = y.reshape(grid, TILE)
    th = th.reshape(grid, TILE)
    kernel = functools.partial(
        _weights_kernel, cfg=cfg, num_beams=num_beams, geom=geom,
        h_pad=h_pad, w_pad=w_pad)
    row_spec = pl.BlockSpec((1, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid, TILE), jnp.float32),
        grid=(grid,),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),   # angles [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ranges [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mask [B]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # occ padded
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dil padded
        ],
        out_specs=row_spec,
        interpret=interpret,
    )(x, y, th, angles, ranges, mask, occ_pad, dil_pad)
    return out.reshape(grid * TILE)


def beam_weights_pallas(m: MazeMap, particles, scan, cfg: SensorModelConfig,
                        interpret: bool = False):
    """Drop-in for sensor.beam_weights (fixed ray mode, offset==resolution).

    Pads the particle count up to a TILE multiple internally.
    """
    n = particles.shape[0]
    pad = (-n) % TILE
    x = jnp.pad(particles[:, 0], (0, pad))
    y = jnp.pad(particles[:, 1], (0, pad))
    th = jnp.pad(particles[:, 2], (0, pad))
    geom = (float(m.resolution), float(m.origin_x), float(m.origin_y),
            float(m.extent_x), float(m.extent_y))
    w = _beam_weights_call(
        x, y, th, jnp.asarray(scan.angles, jnp.float32),
        jnp.asarray(scan.ranges, jnp.float32),
        jnp.asarray(scan.mask, jnp.float32),
        m.occ_pad, m.dil_pad, geom, int(scan.angles.shape[0]), cfg,
        interpret)
    return w[:n]
