"""Fused Pallas TPU kernel: ray-march beam likelihood, gather-free.

The hot op of the framework (SURVEY.md §7 stage 7): per particle x beam,
march the ray in fixed 0.1 m steps against the occupancy raster and
accumulate the reference likelihood (monte_carlo.cpp:623-682) — one kernel,
one HBM read of the particle tile, one HBM write of the weight tile.

TPU has no per-lane gather, so map lookups use the same bit-packed
select-chain trick as ops/bitlookup (raster rows baked into the program as
scalar constants), which is pure element-wise VPU work and needs no MXU or
scratch: every tile stays entirely in registers/VMEM.

Matches models/sensor.beam_weights (ray_mode="fixed") exactly: trunc
worldToMap, masked-min first hit, truncated-Gaussian + random-hit mixture,
dilated-raster validity, world-extent bounds.
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
from .bitlookup import MapBitTables, is_concrete_map, make_bit_lookup

# Particles per grid tile: (8, 128) f32 rows.
TILE_SUB = 8
TILE_LANE = 128
TILE = TILE_SUB * TILE_LANE  # 1024


def _weights_kernel(x_ref, y_ref, th_ref, ang_ref, obs_ref, msk_ref,
                    out_ref, *, cfg: SensorModelConfig, num_beams: int,
                    geom: tuple, occ_lookup, dil_lookup):
    (res, origin_x, origin_y, extent_x, extent_y) = geom
    x = x_ref[0]            # [8, 128]
    y = y_ref[0]
    th = th_ref[0]
    inv_res = 1.0 / res

    def to_px(wx, wy):
        # C++ static_cast<int> truncation (worldToMap, monte_carlo.cpp:305).
        mx = ((wx - origin_x) * inv_res).astype(jnp.int32)
        my = ((wy - origin_y) * inv_res).astype(jnp.int32)
        return mx, my

    ox = x + cfg.laser_offset * jnp.cos(th)
    oy = y + cfg.laser_offset * jnp.sin(th)
    sign = -1.0 if cfg.negate_beam_angle else 1.0
    sigma = cfg.sigma
    denom = 1.0 / (sigma * math.sqrt(2.0 * math.pi))

    # Beam loop as fori_loop with dynamic SMEM reads: unrolling B beams
    # multiplies the (already ~1k-op) select-chain body and blows up Mosaic
    # compile time (observed 20+ min at B=34).  March steps stay unrolled.
    def beam_body(b, prob):
        beam_angle = ang_ref[b]
        obs = obs_ref[b]
        bmask = msk_ref[b]
        ray = th + sign * beam_angle
        dx = jnp.cos(ray)
        dy = jnp.sin(ray)
        dist = jnp.full_like(x, cfg.max_range)
        # `alive` reproduces the reference's break at the first out-of-map
        # sample (worldToMap failure, monte_carlo.cpp:374).  Lower bounds
        # use the truncated pixel (the (-res, 0) trunc quirk), upper bounds
        # the world extent.
        alive = jnp.ones_like(x, dtype=jnp.bool_)
        for s in range(cfg.num_ray_steps):
            r = cfg.ray_step * s
            px_w = ox + r * dx
            py_w = oy + r * dy
            mx, my = to_px(px_w, py_w)
            hit = occ_lookup(my, mx) & alive
            dist = jnp.minimum(dist, jnp.where(hit, r, cfg.max_range))
            inb = ((mx >= 0) & (my >= 0)
                   & (px_w < extent_x) & (py_w < extent_y))
            alive = alive & inb
        diff = jnp.abs(obs - dist)
        gauss = jnp.where(
            diff <= cfg.gauss_max_diff,
            jnp.exp(-(diff * diff) / (2.0 * sigma * sigma)) * denom, 0.0)
        p_rand = jnp.where(jnp.abs(obs - cfg.max_range) < cfg.rand_window,
                           1.0, 0.0)
        # (log-combine mode routes through the dense path: the product
        # needs a GLOBAL max-log shift that a per-tile kernel cannot do.)
        return prob + bmask * (cfg.w_hit * gauss + cfg.w_rand * p_rand)

    prob = jax.lax.fori_loop(0, num_beams, beam_body, jnp.zeros_like(x))

    pmx, pmy = to_px(x, y)
    invalid = dil_lookup(pmy, pmx)
    inside = ((x >= origin_x) & (x < extent_x)
              & (y >= origin_y) & (y < extent_y))
    out_ref[0] = jnp.where(inside & ~invalid, prob, 0.0)


def _beam_weights_call(x, y, th, angles, ranges, mask, geom, num_beams,
                       cfg: SensorModelConfig, occ_lookup, dil_lookup,
                       interpret: bool):
    grid = x.shape[0] // TILE
    shp = (grid, TILE_SUB, TILE_LANE)
    x = x.reshape(shp)
    y = y.reshape(shp)
    th = th.reshape(shp)
    kernel = functools.partial(
        _weights_kernel, cfg=cfg, num_beams=num_beams, geom=geom,
        occ_lookup=occ_lookup, dil_lookup=dil_lookup)
    row_spec = pl.BlockSpec((1, TILE_SUB, TILE_LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shp, jnp.float32),
        grid=(grid,),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),   # angles [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ranges [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mask [B]
        ],
        out_specs=row_spec,
        interpret=interpret,
    )(x, y, th, angles, ranges, mask)
    return out.reshape(grid * TILE)


def beam_weights_pallas(m: MazeMap, particles, scan, cfg: SensorModelConfig,
                        interpret: bool = False):
    """Drop-in for sensor.beam_weights (fixed ray mode, offset==resolution).

    Requires a concrete (non-traced) map; pads N to a TILE multiple.
    """
    if not is_concrete_map(m):
        raise ValueError("beam_weights_pallas needs a concrete map "
                         "(bit tables are baked at trace time)")
    occ_lookup, dil_lookup = MapBitTables.get(m)
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
        jnp.asarray(scan.mask, jnp.float32), geom,
        int(scan.angles.shape[0]), cfg, occ_lookup, dil_lookup, interpret)
    return w[:n]
