"""Fused Pallas TPU kernel: ray-cast beam likelihood, gather-free.

The hot op of the framework (SURVEY.md §7 stage 7): per particle x beam,
cast the ray against the occupancy raster and accumulate the reference
likelihood (monte_carlo.cpp:623-682) — one kernel, one HBM read of the
particle tile, one HBM write of the weight tile.

Two ray backends, both in-kernel:
  * ray_mode="fixed"    — the reference's 0.1 m march (monte_carlo.cpp:350-390):
    per step, a bit-packed select-chain occupancy probe (ops/bitlookup —
    TPU has no per-lane gather, so raster rows are baked into the program
    as scalar constants; pure element-wise VPU work, no scratch).
  * ray_mode="analytic" — the closed-form slab caster (ops/analytic):
    exact DDA-equivalent first-hit distances, the same elementwise bit
    tricks traced straight into the kernel body.

Beam combination: "sum" (reference semantics — validity + summed probs
resolved in-kernel) or "log" (product likelihood — the kernel emits raw
per-particle log-sums; the GLOBAL max-log shift, temperature, and validity
gate run in XLA afterwards since a per-tile kernel cannot see the max).

Matches models/sensor.beam_weights to float ulps: trunc worldToMap,
masked-min first hit, truncated-Gaussian + random-hit mixture,
dilated-raster validity, world-extent bounds.  Two deliberate ulp-level
reassociations vs the dense path: beams accumulate sequentially, and ray
directions come from the hoisted angle-addition identity; "analytic" mode
can additionally differ at exact pixel-boundary ties.
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


def _weights_kernel(x_ref, y_ref, th_ref, ang_ref, cos_ref, sin_ref,
                    obs_ref, msk_ref, out_ref, *, cfg: SensorModelConfig,
                    num_beams: int, geom: tuple, occ_lookup, dil_lookup,
                    cast_fn=None):
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

    # Per-particle trig hoisted OUT of the beam loop: ray directions come
    # from the angle-addition identity (4 multiplies/beam instead of two
    # [8,128] transcendentals/beam).  Matches cos(th + a) to float ulps.
    cth = jnp.cos(th)
    sth = jnp.sin(th)
    ox = x + cfg.laser_offset * cth
    oy = y + cfg.laser_offset * sth
    sign = -1.0 if cfg.negate_beam_angle else 1.0
    sigma = cfg.sigma
    denom = 1.0 / (sigma * math.sqrt(2.0 * math.pi))
    log_mode = cfg.beam_combine == "log"

    def ray_fixed(dx, dy):
        """The reference's 0.1 m march (monte_carlo.cpp:350-390)."""
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
        return dist

    # Beam loop as fori_loop with dynamic SMEM reads: unrolling B beams
    # multiplies the (already ~1k-op) select-chain body and blows up Mosaic
    # compile time (observed 20+ min at B=34).  March steps stay unrolled.
    def beam_body(b, prob):
        beam_angle = ang_ref[b]
        obs = obs_ref[0, 0, b]
        bmask = msk_ref[0, 0, b]
        if cfg.quantize_ray_deg:
            # ~1-degree direction quantization (monte_carlo.cpp:355-363)
            # quantizes the SUM, so the identity cannot apply here.
            ray = th + sign * beam_angle
            ray = jnp.round(ray * (180.0 / math.pi)) * (math.pi / 180.0)
            dx = jnp.cos(ray)
            dy = jnp.sin(ray)
        else:
            # cos/sin of the (signed) beam angle come precomputed in SMEM:
            # in-kernel SCALAR transcendentals in the beam loop cost ~9%
            # of the whole step (measured), the table reads are free.
            cb = cos_ref[b]
            sb = sin_ref[b]
            dx = cth * cb - sth * sb
            dy = sth * cb + cth * sb
        if cast_fn is None:
            dist = ray_fixed(dx, dy)
        else:
            dist = cast_fn.cast_dir(ox, oy, dx, dy, cfg.max_range)
        diff = jnp.abs(obs - dist)
        gauss = jnp.where(
            diff <= cfg.gauss_max_diff,
            jnp.exp(-(diff * diff) / (2.0 * sigma * sigma)) * denom, 0.0)
        p_rand = jnp.where(jnp.abs(obs - cfg.max_range) < cfg.rand_window,
                           1.0, 0.0)
        per_beam = cfg.w_hit * gauss + cfg.w_rand * p_rand
        if log_mode:
            # Floored log, mask scaling the LOG term (sensor.py dense path).
            return prob + bmask * jnp.log(jnp.maximum(per_beam, 1e-6))
        return prob + bmask * per_beam

    prob = jax.lax.fori_loop(0, num_beams, beam_body, jnp.zeros_like(x))

    if log_mode:
        # Raw log-sums: temperature, global max shift, and validity are
        # applied by the caller (they need cross-tile information).
        out_ref[0] = prob
        return
    pmx, pmy = to_px(x, y)
    invalid = dil_lookup(pmy, pmx)
    inside = ((x >= origin_x) & (x < extent_x)
              & (y >= origin_y) & (y < extent_y))
    out_ref[0] = jnp.where(inside & ~invalid, prob, 0.0)


def _beam_weights_call(x, y, th, angles, ranges, mask, geom, num_beams,
                       cfg: SensorModelConfig, occ_lookup, dil_lookup,
                       interpret: bool, cast_fn=None):
    """Launch the kernel over an [E, N_padded] episode x particle batch.

    x/y/th [E, N_padded], ranges/mask [E, B] (per-episode scans), angles [B]
    (one shared static beam table).  Grid = (episodes, particle tiles); the
    per-episode scan rides as a (1, B) SMEM block re-streamed per episode.
    E = 1 is the single-filter case.
    """
    n_ep = x.shape[0]
    grid = x.shape[1] // TILE
    shp = (n_ep, grid, TILE_SUB, TILE_LANE)
    x = x.reshape(shp)
    y = y.reshape(shp)
    th = th.reshape(shp)
    sign = -1.0 if cfg.negate_beam_angle else 1.0
    cos_b = jnp.cos(sign * angles)
    sin_b = jnp.sin(sign * angles)
    kernel = functools.partial(
        _weights_kernel, cfg=cfg, num_beams=num_beams, geom=geom,
        occ_lookup=occ_lookup, dil_lookup=dil_lookup, cast_fn=cast_fn)
    row_spec = pl.BlockSpec((1, 1, TILE_SUB, TILE_LANE),
                            lambda e, i: (e, i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Mosaic requires the last two block dims to be (8,128)-divisible OR
    # equal to the array dims; a [E, 1, B] layout with (1, 1, B) blocks
    # satisfies that for any B while streaming one episode's scan per
    # grid row.
    ep_smem = pl.BlockSpec((1, 1, num_beams), lambda e, i: (e, 0, 0),
                           memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shp, jnp.float32),
        grid=(n_ep, grid),
        in_specs=[
            row_spec, row_spec, row_spec,
            smem,     # angles [B] (shared)
            smem,     # cos(sign*angles) [B]
            smem,     # sin(sign*angles) [B]
            ep_smem,  # ranges [E, B]
            ep_smem,  # mask [E, B]
        ],
        out_specs=row_spec,
        interpret=interpret,
    )(x, y, th, angles, cos_b, sin_b, ranges[:, None, :], mask[:, None, :])
    return out.reshape(n_ep, grid * TILE)


def _resolve_kernel_inputs(m: MazeMap, cfg: SensorModelConfig):
    """Shared eligibility checks + (cast_fn, occ_lookup, dil_lookup, geom).

    One definition so the single-filter and episode-batched launches can
    never diverge in which configs they accept.
    """
    if not is_concrete_map(m):
        raise ValueError("beam_weights_pallas needs a concrete map "
                         "(bit tables are baked at trace time)")
    cast_fn = None
    if cfg.ray_mode == "analytic":
        from .analytic import AnalyticCasterCache

        cast_fn = AnalyticCasterCache.get(m)
        if cast_fn is None:
            raise ValueError("analytic Pallas kernel needs a "
                             "gridline-structured raster")
    elif cfg.ray_mode != "fixed":
        raise ValueError(f"unsupported ray_mode {cfg.ray_mode!r} for the "
                         "Pallas kernel")
    occ_lookup, dil_lookup = MapBitTables.get(m)
    geom = (float(m.resolution), float(m.origin_x), float(m.origin_y),
            float(m.extent_x), float(m.extent_y))
    return cast_fn, occ_lookup, dil_lookup, geom


def beam_weights_pallas(m: MazeMap, particles, scan, cfg: SensorModelConfig,
                        interpret: bool = False):
    """Drop-in for sensor.beam_weights (offset==resolution).

    ray_mode "fixed" or "analytic" (the latter requires a
    gridline-structured raster).  In beam_combine="log" mode the return
    value is the RAW per-particle log-sum — the caller applies temperature,
    the global max shift, and the validity gate (see sensor.beam_weights).
    Requires a concrete (non-traced) map; pads N to a TILE multiple.
    """
    cast_fn, occ_lookup, dil_lookup, geom = _resolve_kernel_inputs(m, cfg)
    n = particles.shape[0]
    pad = (-n) % TILE
    x = jnp.pad(particles[:, 0], (0, pad))[None]
    y = jnp.pad(particles[:, 1], (0, pad))[None]
    th = jnp.pad(particles[:, 2], (0, pad))[None]
    w = _beam_weights_call(
        x, y, th, jnp.asarray(scan.angles, jnp.float32),
        jnp.asarray(scan.ranges, jnp.float32)[None],
        jnp.asarray(scan.mask, jnp.float32)[None], geom,
        int(scan.angles.shape[0]), cfg, occ_lookup, dil_lookup, interpret,
        cast_fn)
    return w[0, :n]


def beam_weights_pallas_batched(m: MazeMap, particles, angles, ranges,
                                mask, cfg: SensorModelConfig,
                                interpret: bool = False):
    """Episode-batched kernel launch: particles [E, N, 3] -> weights [E, N].

    One SHARED static beam table `angles` [B]; per-episode observations
    `ranges`/`mask` [E, B] stream through SMEM per grid row.  This is the
    vmap-over-episodes fast path (BASELINE config 4 sweeps): the plain
    kernel cannot batch, and the dense fallback materializes [E, N, B]
    intermediates.  Same semantics per episode as beam_weights_pallas
    (log mode returns RAW per-episode log-sums).
    """
    cast_fn, occ_lookup, dil_lookup, geom = _resolve_kernel_inputs(m, cfg)
    n = particles.shape[1]
    pad = (-n) % TILE
    padder = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
    w = _beam_weights_call(
        padder(particles[:, :, 0]), padder(particles[:, :, 1]),
        padder(particles[:, :, 2]), jnp.asarray(angles, jnp.float32),
        jnp.asarray(ranges, jnp.float32), jnp.asarray(mask, jnp.float32),
        geom, int(angles.shape[0]), cfg, occ_lookup, dil_lookup, interpret,
        cast_fn)
    return w[:, :n]
