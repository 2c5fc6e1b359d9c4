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
dilated-raster validity, world-extent bounds.  Three deliberate ulp-level
reassociations vs the dense path: beams accumulate sequentially, ray
directions come from the hoisted angle-addition identity, and the beam
loop unrolls in groups of MCL_BEAM_UNROLL (default 4, +17% full-step
throughput; XLA fuses across the wider body — set 1 for the bit-exact
single-beam loop); "analytic" mode can additionally differ at exact
pixel-boundary ties.
"""
from __future__ import annotations

import functools
import math
import os

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
                    cast_fn=None, pack=(1, 8)):
    (res, origin_x, origin_y, extent_x, extent_y) = geom
    n_pack, rows_per_ep = pack
    x = x_ref[0]            # [8, 128]
    y = y_ref[0]
    th = th_ref[0]
    inv_res = 1.0 / res
    if n_pack > 1:
        # Sublane index, to select each packed episode's scan values.
        sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)

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
    bf16_tail = os.environ.get("MCL_KERNEL_BF16") == "1"

    # Direction-independent cast state (grid coords, preselected candidate
    # line words, origin-pixel hits) hoisted out of the beam loop: the
    # word-table select chains run once per tile instead of per beam.
    cast_ctx = None if cast_fn is None else cast_fn.prepare(
        ox, oy, cfg.max_range)

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
        if n_pack == 1:
            obs = obs_ref[0, 0, b]
            bmask = msk_ref[0, 0, b]
        else:
            # n_pack episodes share the tile, rows_per_ep sublanes each:
            # build per-sublane observation/mask vectors by select chain
            # over the packed episodes' SMEM scans (~2 ops per episode —
            # negligible next to the ray march).
            obs = jnp.full_like(x, obs_ref[0, n_pack - 1, b])
            bmask = jnp.full_like(x, msk_ref[0, n_pack - 1, b])
            for p in range(n_pack - 2, -1, -1):
                take = sub < (p + 1) * rows_per_ep
                obs = jnp.where(take, obs_ref[0, p, b], obs)
                bmask = jnp.where(take, msk_ref[0, p, b], bmask)
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
        elif cfg.ray_mode == "fixed":
            dist = cast_fn.march_prepared(
                cast_ctx, ox, oy, dx, dy, cfg, extent_x, extent_y)
        else:
            dist = cast_fn.cast_prepared(cast_ctx, dx, dy)
        if bf16_tail:
            # MCL_KERNEL_BF16=1: likelihood tail in bfloat16 (2-lane VPU
            # packing).  Parity-breaking A/B flag — the ray cast itself
            # stays f32/int (the hot select chains are INTEGER bit ops
            # with no low-precision form), so this bounds what a bf16
            # "march" could buy: the float tail after the cast.
            # MEASURED DEAD on the 2026-08-21 Mosaic toolchain: bf16
            # compares, selects, AND vector arith.mulf all fail to
            # legalize on this target (BENCH_DETAILS round-5 perf
            # experiments) — the flag compiles only in interpret mode
            # and is kept as the documented experiment.
            # Comparisons AND selects stay out of bf16 (the Mosaic
            # target rejects bf16 compares and fails to legalize
            # arith.select on bf16): gate by mask-MULTIPLY instead —
            # exp(-x^2) is bounded, so multiply-by-0/1 equals the select.
            diff32 = jnp.abs(obs - dist)
            db = diff32.astype(jnp.bfloat16)
            sel = (diff32 <= cfg.gauss_max_diff).astype(
                jnp.float32).astype(jnp.bfloat16)
            g16 = sel * jnp.exp(-(db * db) * jnp.bfloat16(
                1.0 / (2.0 * sigma * sigma))) * jnp.bfloat16(denom)
            pr16 = (jnp.abs(obs - cfg.max_range)
                    < cfg.rand_window).astype(jnp.float32).astype(
                        jnp.bfloat16)
            pb16 = (jnp.bfloat16(cfg.w_hit) * g16
                    + jnp.bfloat16(cfg.w_rand) * pr16)
            if log_mode:
                return prob + bmask * jnp.log(
                    jnp.maximum(pb16, jnp.bfloat16(1e-6))).astype(
                        jnp.float32)
            return prob + bmask * pb16.astype(jnp.float32)
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

    # Beam-loop unroll: process MCL_BEAM_UNROLL beams per fori_loop
    # iteration (manual grouping — Mosaic's fori_loop only lowers unroll=1
    # or unroll=num_steps, and FULL static unrolling at B=34 blew up its
    # compile time).  On-chip A/B at 1M x 34 analytic measured full-step
    # 2.58-2.65e9 updates/s at 1, 2.85-2.92e9 at 2, 3.05-3.08e9 at 4,
    # 3.10e9 at 8 (3 was anomalously SLOW — keep powers of two); after the
    # expand-kernel split sped the rest of the step, 8 re-measured ahead
    # of 4 (3.73 vs 3.63e9) and is now the default.  Grouping reassociates
    # ulps (XLA fuses across the wider body); MCL_BEAM_UNROLL=1 restores
    # the bit-exact single-beam loop.
    unroll = int(os.environ.get("MCL_BEAM_UNROLL", "8"))
    if unroll <= 1:
        prob = jax.lax.fori_loop(0, num_beams, beam_body, jnp.zeros_like(x))
    else:
        def group_body(g, prob):
            for j in range(unroll):
                prob = beam_body(g * unroll + j, prob)
            return prob

        prob = jax.lax.fori_loop(0, num_beams // unroll, group_body,
                                 jnp.zeros_like(x))
        for b in range(num_beams - num_beams % unroll, num_beams):
            prob = beam_body(b, prob)

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
                       interpret: bool, cast_fn=None, pack=(1, TILE_SUB)):
    """Launch the kernel over pre-tiled episode groups.

    x/y/th [G, T, 8, 128] particle tiles, ranges/mask [G, P, B] per-episode
    scans (P packed episodes per tile row-group, rows_per_ep sublanes
    each — P = 1 is the plain one-episode-per-row-group case), angles [B]
    one shared static beam table.  Grid = (episode groups, tiles); the
    scans ride as (1, P, B) SMEM blocks re-streamed per group.
    """
    n_g, grid = x.shape[:2]
    n_pack = pack[0]
    sign = -1.0 if cfg.negate_beam_angle else 1.0
    cos_b = jnp.cos(sign * angles)
    sin_b = jnp.sin(sign * angles)
    kernel = functools.partial(
        _weights_kernel, cfg=cfg, num_beams=num_beams, geom=geom,
        occ_lookup=occ_lookup, dil_lookup=dil_lookup, cast_fn=cast_fn,
        pack=pack)
    row_spec = pl.BlockSpec((1, 1, TILE_SUB, TILE_LANE),
                            lambda e, i: (e, i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Mosaic requires the last two block dims to be (8,128)-divisible OR
    # equal to the array dims; a [G, P, B] layout with (1, P, B) blocks
    # satisfies that for any B while streaming one group's scans per
    # grid row.
    ep_smem = pl.BlockSpec((1, n_pack, num_beams), lambda e, i: (e, 0, 0),
                           memory_space=pltpu.SMEM)
    # Inside shard_map (check_vma=True) the out aval must carry the same
    # varying-mesh-axes set as the particle tiles, or pallas_call refuses
    # to trace — and the interpret-mode evaluator re-plays the kernel as a
    # jaxpr, so every operand must share that set too (pvary the
    # replicated scan tables up to the particle axes).  Outside shard_map
    # vma is the empty frozenset and all of this is a no-op.
    vma = getattr(jax.typeof(x), "vma", None)
    if vma:
        def _lift(o):
            missing = tuple(vma - jax.typeof(o).vma)
            return (jax.lax.pcast(o, missing, to="varying") if missing
                    else o)
        y, th, angles, cos_b, sin_b, ranges, mask = map(
            _lift, (y, th, angles, cos_b, sin_b, ranges, mask))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32, vma=vma),
        grid=(n_g, grid),
        in_specs=[
            row_spec, row_spec, row_spec,
            smem,     # angles [B] (shared)
            smem,     # cos(sign*angles) [B]
            smem,     # sin(sign*angles) [B]
            ep_smem,  # ranges [G, P, B]
            ep_smem,  # mask [G, P, B]
        ],
        out_specs=row_spec,
        interpret=interpret,
    )(x, y, th, angles, cos_b, sin_b, ranges, mask)
    return out


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
    elif cfg.ray_mode == "fixed":
        # Gridline rasters serve the march's occupancy probes from the
        # caster's prepared candidate words (bit-exact, cheaper per step);
        # other rasters keep the bitlookup-chain march.  MCL_FIXED_MARCH=
        # loop forces the chain march for A/B.
        if os.environ.get("MCL_FIXED_MARCH") != "loop":
            from .analytic import AnalyticCasterCache

            cast_fn = AnalyticCasterCache.get(m)
    else:
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
    grid = (n + pad) // TILE
    tile = lambda a: jnp.pad(a, (0, pad)).reshape(
        1, grid, TILE_SUB, TILE_LANE)
    w = _beam_weights_call(
        tile(particles[:, 0]), tile(particles[:, 1]), tile(particles[:, 2]),
        jnp.asarray(scan.angles, jnp.float32),
        jnp.asarray(scan.ranges, jnp.float32)[None, None],
        jnp.asarray(scan.mask, jnp.float32)[None, None], geom,
        int(scan.angles.shape[0]), cfg, occ_lookup, dil_lookup, interpret,
        cast_fn)
    return w.reshape(-1)[:n]


def pack_geometry(n: int):
    """(rows_per_ep, n_pack, waste) for packing episodes of n particles.

    Episodes pad to rows_per_ep 128-lane rows; n_pack of them share one
    (8, 128) tile.  waste is compute overhead vs useful particles (the
    kernel is compute-bound, so waste is the dispatch criterion).
    """
    rows = -(-n // TILE_LANE)
    if rows >= TILE_SUB:
        pad = (-n) % TILE
        return TILE_SUB, 1, (n + pad) / n
    n_pack = TILE_SUB // rows
    return rows, n_pack, TILE_SUB * TILE_LANE / (n_pack * n)


def beam_weights_pallas_batched(m: MazeMap, particles, angles, ranges,
                                mask, cfg: SensorModelConfig,
                                interpret: bool = False):
    """Episode-batched kernel launch: particles [E, N, 3] -> weights [E, N].

    One SHARED static beam table `angles` [B]; per-episode observations
    `ranges`/`mask` [E, B] stream through SMEM per grid row.  This is the
    vmap-over-episodes fast path (BASELINE config 4 sweeps): the plain
    kernel cannot batch, and the dense fallback materializes [E, N, B]
    intermediates.  Small episodes (n <= 512 particles, i.e. rows_per_ep
    = ceil(n/128) <= 4) PACK: each pads to rows_per_ep 128-lane rows and
    8//rows_per_ep of them share one (8, 128) tile, so e.g. 500-particle
    sweeps waste 2.4%, not 2x; the kernel selects each sublane group's
    scan from SMEM per beam.  (513..1023-particle episodes cannot pack —
    8//rows == 1 — and pad to the full tile.)  Same semantics per episode
    as beam_weights_pallas (log mode returns RAW per-episode log-sums).
    """
    cast_fn, occ_lookup, dil_lookup, geom = _resolve_kernel_inputs(m, cfg)
    n_ep, n = particles.shape[0], particles.shape[1]
    rows, n_pack, _ = pack_geometry(n)
    angles = jnp.asarray(angles, jnp.float32)
    ranges = jnp.asarray(ranges, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    nb = int(angles.shape[0])
    if n_pack == 1:
        pad = (-n) % TILE
        grid = (n + pad) // TILE
        tile = lambda a: jnp.pad(a, ((0, 0), (0, pad))).reshape(
            n_ep, grid, TILE_SUB, TILE_LANE)
        w = _beam_weights_call(
            tile(particles[:, :, 0]), tile(particles[:, :, 1]),
            tile(particles[:, :, 2]), angles,
            ranges[:, None, :], mask[:, None, :],
            geom, nb, cfg, occ_lookup, dil_lookup, interpret, cast_fn)
        return w.reshape(n_ep, grid * TILE)[:, :n]

    # Packed layout: pad episodes to a multiple of n_pack, each episode to
    # rows * 128 particles; group n_pack episodes into the tile's sublanes
    # (row-leftover 8 - n_pack*rows sublanes are dead weight lanes).
    e_pad = (-n_ep) % n_pack
    groups = (n_ep + e_pad) // n_pack
    sub_pad = TILE_SUB - n_pack * rows

    def tile(a):  # [E, n] -> [G, 1, 8, 128]
        a = jnp.pad(a, ((0, e_pad), (0, rows * TILE_LANE - n)))
        a = a.reshape(groups, n_pack * rows, TILE_LANE)
        a = jnp.pad(a, ((0, 0), (0, sub_pad), (0, 0)))
        return a[:, None]

    pad_ep = lambda a: jnp.pad(a, ((0, e_pad), (0, 0))).reshape(
        groups, n_pack, nb)
    w = _beam_weights_call(
        tile(particles[:, :, 0]), tile(particles[:, :, 1]),
        tile(particles[:, :, 2]), angles, pad_ep(ranges), pad_ep(mask),
        geom, nb, cfg, occ_lookup, dil_lookup, interpret, cast_fn,
        pack=(n_pack, rows))
    w = w.reshape(groups, TILE_SUB, TILE_LANE)[:, : n_pack * rows]
    w = w.reshape(groups * n_pack, rows * TILE_LANE)
    return w[:n_ep, :n]


def _weights_kernel_beamsub(x_ref, y_ref, th_ref, ang_ref, cos_ref,
                            sin_ref, obs_ref, msk_ref, out_ref, *,
                            cfg: SensorModelConfig, num_beams: int,
                            geom: tuple, occ_lookup, dil_lookup,
                            cast_fn=None):
    """Beam-per-SUBLANE layout: a tile holds 128 particles x 8 beams.

    The alternative sweep layout (ROADMAP r4 "beam-parallel"): instead of
    1024 distinct particles per (8, 128) tile with an in-register beam
    loop, each tile covers ONE 128-particle lane row replicated across
    the 8 sublanes, and each sublane evaluates a DIFFERENT beam; the loop
    runs over ceil(B/8) beam groups and the per-particle likelihood is
    the sublane-axis reduction.  Trades per-particle hoisted work (trig,
    cast preparation — now duplicated 8x, once per sublane, on identical
    particle rows) for zero sublane padding at ANY episode size: its
    niche is 513..1023-particle episodes, where the row layout cannot
    pack and pads to a full tile (up to 2x waste).
    """
    (res, origin_x, origin_y, extent_x, extent_y) = geom
    x = x_ref[0]            # [8, 128] — rows identical (one lane row)
    y = y_ref[0]
    th = th_ref[0]
    inv_res = 1.0 / res
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)

    def to_px(wx, wy):
        mx = ((wx - origin_x) * inv_res).astype(jnp.int32)
        my = ((wy - origin_y) * inv_res).astype(jnp.int32)
        return mx, my

    cth = jnp.cos(th)
    sth = jnp.sin(th)
    ox = x + cfg.laser_offset * cth
    oy = y + cfg.laser_offset * sth
    sigma = cfg.sigma
    denom = 1.0 / (sigma * math.sqrt(2.0 * math.pi))
    log_mode = cfg.beam_combine == "log"
    cast_ctx = None if cast_fn is None else cast_fn.prepare(
        ox, oy, cfg.max_range)

    def ray_fixed(dx, dy):
        dist = jnp.full_like(x, cfg.max_range)
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

    n_groups = -(-num_beams // TILE_SUB)

    def group_body(g, prob):
        # Per-sublane beam index b = g*8 + sub; entries past num_beams
        # are masked dead (clamped SMEM read, zeroed mask).  Per-sublane
        # SMEM values via select chains over the 8 sublanes.
        b0 = g * TILE_SUB
        cb = jnp.full_like(x, 0.0)
        sb = jnp.full_like(x, 0.0)
        obs = jnp.full_like(x, 0.0)
        bmask = jnp.full_like(x, 0.0)
        for j in range(TILE_SUB):
            bi = jnp.minimum(b0 + j, num_beams - 1)
            live = (b0 + j < num_beams).astype(jnp.float32)
            here = sub == j
            cb = jnp.where(here, cos_ref[bi], cb)
            sb = jnp.where(here, sin_ref[bi], sb)
            obs = jnp.where(here, obs_ref[0, 0, bi], obs)
            bmask = jnp.where(here, msk_ref[0, 0, bi] * live, bmask)
        dx = cth * cb - sth * sb
        dy = sth * cb + cth * sb
        if cast_fn is None:
            dist = ray_fixed(dx, dy)
        elif cfg.ray_mode == "fixed":
            dist = cast_fn.march_prepared(
                cast_ctx, ox, oy, dx, dy, cfg, extent_x, extent_y)
        else:
            dist = cast_fn.cast_prepared(cast_ctx, dx, dy)
        diff = jnp.abs(obs - dist)
        gauss = jnp.where(
            diff <= cfg.gauss_max_diff,
            jnp.exp(-(diff * diff) / (2.0 * sigma * sigma)) * denom, 0.0)
        p_rand = jnp.where(jnp.abs(obs - cfg.max_range) < cfg.rand_window,
                           1.0, 0.0)
        per_beam = cfg.w_hit * gauss + cfg.w_rand * p_rand
        if log_mode:
            per_beam = jnp.log(jnp.maximum(per_beam, 1e-6))
        return prob + bmask * per_beam

    prob = jax.lax.fori_loop(0, n_groups, group_body, jnp.zeros_like(x))
    # Per-particle likelihood = reduce over the beam (sublane) axis.
    total = jnp.sum(prob, axis=-2, keepdims=True)
    if log_mode:
        out_ref[0] = jnp.broadcast_to(total, x.shape)
        return
    pmx, pmy = to_px(x, y)
    invalid = dil_lookup(pmy, pmx)
    inside = ((x >= origin_x) & (x < extent_x)
              & (y >= origin_y) & (y < extent_y))
    out_ref[0] = jnp.where(inside & ~invalid,
                           jnp.broadcast_to(total, x.shape), 0.0)


def beam_weights_pallas_beamsub(m: MazeMap, particles, angles, ranges,
                                mask, cfg: SensorModelConfig,
                                interpret: bool = False):
    """Episode-batched launch of the beam-per-sublane layout.

    particles [E, N, 3] -> weights [E, N].  Each grid step covers one
    128-particle lane row of one episode (replicated across sublanes);
    pads N to 128 only.  See _weights_kernel_beamsub for the tradeoff.
    """
    cast_fn, occ_lookup, dil_lookup, geom = _resolve_kernel_inputs(m, cfg)
    n_ep, n = particles.shape[0], particles.shape[1]
    rows = -(-n // TILE_LANE)
    angles = jnp.asarray(angles, jnp.float32)
    nb = int(angles.shape[0])
    sign = -1.0 if cfg.negate_beam_angle else 1.0
    cos_b = jnp.cos(sign * angles)
    sin_b = jnp.sin(sign * angles)

    def tile(a):  # [E, n] -> [E, rows, 8, 128], rows replicated over sublanes
        a = jnp.pad(a, ((0, 0), (0, rows * TILE_LANE - n)))
        a = a.reshape(n_ep, rows, 1, TILE_LANE)
        return jnp.broadcast_to(
            a, (n_ep, rows, TILE_SUB, TILE_LANE))

    kernel = functools.partial(
        _weights_kernel_beamsub, cfg=cfg, num_beams=nb, geom=geom,
        occ_lookup=occ_lookup, dil_lookup=dil_lookup, cast_fn=cast_fn)
    row_spec = pl.BlockSpec((1, 1, TILE_SUB, TILE_LANE),
                            lambda e, i: (e, i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Same Mosaic block rule as the row kernel: a [E, 1, B] layout with
    # (1, 1, B) blocks keeps the last two block dims equal to the array
    # dims for any B.
    ep_smem = pl.BlockSpec((1, 1, nb), lambda e, i: (e, 0, 0),
                           memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_ep, rows, TILE_SUB, TILE_LANE), jnp.float32),
        grid=(n_ep, rows),
        in_specs=[row_spec, row_spec, row_spec, smem, smem, smem,
                  ep_smem, ep_smem],
        out_specs=row_spec,
        interpret=interpret,
    )(tile(particles[:, :, 0]), tile(particles[:, :, 1]),
      tile(particles[:, :, 2]), angles, cos_b, sin_b,
      jnp.asarray(ranges, jnp.float32)[:, None],
      jnp.asarray(mask, jnp.float32)[:, None])
    w = out[:, :, 0, :].reshape(n_ep, rows * TILE_LANE)
    if cfg.beam_combine == "log":
        from ..models.sensor import finish_log_weights

        return finish_log_weights(m, cfg, particles, w[:, :n], axis=1)
    return w[:, :n]
