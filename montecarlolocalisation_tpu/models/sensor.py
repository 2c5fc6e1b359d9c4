"""Beam sensor model: scan filtering, likelihood, and scan simulation.

Reference behavior reproduced:
  * filterLaserReadings (monte_carlo.cpp:254-278): NaN/Inf beams become
    radius 1.05 with their nominal angle; finite beams inside
    [range_min, range_max] are kept; finite out-of-range beams are DROPPED
    (which shifts downstream indices — handled host-side).
  * filterAngles (monte_carlo.cpp:610-620): keep beams with angle strictly
    inside (-120, +120) degrees.
  * computeWeight (monte_carlo.cpp:623-682): every `beam_skip`-th filtered
    beam; ray origin offset `laser_offset` along the heading; beam angle
    NEGATED; per-beam prob = w_hit * TruncGauss(|obs - exp|; sigma)
    + w_rand * 1[|obs - max_range| < 0.01]; probs SUMMED over beams (not
    multiplied); particles failing isValidPos keep weight 0.

In-graph beams are fixed-size arrays (angles [B], ranges [B], mask [B]) so a
whole episode jit-compiles with static shapes; `filter_scan` is the host-side
preprocessor that converts a raw (ragged) LaserScan into that form.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SensorModelConfig
from ..maps.grid import MazeMap, is_valid_pos
from .raycast import raycast


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scan:
    """Fixed-size filtered scan: the observation fed to the filter step."""

    angles: jax.Array  # [B] beam angles (radians, LIDAR frame, pre-negation)
    ranges: jax.Array  # [B] observed radii (m)
    mask: jax.Array    # [B] bool — False lanes contribute nothing


def filter_scan(
    ranges: np.ndarray,
    angle_min: float,
    angle_increment: float,
    range_min: float,
    range_max: float,
    cfg: SensorModelConfig = SensorModelConfig(),
    pad_to: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side reproduction of filterLaserReadings + filterAngles + skip.

    Returns (angles [B], ranges [B], mask [B]) numpy arrays, optionally
    padded to `pad_to` lanes.
    """
    ranges = np.asarray(ranges, dtype=np.float64)
    idx = np.arange(len(ranges))
    angles = angle_min + idx * angle_increment
    bad = ~np.isfinite(ranges)
    keep = bad | ((ranges >= range_min) & (ranges <= range_max))
    radii = np.where(bad, cfg.invalid_beam_range, ranges)[keep]
    angles = angles[keep]
    # Angular crop, strict inequalities (monte_carlo.cpp:615).
    deg = angles * 180.0 / math.pi
    crop = (deg > -cfg.angle_crop_deg) & (deg < cfg.angle_crop_deg)
    radii, angles = radii[crop], angles[crop]
    # Every beam_skip-th beam (monte_carlo.cpp:650).
    radii = radii[:: cfg.beam_skip]
    angles = angles[:: cfg.beam_skip]
    mask = np.ones(len(radii), dtype=bool)
    if pad_to is not None:
        pad = pad_to - len(radii)
        if pad < 0:
            raise ValueError(f"pad_to={pad_to} < {len(radii)} beams")
        radii = np.pad(radii, (0, pad))
        angles = np.pad(angles, (0, pad))
        mask = np.pad(mask, (0, pad))
    return (
        angles.astype(np.float32),
        radii.astype(np.float32),
        mask,
    )


def default_beam_angles(
    cfg: SensorModelConfig = SensorModelConfig(),
    angle_min_deg: float = -135.0,
    angle_increment_deg: float = 0.352,
    n_raw_beams: int = 726,
) -> np.ndarray:
    """Nominal beam table of the reference LIDAR (monte_carlo.cpp:637-639:
    0.352 deg/beam, angle_min -135 deg), filtered+subsampled."""
    angles = (angle_min_deg + np.arange(n_raw_beams) * angle_increment_deg)
    angles = angles[(angles > -cfg.angle_crop_deg) & (angles < cfg.angle_crop_deg)]
    angles = angles[:: cfg.beam_skip]
    return np.deg2rad(angles).astype(np.float32)


def make_scan(angles, ranges, mask=None) -> Scan:
    angles = jnp.asarray(angles, jnp.float32)
    ranges = jnp.asarray(ranges, jnp.float32)
    if mask is None:
        mask = jnp.ones(angles.shape, dtype=bool)
    return Scan(angles=angles, ranges=jnp.broadcast_to(ranges, angles.shape),
                mask=jnp.asarray(mask))


def gauss_pdf(diff, cfg: SensorModelConfig):
    """Truncated N(0, sigma) pdf: zero outside [0, gauss_max_diff]
    (GaussianLookup, monte_carlo.cpp:139-177).  Computed exactly; the
    reference LUT (1e-4 resolution, lerp) agrees to ~1e-9."""
    denom = cfg.sigma * math.sqrt(2.0 * math.pi)
    pdf = jnp.exp(-(diff * diff) / (2.0 * cfg.sigma * cfg.sigma)) / denom
    return jnp.where((diff >= 0.0) & (diff <= cfg.gauss_max_diff), pdf, 0.0)


def expected_ranges(m: MazeMap, poses, scan_angles, cfg: SensorModelConfig):
    """Raycast expected distances for poses [..., 3] x beams [B] -> [..., B].

    Ray origin is laser_offset ahead of the pose along its heading
    (monte_carlo.cpp:643-645); the beam angle is negated when
    cfg.negate_beam_angle (monte_carlo.cpp:653: angle = -(beam.angle)).
    """
    x, y, theta = poses[..., 0], poses[..., 1], poses[..., 2]
    ox = x + cfg.laser_offset * jnp.cos(theta)
    oy = y + cfg.laser_offset * jnp.sin(theta)
    sign = -1.0 if cfg.negate_beam_angle else 1.0
    ray_angle = theta[..., None] + sign * scan_angles
    return raycast(m, ox[..., None], oy[..., None], ray_angle, cfg)


def beam_weights(m: MazeMap, particles, scan: Scan, cfg: SensorModelConfig,
                 valid_offset: float = 0.1):
    """computeWeight: unnormalized weights [N] for particles [N, 3].

    (monte_carlo.cpp:623-682).  Invalid positions get exactly 0.

    Backend dispatch (cfg.lookup_mode): on TPU with ray_mode "fixed" or
    "analytic" (gridline rasters) the whole computation runs as one fused
    Pallas kernel (ops/weights_pallas) for both beam-combine modes;
    otherwise XLA gather (CPU) or MXU one-hot lookups.  Setting
    MCL_WEIGHTS_INTERPRET=1 forces the kernel in Pallas INTERPRET mode on
    any backend (tests: the kernel + shard_map collectives composition
    must trace together on the virtual CPU mesh so real multi-chip isn't
    its first-ever execution).
    """
    import os as _os

    from ..ops.bitlookup import is_concrete_map

    interpret = _os.environ.get("MCL_WEIGHTS_INTERPRET", "0") == "1"
    mode = cfg.lookup_mode
    if mode == "auto":
        mode = ("pallas" if jax.default_backend() == "tpu" or interpret
                else "gather")
    if mode == "pallas":
        kernel_ok = (abs(valid_offset - m.resolution) < 1e-9
                     and particles.ndim == 2
                     and (jax.default_backend() == "tpu" or interpret)
                     and is_concrete_map(m)
                     and cfg.beam_combine in ("sum", "log"))
        if kernel_ok:
            if cfg.ray_mode == "analytic":
                from ..ops.analytic import AnalyticCasterCache

                kernel_ok = AnalyticCasterCache.get(m) is not None
            else:
                kernel_ok = cfg.ray_mode == "fixed"
        if kernel_ok:
            return _beam_weights_pallas_vmappable(m, particles, scan, cfg,
                                                  valid_offset,
                                                  interpret=interpret)
        mode = "bits"
    if mode == "bits" and not is_concrete_map(m):
        mode = "onehot"
    return _beam_weights_dense(m, particles, scan, cfg, valid_offset, mode)


def _valid_pos_bits(m, px, py):
    """isValidPos via the dilated bit raster (offset == one pixel)."""
    from ..maps.grid import is_inside_map
    from ..ops.bitlookup import MapBitTables

    _, dil_lookup = MapBitTables.get(m)
    mx = ((px - m.origin_x) / m.resolution).astype(jnp.int32)
    my = ((py - m.origin_y) / m.resolution).astype(jnp.int32)
    return is_inside_map(m, px, py) & ~dil_lookup(my, mx)


def _beam_weights_dense(m, particles, scan, cfg, valid_offset, mode):
    """The XLA implementation (gather / onehot / bits lookups)."""
    expected = expected_ranges(m, particles, scan.angles, cfg)  # [N, B]
    observed = scan.ranges  # [B]
    diff = jnp.abs(observed - expected)
    p_hit = cfg.w_hit * gauss_pdf(diff, cfg)
    p_rand = cfg.w_rand * (
        jnp.abs(observed - cfg.max_range) < cfg.rand_window
    ).astype(jnp.float32)
    per_beam = p_hit + p_rand
    if cfg.beam_combine == "log":
        # Product of per-beam likelihoods (summed logs), floored so one
        # zero beam doesn't erase the particle.  Shift by the global max
        # log-weight before exponentiating: at 34+ beams the raw product
        # underflows f32 (relative weights are all resampling needs).
        logs = jnp.sum(jnp.log(jnp.maximum(per_beam, 1e-6)) * scan.mask,
                       axis=-1) / cfg.log_temperature
        prob = jnp.exp(logs - jnp.max(logs))
    else:
        prob = jnp.sum(per_beam * scan.mask, axis=-1)
    px, py = particles[..., 0], particles[..., 1]
    if mode == "bits" and abs(valid_offset - m.resolution) < 1e-9:
        valid = _valid_pos_bits(m, px, py)
    elif mode == "onehot" and abs(valid_offset - m.resolution) < 1e-9:
        from ..ops.lookup import is_valid_pos_onehot

        valid = is_valid_pos_onehot(m, px, py)
    else:
        valid = is_valid_pos(m, px, py, valid_offset)
    return jnp.where(valid, prob, 0.0)


def beam_weights_partial(m: MazeMap, known: MazeMap, particles, scan: Scan,
                         cfg: SensorModelConfig, valid_offset: float = 0.1):
    """computeWeight on a PARTIAL (learned) map: unknown-aware scoring.

    `m` is the conservative learned maze (evidenced walls + unexplored
    edges closed, mapping.fit_walls' unexplored_is_wall=True — the raster
    the planner and particle-validity already use), `known` the SAME fit
    with unexplored edges OPEN (walls only where evidence says wall, so
    walls(known) ⊆ walls(m) and d_known >= d_cons per beam).

    Casting each beam on both rasters classifies it exactly: where the
    two distances agree the beam lives entirely in mapped space and is
    scored by the standard reference model against the evidenced wall
    (gauss_pdf on |z - d_known|, monte_carlo.cpp:623-682 semantics);
    where d_cons < d_known the beam crosses the exploration frontier at
    d_cons before reaching any evidenced wall, and a measurement at or
    beyond that frontier says nothing the map can check — it gets the
    flat cfg.unknown_credit fraction of the peak hit probability instead
    of being punished against a phantom wall.  A measurement SHORT of the
    frontier is a claim about mapped free space and keeps the standard
    (punishing) score.  Net effect: relocalization quality degrades with
    map coverage instead of cliffing — the phantom walls of a 50%-explored
    map no longer contradict every beam that looks outward.

    Validity/injection semantics are unchanged (conservative map): the
    filter only ever PLACES particles in explored space; this scorer only
    stops mis-SCORING them for looking toward unexplored space.
    """
    d_cons = expected_ranges(m, particles, scan.angles, cfg)      # [N, B]
    d_known = expected_ranges(known, particles, scan.angles, cfg)
    observed = scan.ranges                                        # [B]
    frontier = d_cons < d_known - 1e-4
    beyond = observed >= d_cons - cfg.sigma
    peak = 1.0 / (cfg.sigma * math.sqrt(2.0 * math.pi))
    p_hit = cfg.w_hit * gauss_pdf(jnp.abs(observed - d_known), cfg)
    if cfg.unknown_credit_mode == "interval":
        # Frontier-distance-aware credit: the marginal density of z under
        # "a wall sits uniformly in the unknown stretch beyond the
        # frontier" — 1 / |unknown interval|, capped at the Gaussian peak
        # (a beam cannot be MORE informative than a mapped wall).  Beams
        # grazing the frontier keep near-mapped-beam strength; beams deep
        # into unknown space decay toward zero credit, so the cloud is
        # not uniformly subsidized for looking outward.
        interval = jnp.maximum(cfg.max_range - d_cons, 0.0) + cfg.sigma
        credit = cfg.w_hit * jnp.minimum(1.0 / interval, peak)
    else:
        credit = jnp.float32(cfg.unknown_credit * cfg.w_hit * peak)
    p_hit = jnp.where(frontier & beyond, credit, p_hit)
    p_rand = cfg.w_rand * (
        jnp.abs(observed - cfg.max_range) < cfg.rand_window
    ).astype(jnp.float32)
    per_beam = p_hit + p_rand
    if cfg.beam_combine == "log":
        logs = jnp.sum(jnp.log(jnp.maximum(per_beam, 1e-6)) * scan.mask,
                       axis=-1) / cfg.log_temperature
        prob = jnp.exp(logs - jnp.max(logs))
    else:
        prob = jnp.sum(per_beam * scan.mask, axis=-1)
    px, py = particles[..., 0], particles[..., 1]
    from ..ops.bitlookup import is_concrete_map

    if is_concrete_map(m) and abs(valid_offset - m.resolution) < 1e-9:
        valid = _valid_pos_bits(m, px, py)
    else:
        valid = is_valid_pos(m, px, py, valid_offset)
    return jnp.where(valid, prob, 0.0)


def finish_log_weights(m, cfg, particles, raw_logs, axis=None):
    """Log-combine epilogue: temperature, max-log shift, validity gate.

    The Pallas kernels emit RAW per-particle log-sums (a per-tile kernel
    cannot see the max); this finishes them exactly as the dense path does
    (_beam_weights_dense).  axis=None takes the global max (single
    filter); an int axis takes per-episode maxes for batched launches.
    """
    logs = raw_logs / cfg.log_temperature
    prob = jnp.exp(logs - jnp.max(logs, axis=axis,
                                  keepdims=axis is not None))
    return jnp.where(
        _valid_pos_bits(m, particles[..., 0], particles[..., 1]), prob, 0.0)


def _beam_weights_pallas_vmappable(m, particles, scan, cfg, valid_offset,
                                   interpret: bool = False):
    """Pallas kernel wrapped in custom_vmap: batching (vmap over episodes)
    falls back to the vmappable bits path — pallas_call cannot batch its
    SMEM beam operands.  (Needed because vmap-of-scan retraces bodies with
    plain tracers, so batching is undetectable at dispatch time.)"""
    from ..ops.bitlookup import is_concrete_map
    from ..ops.weights_pallas import beam_weights_pallas

    bits_mode = "bits" if is_concrete_map(m) else "onehot"

    @jax.custom_batching.custom_vmap
    def fn(p, angles, ranges, mask):
        out = beam_weights_pallas(
            m, p, Scan(angles=angles, ranges=ranges, mask=mask), cfg,
            interpret=interpret)
        if cfg.beam_combine == "log":
            out = finish_log_weights(m, cfg, p, out)
        return out

    @fn.def_vmap
    def _rule(axis_size, in_batched, p, angles, ranges, mask):
        from ..ops.weights_pallas import pack_geometry

        p_b, a_b, r_b, m_b = in_batched
        # Episode-batched kernel fast path (BASELINE config 4 sweeps): one
        # shared beam table, per-episode observations.  Anything else (a
        # batched beam table, higher-rank batching) takes the dense vmap.
        # Padding gate: the kernel is compute-bound, so tile padding is
        # pure waste.  Small episodes pack several-per-tile (500-particle
        # sweeps waste 2.4%); ungateable waste (e.g. 600 particles ->
        # 1024-lane rows x 1, or a 1-episode batch padded to a 2-pack
        # group) falls back to the dense path.  Waste counts the FULL
        # launched lanes (episode-axis padding to the pack factor
        # included), not just per-episode padding.
        from ..ops.weights_pallas import TILE

        n_p = p.shape[1] if p_b and p.ndim == 3 else 0
        if n_p > 0:
            _, n_pack, per_ep_waste = pack_geometry(n_p)
            if n_pack > 1:
                # Full (8,128) tiles launch per episode group: dead
                # sublanes and episode-axis padding both count.
                groups = -(-axis_size // n_pack)
                waste = groups * TILE / (axis_size * n_p)
            else:
                waste = per_ep_waste
            pad_ok = waste <= 1.25
        else:
            pad_ok = False
        if p_b and not a_b and p.ndim == 3 and pad_ok:
            rr = ranges if r_b else jnp.broadcast_to(
                ranges, (axis_size,) + ranges.shape)
            mm = mask if m_b else jnp.broadcast_to(
                mask, (axis_size,) + mask.shape)
            return _beam_weights_batched(m, p, angles, rr, mm, cfg,
                                         interpret=interpret), True
        in_axes = [0 if b else None for b in in_batched]
        out = jax.vmap(
            lambda pp, aa, rr, mm: _beam_weights_dense(
                m, pp, Scan(angles=aa, ranges=rr, mask=mm), cfg,
                valid_offset, bits_mode),
            in_axes=in_axes)(p, angles, ranges, mask)
        return out, True

    return fn(particles, scan.angles,
              jnp.broadcast_to(scan.ranges, scan.angles.shape), scan.mask)


def _beam_weights_batched(m, p, angles, ranges, mask, cfg,
                          interpret: bool = False):
    """Episode-batched Pallas launch [E, N, 3] -> [E, N], itself vmappable
    (a further batch axis folds into the episode axis by reshape)."""
    from ..ops.weights_pallas import beam_weights_pallas_batched

    @jax.custom_batching.custom_vmap
    def bfn(pp, aa, rr, mm):
        out = beam_weights_pallas_batched(m, pp, aa, rr, mm, cfg,
                                          interpret=interpret)
        if cfg.beam_combine == "log":
            out = finish_log_weights(m, cfg, pp, out, axis=1)
        return out

    @bfn.def_vmap
    def _brule(axis_size, in_batched, pp, aa, rr, mm):
        p_b, a_b, r_b, m_b = in_batched
        if not p_b or a_b or pp.ndim < 4:
            # A batched beam table cannot share the kernel's SMEM table.
            # Unreachable from beam_weights dispatch (the level-1 vmap rule
            # already routes batched-angles calls to the dense path).
            raise NotImplementedError(
                "unsupported batching pattern for the episode-batched "
                "beam-weight kernel")
        lead = pp.shape[:-2]
        nb = rr.shape[-1]
        rr = rr if r_b else jnp.broadcast_to(rr, (axis_size,) + rr.shape)
        mm = mm if m_b else jnp.broadcast_to(mm, (axis_size,) + mm.shape)
        out = bfn(pp.reshape(-1, *pp.shape[-2:]), aa,
                  jnp.broadcast_to(rr, lead + (nb,)).reshape(-1, nb),
                  jnp.broadcast_to(mm, lead + (nb,)).reshape(-1, nb))
        return out.reshape(*lead, -1), True

    return bfn(p, angles, ranges, mask)


def ray_disc_distance(ox, oy, angle, cx, cy, radius, max_range):
    """Distance along the ray to a disc obstacle (max_range if missed).

    Closed-form ray/circle intersection — models UNMAPPED dynamic
    obstacles (a person crossing the maze): the scan sees them, the map
    raster the filter matches against does not.
    """
    dx = jnp.cos(angle)
    dy = jnp.sin(angle)
    fx = ox - cx
    fy = oy - cy
    b = fx * dx + fy * dy                       # |d| = 1
    c = fx * fx + fy * fy - radius * radius
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = (disc >= 0.0) & (t >= 0.0) & (t < max_range)
    return jnp.where(hit, t, max_range)


def simulate_scan(m: MazeMap, pose, scan_angles, cfg: SensorModelConfig,
                  key: Optional[jax.Array] = None,
                  noise_sigma: Optional[float] = None,
                  dropout_p: float = 0.0, outlier_p: float = 0.0,
                  obstacle=None) -> Scan:
    """Generate an observed scan from a ground-truth pose.

    Uses the same geometry the filter predicts with (offset + negation), so a
    particle at the true pose scores the maximum-likelihood weight.  Optional
    Gaussian range noise; ranges clamp to [0, max_range].

    Robustness knobs (all need `key`):
      * dropout_p — per-beam probability of returning the NaN-replacement
        radius (cfg.invalid_beam_range), i.e. the reference's dead-beam
        path (monte_carlo.cpp:254-278) exercised synthetically;
      * outlier_p — per-beam probability of a uniform [0, max_range)
        spurious return (exercises the w_rand mixture term);
      * obstacle — (cx, cy, radius): unmapped disc the rays hit first.
    """
    pose = jnp.asarray(pose, jnp.float32)
    angles_arr = jnp.asarray(scan_angles, jnp.float32)
    ranges = expected_ranges(m, pose, angles_arr, cfg)
    if obstacle is not None:
        cx, cy, radius = obstacle
        x, y, theta = pose[..., 0], pose[..., 1], pose[..., 2]
        ox = x + cfg.laser_offset * jnp.cos(theta)
        oy = y + cfg.laser_offset * jnp.sin(theta)
        sign = -1.0 if cfg.negate_beam_angle else 1.0
        ray_angle = theta[..., None] + sign * angles_arr
        d_obs = ray_disc_distance(ox[..., None], oy[..., None], ray_angle,
                                  cx, cy, radius, cfg.max_range)
        ranges = jnp.minimum(ranges, d_obs)
    if key is not None:
        k_noise, k_drop, k_out, k_outv = jax.random.split(key, 4)
        sigma = cfg.sigma if noise_sigma is None else noise_sigma
        ranges = ranges + sigma * jax.random.normal(k_noise, ranges.shape)
        ranges = jnp.clip(ranges, 0.0, cfg.max_range)
        if outlier_p > 0.0:
            spurious = jax.random.uniform(k_outv, ranges.shape,
                                          maxval=cfg.max_range)
            ranges = jnp.where(
                jax.random.uniform(k_out, ranges.shape) < outlier_p,
                spurious, ranges)
        if dropout_p > 0.0:
            ranges = jnp.where(
                jax.random.uniform(k_drop, ranges.shape) < dropout_p,
                cfg.invalid_beam_range, ranges)
        return make_scan(scan_angles, ranges)
    ranges = jnp.clip(ranges, 0.0, cfg.max_range)
    return make_scan(scan_angles, ranges)
