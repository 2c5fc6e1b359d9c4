"""Occupancy-grid mapping from scans: learn the map the filter localizes in.

No reference counterpart — the reference REQUIRES a hand-written map.txt
(publish_map.py); its stack cannot produce a map from sensor data.  This
module closes that loop: drive (wanderer), record scans, build the
occupancy grid, then localize/plan on the LEARNED map
(maps/grid.from_raster + synthesize_walls give the planner-ready wall
tensor).  Mapping + the existing filter = the full explore -> map ->
localize -> plan autonomy loop.

TPU-native design.  The classical implementation walks each beam with
Bresenham and scatters log-odds updates into cells — per-element scatter
serializes on TPU.  Here the update is turned inside out into a DENSE
inverse sensor model: for every (pixel, beam) pair, closed-form ray
geometry (longitudinal projection + perpendicular distance) classifies the
pixel as free-space (crossed by the beam short of its return), hit (the
wall pixel body just past the return), or untouched; summing over beams
gives the per-pixel log-odds delta.  [H, W, B] broadcast compute, zero
scatter/gather, one fused XLA kernel per tick — at the reference's map
size (49 x 49 x 34 beams) a tick costs ~3M flops, so full episodes run
under `lax.scan` and fleets of mappers under `vmap`.

Sensor geometry matches the filter exactly (models/sensor.expected_ranges):
ray origin `laser_offset` ahead of the pose along its heading
(monte_carlo.cpp:643-645), beam angle negated when cfg.negate_beam_angle
(:653).  Hit evidence is deposited on [r, r + res] along the ray — the
casters return the distance to the occupied pixel's NEAR face, so the
pixel body lies one resolution beyond the return.

Log-odds fusion: evidence adds, so maps from independent robots/episodes
fuse by summation (`fuse_maps`), and a map is checkpointable as a plain
array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MappingConfig, SensorModelConfig


def init_map(cfg: MappingConfig):
    """Uniform-prior log-odds grid [H, W] (0 = unknown)."""
    return jnp.zeros((cfg.height, cfg.width), jnp.float32)


def update_map(logodds, pose, ranges, angles, mask, cfg: MappingConfig,
               sensor_cfg: SensorModelConfig):
    """One scan's dense inverse-sensor-model update.  jit/scan/vmap-safe.

    pose [3] world (x, y, theta); ranges/angles/mask [B].  Beams whose
    return is at/right of max_range carve free space but deposit no hit
    (no-return); masked-out beams contribute nothing.
    """
    res = cfg.resolution
    x, y, theta = pose[0], pose[1], pose[2]
    ox = x + sensor_cfg.laser_offset * jnp.cos(theta)
    oy = y + sensor_cfg.laser_offset * jnp.sin(theta)
    sign = -1.0 if sensor_cfg.negate_beam_angle else 1.0
    ray = theta + sign * angles                       # [B]
    cb = jnp.cos(ray)
    sb = jnp.sin(ray)

    # Pixel-center world coords.
    pxx = cfg.origin_x + (jnp.arange(cfg.width, dtype=jnp.float32) + 0.5) * res
    pxy = cfg.origin_y + (jnp.arange(cfg.height, dtype=jnp.float32) + 0.5) * res
    dxp = (pxx[None, :] - ox)[..., None]              # [1, W, 1]
    dyp = (pxy[:, None] - oy)[..., None]              # [H, 1, 1]

    proj = dxp * cb + dyp * sb                        # [H, W, B]
    perp = jnp.abs(dyp * cb - dxp * sb)

    r = jnp.asarray(ranges, jnp.float32)
    valid = jnp.asarray(mask, jnp.float32) * (
        r <= cfg.max_trusted_range).astype(jnp.float32)
    returned = (r < sensor_cfg.max_range - 1e-6).astype(jnp.float32)

    on_ray = (perp <= cfg.half_width).astype(jnp.float32) * valid
    free = on_ray * ((proj >= 0.0)
                     & (proj < r - cfg.hit_margin)).astype(jnp.float32)
    # The wall pixel CENTER sits ~res/2 past the near-face return, so the
    # hit window is [r - hit_margin, r + hit_depth] with hit_depth ~
    # 0.7*res: deep enough to cover the wall pixel center under range
    # noise, shallow enough that oblique rays — whose along-ray window
    # drifts LATERALLY behind thin walls — do not paint the open pixel
    # diagonally behind the wall (measured: a full-res far side painted
    # phantom walls on corridor bands next to corners).
    hit = on_ray * returned * (
        (proj >= r - cfg.hit_margin)
        & (proj <= r + cfg.hit_depth)).astype(jnp.float32)

    delta = cfg.l_occ * jnp.sum(hit, axis=-1) - cfg.l_free * jnp.sum(
        free, axis=-1)
    return jnp.clip(logodds + delta, -cfg.clamp, cfg.clamp)


def map_episode(poses, scan_ranges, scan_angles, cfg: MappingConfig,
                sensor_cfg: SensorModelConfig, scan_mask=None,
                logodds=None):
    """Fold a whole episode's scans into one map with `lax.scan`.

    poses [T, 3] (ground-truth or filter-estimated), scan_ranges [T, B],
    scan_angles [B] static beam table, scan_mask [T, B] optional.  vmap
    over a leading episode axis for parallel mappers (fuse with
    `fuse_maps`).
    """
    angles = jnp.asarray(scan_angles, jnp.float32)
    ranges = jnp.asarray(scan_ranges, jnp.float32)
    if scan_mask is None:
        scan_mask = jnp.ones(ranges.shape, jnp.float32)
    if logodds is None:
        logodds = init_map(cfg)

    def body(lo, xs):
        pose, rng, msk = xs
        return update_map(lo, pose, rng, angles, msk, cfg, sensor_cfg), None

    lo, _ = jax.lax.scan(
        body, logodds,
        (jnp.asarray(poses, jnp.float32), ranges,
         jnp.asarray(scan_mask, jnp.float32)))
    return lo


def dead_reckon_poses(encoders, start_pose, motion_cfg):
    """Cumulative encoder radians [T, 2] -> dead-reckoned poses [T, 3].

    The realistic mapping input when no ground truth exists: integrate
    the encoder log through the reference's midpoint diff-drive model
    (models/motion.diff_drive_update) from a known start pose.  Row t is
    the pose AFTER tick t, aligned with the simulator's truth rows.
    """
    from . import motion

    sp = jnp.asarray(start_pose, jnp.float32)
    state0 = motion.OdometryState(
        x=sp[0], y=sp[1], theta=sp[2],
        encoder_left=jnp.float32(0.0), encoder_right=jnp.float32(0.0))

    def body(st, enc):
        new, _, _, _ = motion.diff_drive_update(st, enc[0], enc[1],
                                                motion_cfg)
        return new, jnp.stack([new.x, new.y, new.theta])

    _, poses = jax.lax.scan(body, state0,
                            jnp.asarray(encoders, jnp.float32))
    return poses


def fuse_maps(logodds_stack):
    """Fuse maps from independent robots/episodes: log-odds evidence adds."""
    return jnp.sum(logodds_stack, axis=0)


def to_occupancy(logodds, threshold: float = 0.0):
    """Log-odds -> boolean occupancy raster (True = wall)."""
    return logodds > threshold


def to_trinary(logodds, occ_threshold: float = 0.5,
               free_threshold: float = -0.5):
    """Log-odds -> map_server trinary int8: 100 occupied, 0 free,
    -1 unknown (in-between evidence).  Feed to maps/pgm.export_raster to
    publish a LEARNED map in ROS map_server format."""
    lo = np.asarray(logodds)
    return np.where(lo > occ_threshold, 100,
                    np.where(lo < free_threshold, 0, -1)).astype(np.int8)


def export_learned_map(logodds, cfg: MappingConfig, pgm_path: str,
                       yaml_path=None) -> None:
    """Write a learned map as a ROS map_server PGM (+YAML) trinary."""
    from ..maps import pgm

    pgm.export_raster(to_trinary(logodds), cfg.resolution, cfg.origin_x,
                      cfg.origin_y, pgm_path, yaml_path)


def fit_walls(logodds, cell_px: int = 8, explored_abs: float = 0.5,
              min_explored_frac: float = 0.4,
              unexplored_is_wall: bool = True) -> np.ndarray:
    """Snap a learned map onto the reference's cell lattice -> [R, C, 4].

    For each lattice edge, pools the log-odds over the edge's OPEN band
    (its pixels excluding the two shared corner pixels — the same band
    maps/grid.synthesize_walls uses).  Pixels with |log-odds| <=
    `explored_abs` are UNOBSERVED; a band observed on at least
    `min_explored_frac` of its pixels is decided by the SIGN of its summed
    evidence, an unobserved band falls back to `unexplored_is_wall`
    (default True — synthesize_walls' conservative planner semantics:
    never route through unknown space).  Pooling makes the decision
    robust to per-pixel speckle of a partially explored map.  (Host-side
    NumPy: this is an offline analysis/export step, not filter-path code.)
    """
    lo = np.asarray(logodds)
    h, w = lo.shape
    n_rows = max(1, (h - 1) // cell_px)
    n_cols = max(1, (w - 1) // cell_px)
    walls = np.zeros((n_rows, n_cols, 4), dtype=bool)

    def band_vote(r0, r1, c0, c1):
        if r0 >= h or c0 >= w or r1 > h or c1 > w:
            return True  # off-raster edges are walls (synthesize_walls rule)
        band = lo[r0:r1, c0:c1]
        if band.size == 0:
            return True
        explored = np.abs(band) > explored_abs
        if np.mean(explored) < min_explored_frac:
            return unexplored_is_wall
        return float(np.sum(band[explored])) > 0.0

    from ..config import WALL_RIGHT, WALL_TOP, WALL_LEFT, WALL_BOTTOM

    for r in range(n_rows):
        for c in range(n_cols):
            r0, c0 = r * cell_px, c * cell_px
            walls[r, c, WALL_TOP] = band_vote(r0, r0 + 1, c0 + 1, c0 + cell_px)
            walls[r, c, WALL_BOTTOM] = band_vote(
                r0 + cell_px, r0 + cell_px + 1, c0 + 1, c0 + cell_px)
            walls[r, c, WALL_LEFT] = band_vote(r0 + 1, r0 + cell_px, c0, c0 + 1)
            walls[r, c, WALL_RIGHT] = band_vote(
                r0 + 1, r0 + cell_px, c0 + cell_px, c0 + cell_px + 1)
    return walls


def wall_metrics(learned: np.ndarray, truth: np.ndarray) -> dict:
    """Precision/recall/F1 of a learned wall tensor against the truth."""
    learned = np.asarray(learned, bool)
    truth = np.asarray(truth, bool)
    tp = float(np.sum(learned & truth))
    fp = float(np.sum(learned & ~truth))
    fn = float(np.sum(~learned & truth))
    prec = tp / max(tp + fp, 1.0)
    rec = tp / max(tp + fn, 1.0)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return dict(precision=prec, recall=rec, f1=f1)
