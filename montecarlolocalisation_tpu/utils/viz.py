"""Debug visualization: the TPU-native stand-in for the RViz publishers.

The reference debugs through RViz topics (resampled_particles /
zero_weight_particles / localised_pos PoseArrays, raycast LINE_LIST,
RANSAC lines — SURVEY.md §4.3).  Here the same artifacts render to a plain
RGB numpy image (no plotting dependency) for notebooks, logs, or tests.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# Colors (RGB)
C_BG = (250, 250, 250)
C_WALL = (40, 40, 40)
C_PARTICLE = (70, 130, 220)
C_ZERO = (200, 200, 200)
C_BEST = (220, 60, 60)
C_TRUE = (40, 170, 90)
C_RAY = (240, 160, 60)


def render_map(occ: np.ndarray, scale: int = 8) -> np.ndarray:
    """Occupancy raster -> RGB image (y-down rows match world y)."""
    occ = np.asarray(occ, dtype=bool)
    img = np.empty(occ.shape + (3,), dtype=np.uint8)
    img[...] = C_BG
    img[occ] = C_WALL
    return np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)


def _to_px(x, y, resolution: float, scale: int):
    return (np.asarray(y) / resolution * scale).astype(int), \
           (np.asarray(x) / resolution * scale).astype(int)


def draw_points(img: np.ndarray, xs, ys, color, resolution: float = 0.1,
                scale: int = 8, size: int = 1) -> np.ndarray:
    rows, cols = _to_px(xs, ys, resolution, scale)
    h, w = img.shape[:2]
    for dr in range(-size, size + 1):
        for dc in range(-size, size + 1):
            r = np.clip(rows + dr, 0, h - 1)
            c = np.clip(cols + dc, 0, w - 1)
            img[r, c] = color
    return img


def draw_segment(img: np.ndarray, x0, y0, x1, y1, color,
                 resolution: float = 0.1, scale: int = 8,
                 n: int = 64) -> np.ndarray:
    t = np.linspace(0.0, 1.0, n)
    return draw_points(img, x0 + (x1 - x0) * t, y0 + (y1 - y0) * t, color,
                       resolution, scale, size=0)


def render_filter(occ: np.ndarray, particles=None, weights=None,
                  best_pose=None, true_pose=None,
                  rays: Optional[Tuple] = None, resolution: float = 0.1,
                  scale: int = 8) -> np.ndarray:
    """One frame: map + particle cloud (+zero-weight grey), best, truth,
    rays.  `rays` = (ox, oy, angles, dists)."""
    img = render_map(occ, scale)
    if particles is not None:
        p = np.asarray(particles)
        if weights is not None:
            w = np.asarray(weights)
            zero = w == 0.0
            draw_points(img, p[zero, 0], p[zero, 1], C_ZERO, resolution,
                        scale)
            draw_points(img, p[~zero, 0], p[~zero, 1], C_PARTICLE,
                        resolution, scale)
        else:
            draw_points(img, p[:, 0], p[:, 1], C_PARTICLE, resolution, scale)
    if rays is not None:
        ox, oy, angles, dists = [np.asarray(v) for v in rays]
        for a, d in zip(np.atleast_1d(angles), np.atleast_1d(dists)):
            draw_segment(img, ox, oy, ox + d * np.cos(a),
                         oy + d * np.sin(a), C_RAY, resolution, scale)
    if true_pose is not None:
        tp = np.asarray(true_pose)
        draw_points(img, [tp[0]], [tp[1]], C_TRUE, resolution, scale, size=3)
    if best_pose is not None:
        bp = np.asarray(best_pose)
        if bp[0] >= 0:
            draw_points(img, [bp[0]], [bp[1]], C_BEST, resolution, scale,
                        size=3)
    return img


C_SCAN = (150, 150, 150)
C_INLIER = (70, 130, 220)
C_LINE = (220, 60, 60)
C_PERP = (40, 170, 90)
C_INTERSECT = (150, 60, 200)
C_ORIGIN = (40, 40, 40)


def render_align(px, py, mask, lines, intersection=None,
                 extent_m: float = 1.6, resolution: float = 0.02,
                 scale: int = 1) -> np.ndarray:
    """Align-pipeline debug frame — the RANSAC marker surface the
    reference publishes to RViz (`ransac_lines`, `perpenducular_line`,
    `intersect_line`, align_server.cpp:806-810).

    Robot-frame view centered on the laser: scan points (grey), each
    line's inliers (blue) + fitted segment (red), the origin→foot
    perpendicular (green, perpendicular_foot), and the wall intersection
    (purple).  `lines` are control.align.Line; `intersection` defaults to
    intersect_lines(lines[0], lines[1]) when two lines are present.
    """
    from ..control import align as align_mod

    side = int(round(2 * extent_m / resolution)) + 1
    img = np.empty((side, side, 3), dtype=np.uint8)
    img[...] = C_BG

    def shift(x, y):
        return np.asarray(x) + extent_m, np.asarray(y) + extent_m

    px = np.asarray(px)
    py = np.asarray(py)
    mask = np.asarray(mask, bool)
    draw_points(img, *shift(px[mask], py[mask]), C_SCAN, resolution, scale,
                size=0)
    for ln in lines:
        inl = np.asarray(ln.inlier_mask, bool)
        if inl.any():
            draw_points(img, *shift(px[inl], py[inl]), C_INLIER,
                        resolution, scale, size=0)
        (x0, y0), (x1, y1) = ln.first_inlier, ln.last_inlier
        sx0, sy0 = shift(x0, y0)
        sx1, sy1 = shift(x1, y1)
        draw_segment(img, sx0, sy0, sx1, sy1, C_LINE, resolution, scale,
                     n=256)
        fx, fy = align_mod.perpendicular_foot(ln)
        sfx, sfy = shift(fx, fy)
        sox, soy = shift(0.0, 0.0)
        draw_segment(img, sox, soy, sfx, sfy, C_PERP, resolution, scale,
                     n=128)
        draw_points(img, [sfx], [sfy], C_PERP, resolution, scale, size=2)
    if intersection is None and len(lines) >= 2:
        intersection = align_mod.intersect_lines(lines[0], lines[1])
    if intersection is not None:
        ix, iy = shift(intersection[0], intersection[1])
        draw_points(img, [ix], [iy], C_INTERSECT, resolution, scale, size=3)
    ox, oy = shift(0.0, 0.0)
    draw_points(img, [ox], [oy], C_ORIGIN, resolution, scale, size=2)
    return img


def save_ppm(img: np.ndarray, path: str) -> None:
    """Write RGB uint8 image as binary PPM (no imaging dependency)."""
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(img).tobytes())
