"""ROS `map_server` occupancy-map import: PGM image + YAML metadata.

The reference ships its maze as a Python-literal wall list (map.txt) and
rasterizes it itself (publish_map_rviz.cpp:306-437).  Users coming from the
ROS ecosystem usually have maps in the `map_server` format instead — a
grayscale PGM image plus a YAML file:

    image: maze.pgm
    resolution: 0.1
    origin: [0.0, 0.0, 0.0]
    negate: 0
    occupied_thresh: 0.65
    free_thresh: 0.196

This module loads that format into the framework's `MazeMap` so every
surface (filter, Pallas kernels, planner, presets) runs on imported maps.
Conversion follows map_server semantics exactly:

  * occupancy p = (255 - v)/255 per pixel (v/255 when `negate: 1`),
  * p > occupied_thresh -> occupied, p < free_thresh -> free,
    otherwise unknown (trinary, like map_server's -1),
  * image row 0 is the TOP of the map (world y decreases down the image),
    so rows are flipped into the framework's row-index == y convention.

Unknown cells default to OCCUPIED for the binary filter raster (rays stop
at the explored frontier and the validity stencil keeps particles out of
unexplored space); pass unknown="free" to treat them as free instead.

The maze-cell layer (uniform sampler, BFS/TSP planner, plan executor)
needs a wall tensor; `grid.from_raster` synthesizes one by sampling the
raster's cell-edge bands — see its docstring for the rules.
"""
from __future__ import annotations

import os.path as osp
import re
from typing import Optional, Tuple

import numpy as np

from ..config import GridConfig
from . import grid


def load_pgm(path: str) -> np.ndarray:
    """Read a PGM (P5 binary or P2 ASCII) image into uint8 [H, W].

    Values are rescaled to 0..255 when maxval != 255.  16-bit P5 is
    big-endian per the Netpbm spec.
    """
    with open(path, "rb") as f:
        data = f.read()

    # Header tokens: magic, width, height, maxval — comments (# ...) can
    # appear anywhere between tokens.
    tokens = []
    pos = 0
    while len(tokens) < 4:
        m = re.compile(rb"\s*(#[^\n]*\n|\S+)").match(data, pos)
        if m is None:
            raise ValueError(f"{path}: truncated PGM header")
        pos = m.end()
        tok = m.group(1)
        if not tok.startswith(b"#"):
            tokens.append(tok)
    magic = tokens[0]
    if magic not in (b"P2", b"P5"):
        raise ValueError(f"{path}: not a PGM file (magic {magic!r})")
    width, height, maxval = (int(t) for t in tokens[1:])
    if not (0 < maxval < 65536):
        raise ValueError(f"{path}: bad maxval {maxval}")

    if magic == b"P5":
        # Exactly one whitespace byte separates maxval from raster data.
        dtype = np.dtype(">u2") if maxval > 255 else np.uint8
        raster = np.frombuffer(
            data, dtype=dtype, count=width * height, offset=pos + 1)
    else:
        raster = np.array(data[pos:].split()[: width * height], dtype=np.int64)
        if raster.size != width * height:
            raise ValueError(f"{path}: truncated P2 raster")
    img = raster.reshape(height, width).astype(np.float64)
    if maxval != 255:
        img = img * (255.0 / maxval)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def save_pgm(path: str, img: np.ndarray) -> None:
    """Write a uint8 [H, W] image as binary PGM (P5) — export/test helper."""
    img = np.asarray(img, dtype=np.uint8)
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def parse_map_yaml(path: str) -> dict:
    """Parse a map_server YAML file (flat keys + the origin list).

    Uses PyYAML when available; otherwise a minimal parser covering the
    map_server schema (scalars and one-line [x, y, yaw] lists).
    """
    with open(path) as f:
        text = f.read()
    try:
        import yaml  # type: ignore

        doc = yaml.safe_load(text)
        if not isinstance(doc, dict):
            raise ValueError(f"{path}: expected a YAML mapping")
        return doc
    except ImportError:
        pass
    doc = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = (s.strip() for s in line.split(":", 1))
        if val.startswith("[") and val.endswith("]"):
            doc[key] = [float(v) for v in val[1:-1].split(",") if v.strip()]
        else:
            try:
                doc[key] = int(val)
            except ValueError:
                try:
                    doc[key] = float(val)
                except ValueError:
                    doc[key] = val.strip("'\"")
    return doc


def occupancy_from_image(
    img: np.ndarray,
    negate: bool = False,
    occupied_thresh: float = 0.65,
    free_thresh: float = 0.196,
) -> np.ndarray:
    """uint8 image -> trinary int8 occupancy (100 wall / 0 free / -1 unknown).

    map_server semantics: p = (255 - v)/255 (darker = more occupied), or
    v/255 when negate; p > occupied_thresh -> 100, p < free_thresh -> 0,
    else -1.  NO vertical flip here — callers flip (`from_pgm`) because
    this also serves already-row-major arrays in tests.
    """
    v = np.asarray(img, dtype=np.float64)
    p = v / 255.0 if negate else (255.0 - v) / 255.0
    out = np.full(v.shape, -1, dtype=np.int8)
    out[p > occupied_thresh] = 100
    out[p < free_thresh] = 0
    return out


def to_pgm_image(occ: np.ndarray) -> np.ndarray:
    """Binary/trinary occupancy -> map_server-style uint8 image rows
    (TOP row first).  Walls -> 0 (black), free -> 254, unknown -> 205."""
    occ = np.asarray(occ)
    img = np.where(occ > 0, 0, np.where(occ < 0, 205, 254)).astype(np.uint8)
    return img[::-1]


def export_raster(occ, resolution: float, origin_x: float, origin_y: float,
                  pgm_path: str, yaml_path: Optional[str] = None) -> None:
    """Write a binary/trinary occupancy raster (>0 wall, <0 unknown, 0
    free) as map_server PGM (+YAML)."""
    save_pgm(pgm_path, to_pgm_image(np.asarray(occ)))
    if yaml_path is not None:
        with open(yaml_path, "w") as f:
            f.write(
                "image: %s\nresolution: %s\norigin: [%s, %s, 0.0]\n"
                "negate: 0\noccupied_thresh: 0.65\nfree_thresh: 0.196\n"
                % (osp.basename(pgm_path), resolution, origin_x, origin_y))


def export_map(m, pgm_path: str, yaml_path: Optional[str] = None) -> None:
    """Write a MazeMap's raster as map_server PGM (+YAML) — the inverse of
    `from_pgm`, so framework maps interoperate with ROS tooling."""
    export_raster(np.asarray(m.occ).astype(np.int8) * 100,
                  m.resolution, m.origin_x, m.origin_y, pgm_path, yaml_path)


def from_pgm(
    yaml_path: str,
    cell_meters: Optional[float] = None,
    unknown: str = "occupied",
    keep_origin: bool = False,
    grid_cfg: GridConfig = GridConfig(),
) -> "grid.MazeMap":
    """Load a map_server YAML+PGM pair into a MazeMap.

    unknown: "occupied" (default — rays stop at the explored frontier and
    the validity stencil keeps particles out of unexplored space) or
    "free".

    keep_origin: by default the map is placed in its LOCAL frame (origin
    at (0, 0), matching the reference's own convention); poses are then
    relative to the map's lower-left corner.  True preserves the YAML
    origin — the filter core (ray cast, likelihood, validity) respects
    it, but the maze-cell helpers (uniform sampler cells, planner
    waypoints) assume the 0-origin lattice and should not be used.

    cell_meters: lattice pitch for the synthesized maze-cell layer
    (defaults to grid_cfg.cell_meters = the reference's 0.8 m).
    """
    doc = parse_map_yaml(yaml_path)
    for key in ("image", "resolution"):
        if key not in doc:
            raise ValueError(f"{yaml_path}: missing '{key}'")
    img_path = doc["image"]
    if not osp.isabs(img_path):
        img_path = osp.join(osp.dirname(osp.abspath(yaml_path)), img_path)
    img = load_pgm(img_path)
    tri = occupancy_from_image(
        img,
        negate=bool(doc.get("negate", 0)),
        occupied_thresh=float(doc.get("occupied_thresh", 0.65)),
        free_thresh=float(doc.get("free_thresh", 0.196)),
    )[::-1]  # image row 0 = map TOP; MazeMap row index == y
    if unknown == "occupied":
        occ = tri != 0
    elif unknown == "free":
        occ = tri > 0
    else:
        raise ValueError(f"unknown= must be 'occupied' or 'free', "
                         f"got {unknown!r}")
    origin = doc.get("origin", [0.0, 0.0, 0.0])
    if keep_origin and len(origin) > 2 and abs(float(origin[2])) > 1e-9:
        raise ValueError("rotated map origins (yaw != 0) are not supported")
    return grid.from_raster(
        occ,
        resolution=float(doc["resolution"]),
        origin_x=float(origin[0]) if keep_origin else 0.0,
        origin_y=float(origin[1]) if keep_origin else 0.0,
        cell_meters=(grid_cfg.cell_meters if cell_meters is None
                     else float(cell_meters)),
    )
