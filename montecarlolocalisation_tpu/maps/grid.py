"""Device-side map container and world<->grid transforms (jit-safe).

Reproduces the coordinate conventions of the reference MCL node:
  * worldToMap (monte_carlo.cpp:298-315): pixel = trunc((w - origin)/res),
    C++ static_cast<int> truncation-toward-zero included (so world coords in
    (-res, 0) land on pixel 0 and count as in-bounds — a reference quirk that
    affects particles hugging the outer wall).
  * getCell (monte_carlo.cpp:317-321): data[row=my][col=mx], occupancy > 50
    means wall.
  * isInsideMap (monte_carlo.cpp:685-692): world-extent bounds.
  * isValidPos (monte_carlo.cpp:331-349): 9-point stencil, +-0.1 m offsets.

World x runs along raster columns, world y along raster rows (y-down row
indexing; see publish_map_rviz.cpp:306-437 and SURVEY.md §2.3).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GridConfig
from . import maze, raster


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MazeMap:
    """Occupancy map on device.  `occ` is a bool [H, W] (True = wall)."""

    occ: jax.Array                       # [H, W] bool, row-major (y, x)
    occ_dilated: jax.Array               # [H, W] bool 3x3 dilation (validity)
    occ_f: jax.Array                     # [H, W] bf16 (MXU one-hot lookups)
    dil_f: jax.Array                     # [H, W] bf16 dilated
    occ_pad: jax.Array                   # [H16, W128] f32 (Pallas kernel)
    dil_pad: jax.Array                   # [H16, W128] f32 dilated
    walls: jax.Array                     # [R, C, 4] bool wall tensor
    row_lengths: jax.Array               # [R] int32 (ragged-row accounting)
    resolution: float = dataclasses.field(metadata=dict(static=True), default=0.1)
    origin_x: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    origin_y: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    cell_meters: float = dataclasses.field(metadata=dict(static=True), default=0.8)

    @property
    def height(self) -> int:
        return self.occ.shape[0]

    @property
    def width(self) -> int:
        return self.occ.shape[1]

    @property
    def n_rows(self) -> int:
        return self.walls.shape[0]

    @property
    def n_cols(self) -> int:
        return self.walls.shape[1]

    @property
    def extent_x(self) -> float:
        return self.origin_x + self.width * self.resolution

    @property
    def extent_y(self) -> float:
        return self.origin_y + self.height * self.resolution


def from_walls(
    walls: Sequence[Sequence[Sequence[int]]],
    grid: GridConfig = GridConfig(),
) -> MazeMap:
    occ = raster.rasterize_walls(walls, grid) > grid.occupied_threshold
    # 3x3 dilation: the isValidPos +-0.1 m stencil equals one lookup into the
    # dilated raster (offsets are exactly one pixel; border clipping matches
    # the out-of-map-is-free rule).  Precomputed once on host.
    dil = np.zeros_like(occ)
    h, w = occ.shape
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys = slice(max(0, dy), h + min(0, dy))
            xs = slice(max(0, dx), w + min(0, dx))
            yd = slice(max(0, -dy), h + min(0, -dy))
            xd = slice(max(0, -dx), w + min(0, -dx))
            dil[yd, xd] |= occ[ys, xs]
    def pad16_128(t):
        hp = ((t.shape[0] + 15) // 16) * 16
        wp = ((t.shape[1] + 127) // 128) * 128
        out = np.zeros((hp, wp), dtype=np.float32)
        out[: t.shape[0], : t.shape[1]] = t
        return out

    return MazeMap(
        occ=jnp.asarray(occ),
        occ_dilated=jnp.asarray(dil),
        occ_f=jnp.asarray(occ, jnp.bfloat16),
        dil_f=jnp.asarray(dil, jnp.bfloat16),
        occ_pad=jnp.asarray(pad16_128(occ)),
        dil_pad=jnp.asarray(pad16_128(dil)),
        walls=jnp.asarray(maze.walls_to_tensor(walls)),
        row_lengths=jnp.asarray(maze.row_lengths(walls)),
        resolution=grid.resolution,
        origin_x=grid.origin_x,
        origin_y=grid.origin_y,
        cell_meters=grid.cell_meters,
    )


def from_map_file(path: str, grid: GridConfig = GridConfig()) -> MazeMap:
    return from_walls(maze.load_map_file(path), grid)


def world_to_map(m: MazeMap, wx, wy):
    """World -> pixel indices + in-bounds mask (monte_carlo.cpp:298-315).

    Uses C++ truncation-toward-zero semantics (astype int32), not floor.
    """
    mx = ((wx - m.origin_x) / m.resolution).astype(jnp.int32)
    my = ((wy - m.origin_y) / m.resolution).astype(jnp.int32)
    inb = (mx >= 0) & (my >= 0) & (mx < m.width) & (my < m.height)
    return mx, my, inb


def get_cell(m: MazeMap, mx, my):
    """Occupancy at pixel (clamped gather; caller masks out-of-bounds)."""
    mx = jnp.clip(mx, 0, m.width - 1)
    my = jnp.clip(my, 0, m.height - 1)
    return m.occ[my, mx]


def is_occupied(m: MazeMap, wx, wy):
    """True when the pixel under (wx, wy) is a wall; False out-of-map
    (monte_carlo.cpp:322-329)."""
    mx, my, inb = world_to_map(m, wx, wy)
    return inb & get_cell(m, mx, my)


def is_inside_map(m: MazeMap, wx, wy):
    """World-extent bounds check (monte_carlo.cpp:685-692)."""
    return (
        (wx >= m.origin_x)
        & (wx < m.extent_x)
        & (wy >= m.origin_y)
        & (wy < m.extent_y)
    )


# 9-point stencil offsets (monte_carlo.cpp:334-338), scaled by the offset.
_STENCIL = np.array(
    [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)],
    dtype=np.float32,
)


def is_valid_pos_stencil(m: MazeMap, wx, wy, offset: float = 0.1):
    """Reference-exact 9-point stencil check (monte_carlo.cpp:331-349)."""
    wx = jnp.asarray(wx)
    sx = wx[..., None] + offset * _STENCIL[:, 0]
    sy = jnp.asarray(wy)[..., None] + offset * _STENCIL[:, 1]
    hit = is_occupied(m, sx, sy)
    return is_inside_map(m, wx, jnp.asarray(wy)) & ~jnp.any(hit, axis=-1)


def is_valid_pos(m: MazeMap, wx, wy, offset: float = 0.1):
    """Free-space check: inside map and no wall within the +-offset stencil
    (monte_carlo.cpp:331-349 isValidPos).

    Fast path: when the stencil offset equals one pixel (the reference's
    0.1 m at 0.1 m/px), the 9 lookups collapse to ONE lookup into the
    precomputed 3x3-dilated raster — identical semantics away from exact
    pixel-boundary float ties (sub-1e-6 measure; use is_valid_pos_stencil
    for bit-parity studies)."""
    if abs(offset - m.resolution) > 1e-9:
        return is_valid_pos_stencil(m, wx, wy, offset)
    wx = jnp.asarray(wx)
    wy = jnp.asarray(wy)
    mx, my, inb = world_to_map(m, wx, wy)
    mx = jnp.clip(mx, 0, m.width - 1)
    my = jnp.clip(my, 0, m.height - 1)
    hit = inb & m.occ_dilated[my, mx]
    return is_inside_map(m, wx, wy) & ~hit


def world_to_cell(wx, wy, cell_meters: float = 0.8):
    """World (x, y) -> maze (row, col) (monte_carlo.cpp:975-979).

    col = floor((wx - 0.4)/0.8 + 0.5), row likewise from wy.
    """
    col = jnp.floor((wx - 0.5 * cell_meters) / cell_meters + 0.5).astype(jnp.int32)
    row = jnp.floor((wy - 0.5 * cell_meters) / cell_meters + 0.5).astype(jnp.int32)
    return row, col


def cell_center(row, col, cell_meters: float = 0.8):
    """Maze (row, col) -> world center (monte_carlo.cpp:394-407 to_cell)."""
    x = col * cell_meters + 0.5 * cell_meters
    y = row * cell_meters + 0.5 * cell_meters
    return x, y
