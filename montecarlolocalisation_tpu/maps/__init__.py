"""Map pipeline: map.txt parsing, occupancy rasterization, transforms."""
from . import maze, raster, grid
from .grid import MazeMap, from_walls, from_map_file

__all__ = ["maze", "raster", "grid", "MazeMap", "from_walls", "from_map_file"]
