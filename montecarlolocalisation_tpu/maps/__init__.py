"""Map pipeline: map.txt parsing, rasterization, transforms, generation."""
from . import maze, raster, grid, generator
from .grid import MazeMap, from_walls, from_map_file

__all__ = ["maze", "raster", "grid", "generator", "MazeMap", "from_walls",
           "from_map_file"]
