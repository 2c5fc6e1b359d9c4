"""Map pipeline: map.txt parsing, rasterization, transforms, generation,
map_server (PGM + YAML) import/export."""
from . import maze, raster, grid, generator, pgm
from .grid import MazeMap, from_walls, from_map_file, from_raster
from .pgm import from_pgm

__all__ = ["maze", "raster", "grid", "generator", "pgm", "MazeMap",
           "from_walls", "from_map_file", "from_raster", "from_pgm"]
