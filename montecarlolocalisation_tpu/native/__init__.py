"""Native host components (C++ via ctypes): planner, scan filter, rasterizer."""
from . import build

__all__ = ["build"]
