"""Simulation: ground-truth dynamics, scan generation, episode replay."""
from . import robot

__all__ = ["robot"]
