"""Simulation: ground-truth dynamics, scans, episodes, closed-loop, align."""
from . import robot, closed_loop, align_sim

__all__ = ["robot", "closed_loop", "align_sim"]
