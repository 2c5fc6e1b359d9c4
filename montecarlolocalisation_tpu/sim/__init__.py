"""Simulation: dynamics, scans, episodes, closed-loop, align, plan exec."""
from . import robot, closed_loop, align_sim, plan_exec

__all__ = ["robot", "closed_loop", "align_sim", "plan_exec"]
