"""Planning & mission: BFS wall-graph paths, Held-Karp TSP, plan execution."""
from . import bfs, tsp, executor, mission

__all__ = ["bfs", "tsp", "executor", "mission"]
