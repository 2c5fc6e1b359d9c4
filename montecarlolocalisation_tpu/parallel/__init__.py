"""Scale-out: particle-axis sharding (shard_map) and episode sweeps (vmap)."""
from . import distributed, episodes

__all__ = ["distributed", "episodes"]
