"""Persistence & replay: episode logs, pytree checkpoints, preprocessing."""
from . import logs, replay
from .logs import EpisodeLog, save_pytree, load_pytree

__all__ = ["logs", "replay", "EpisodeLog", "save_pytree", "load_pytree"]
