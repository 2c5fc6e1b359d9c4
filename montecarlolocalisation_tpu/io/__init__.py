"""Persistence: episode logs and pytree checkpoints."""
from . import logs
from .logs import EpisodeLog, save_pytree, load_pytree

__all__ = ["logs", "EpisodeLog", "save_pytree", "load_pytree"]
