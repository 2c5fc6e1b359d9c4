from . import angles, songs, profiling

__all__ = ["angles", "songs", "profiling"]
