from . import angles, songs, profiling, viz

__all__ = ["angles", "songs", "profiling", "viz"]
