from . import angles

__all__ = ["angles"]
