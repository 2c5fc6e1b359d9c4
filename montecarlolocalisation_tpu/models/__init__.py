"""Model components: ray casting, sensor likelihood, motion, filter."""
from . import raycast, sensor

__all__ = ["raycast", "sensor"]
