"""TPU-optimized ops: MXU one-hot lookups, fused Pallas kernels."""
from . import lookup

__all__ = ["lookup"]
