"""Closed-loop motion control: PID, APF variants, wanderer, alignment."""
from . import controllers, align, timed

__all__ = ["controllers", "align", "timed"]
