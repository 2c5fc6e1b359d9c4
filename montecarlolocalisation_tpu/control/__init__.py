"""Closed-loop motion control: PID, APF variants, wanderer, alignment."""
from . import controllers

__all__ = ["controllers"]
