"""Model components: ray casting, sensor likelihood, motion, filter."""
from . import (raycast, sensor, motion, resample, refine, cluster, filter,
               diagnostics)

__all__ = ["raycast", "sensor", "motion", "resample", "refine", "cluster",
           "filter", "diagnostics"]
