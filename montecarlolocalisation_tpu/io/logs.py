"""Episode log + checkpoint I/O.

The reference has no persistence at all (SURVEY.md §5: filter state is
in-memory, encoders reset at startup).  Here both are first-class:

  * EpisodeLog — the replay schema: per-tick encoder readings and filtered
    scans (latest-wins semantics, indexed by tick like the reference's
    queue-size-1 topics), plus optional ground truth.  Saved as .npz.
  * checkpoints — any filter state (MCLState is a pytree) round-trips
    through flatten -> npz; resuming an episode mid-run is exact.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

import jax
import numpy as np


@dataclasses.dataclass
class EpisodeLog:
    """Recorded (or simulated) sensor log for one episode."""

    encoders: np.ndarray          # [T, 2] cumulative wheel radians
    scan_ranges: np.ndarray       # [T, B]
    scan_angles: np.ndarray       # [B] static beam table
    scan_mask: Optional[np.ndarray] = None   # [T, B] bool
    true_poses: Optional[np.ndarray] = None  # [T, 3] ground truth if known
    meta: Optional[Dict[str, Any]] = None

    @property
    def num_ticks(self) -> int:
        return self.encoders.shape[0]

    def save(self, path: str) -> None:
        arrays = dict(
            encoders=np.asarray(self.encoders),
            scan_ranges=np.asarray(self.scan_ranges),
            scan_angles=np.asarray(self.scan_angles),
        )
        if self.scan_mask is not None:
            arrays["scan_mask"] = np.asarray(self.scan_mask)
        if self.true_poses is not None:
            arrays["true_poses"] = np.asarray(self.true_poses)
        arrays["meta_json"] = np.frombuffer(
            json.dumps(self.meta or {}).encode(), dtype=np.uint8)
        np.savez_compressed(path, **arrays)

    @staticmethod
    def load(path: str) -> "EpisodeLog":
        z = np.load(path)
        meta = json.loads(bytes(z["meta_json"]).decode()) if "meta_json" in z else {}
        return EpisodeLog(
            encoders=z["encoders"],
            scan_ranges=z["scan_ranges"],
            scan_angles=z["scan_angles"],
            scan_mask=z.get("scan_mask"),
            true_poses=z.get("true_poses"),
            meta=meta,
        )


def save_pytree(path: str, tree: Any) -> None:
    """Checkpoint any pytree of arrays to .npz (MCLState included)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["treedef_repr"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a checkpoint into the structure of `like` (same treedef)."""
    z = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(like)
    n = treedef.num_leaves
    leaves = [z[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
