"""Gather-free map lookups: bit-packed select chains over a static raster.

TPU has no per-lane gather, and the one-hot MXU trick still materializes
big intermediates in HBM under XLA.  This module removes the lookup problem
entirely for the (static-per-jit) maze raster:

  * each raster row packs into two uint32 bit words (W <= 64);
  * `table[my, mx]` becomes a chain of lane-wise selects against SCALAR
    constants (the packed words, baked into the program at trace time),
    followed by a variable shift — a pure elementwise computation XLA fuses
    with the surrounding ray-march arithmetic: zero memory traffic.
  * maze rasters place wall pixels only on multiple-of-8 gridline rows/cols
    (publish_map_rviz.cpp drawing rules, rectangular maps), which shrinks
    the select chain from H entries to H/8: ~40 VPU ops per lookup.

The factory runs on HOST values (numpy) at trace time, so it requires the
map to be a concrete (non-traced) array — true whenever the MazeMap is
closed over by jit, the normal usage.  Callers fall back to gather/one-hot
paths for traced maps (e.g. inside vmap-over-maps).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


def _pack_rows(table: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[H, W<=64] bool -> per-row (lo, hi) uint32 bit words."""
    h, w = table.shape
    if w > 64:
        raise ValueError(f"bitlookup supports W<=64, got {w}")
    lo = np.zeros(h, dtype=np.uint32)
    hi = np.zeros(h, dtype=np.uint32)
    for r in range(h):
        for c in range(w):
            if table[r, c]:
                if c < 32:
                    lo[r] |= np.uint32(1 << c)
                else:
                    hi[r] |= np.uint32(1 << (c - 32))
    return lo, hi


def _select_words(idx, entries_lo, entries_hi):
    """Select (lo, hi) words by idx via a chain of scalar-constant selects."""
    word_lo = jnp.zeros_like(idx, dtype=jnp.uint32)
    word_hi = jnp.zeros_like(idx, dtype=jnp.uint32)
    for h, (lo, hi) in enumerate(zip(entries_lo, entries_hi)):
        if lo:
            word_lo = jnp.where(idx == h, jnp.uint32(lo), word_lo)
        if hi:
            word_hi = jnp.where(idx == h, jnp.uint32(hi), word_hi)
    return word_lo, word_hi


def _test_bit(word_lo, word_hi, col):
    col = col.astype(jnp.uint32)
    in_lo = col < 32
    shift = jnp.where(in_lo, col, col - 32)
    word = jnp.where(in_lo, word_lo, word_hi)
    return ((word >> shift) & jnp.uint32(1)) == 1


def _is_gridline_structured(table: np.ndarray, cell_px: int = 8) -> bool:
    """True when wall pixels only sit on multiple-of-cell_px rows/cols."""
    h, w = table.shape
    rows = np.arange(h) % cell_px == 0
    cols = np.arange(w) % cell_px == 0
    off_grid = table & ~rows[:, None] & ~cols[None, :]
    return not off_grid.any()


def make_bit_lookup(table: np.ndarray, cell_px: int = 8) -> Callable:
    """Build `lookup(my, mx) -> bool` (False out of range) for a static
    0/1 table.  Chooses the gridline-decomposed fast path when possible."""
    table = np.asarray(table).astype(bool)
    h, w = table.shape

    if _is_gridline_structured(table, cell_px):
        # Horizontal gridline rows: rows r*cell_px, bits over all cols.
        n_hrows = (h - 1) // cell_px + 1
        hrows = table[::cell_px]                       # [n_hrows, W]
        hlo, hhi = _pack_rows(hrows)
        # Vertical gridline cols: cols c*cell_px, bits over all rows.
        n_vcols = (w - 1) // cell_px + 1
        vcols = table[:, ::cell_px].T                  # [n_vcols, H]
        vlo, vhi = _pack_rows(vcols)

        def lookup(my, mx):
            inb = (my >= 0) & (mx >= 0) & (my < h) & (mx < w)
            myc = jnp.clip(my, 0, h - 1)
            mxc = jnp.clip(mx, 0, w - 1)
            on_h = (myc % cell_px) == 0
            on_v = (mxc % cell_px) == 0
            h_idx = jnp.where(on_h, myc // cell_px, n_hrows)
            v_idx = jnp.where(on_v, mxc // cell_px, n_vcols)
            hw_lo, hw_hi = _select_words(h_idx, hlo, hhi)
            vw_lo, vw_hi = _select_words(v_idx, vlo, vhi)
            hit_h = _test_bit(hw_lo, hw_hi, mxc)
            hit_v = _test_bit(vw_lo, vw_hi, myc)
            return inb & (hit_h | hit_v)

        return lookup

    # General path: full per-row select chain.
    lo, hi = _pack_rows(table)

    def lookup_general(my, mx):
        inb = (my >= 0) & (mx >= 0) & (my < h) & (mx < w)
        myc = jnp.clip(my, 0, h - 1)
        mxc = jnp.clip(mx, 0, w - 1)
        w_lo, w_hi = _select_words(myc, lo, hi)
        return inb & _test_bit(w_lo, w_hi, mxc)

    return lookup_general


class MapBitTables:
    """Cached bit-lookup closures for a MazeMap (built once per map)."""

    _cache: dict = {}

    @classmethod
    def get(cls, m) -> Tuple[Callable, Callable]:
        """(occ_lookup, dilated_lookup) for a CONCRETE MazeMap."""
        occ = np.asarray(m.occ)
        key = occ.tobytes()
        hit = cls._cache.get(key)
        if hit is None:
            hit = (make_bit_lookup(occ),
                   make_bit_lookup(np.asarray(m.occ_dilated)))
            cls._cache[key] = hit
        return hit


def is_concrete_map(m) -> bool:
    """True when the map arrays hold real values (not tracers)."""
    import jax.core

    return not isinstance(m.occ, jax.core.Tracer)
