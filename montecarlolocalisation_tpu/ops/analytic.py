"""Analytic slab ray casting: exact first-hit distances in closed form.

Maze rasters (rectangular maps) place wall pixels only on multiple-of-8
gridline rows/columns (publish_map_rviz.cpp drawing rules), i.e. the
obstacle set is a union of axis-aligned slabs one pixel (0.1 m) thick on a
0.8 m lattice.  A ray of length <= max_range crosses at most
ceil(max_range / 0.8) + 1 vertical and horizontal slabs, so the first hit
has a CLOSED FORM: per candidate slab, the entry/exit times and the range
of pixel rows (columns) touched inside the slab; a hit exists iff the
slab's packed bit-column has any bit in that range, and the hit time is
max(slab entry, first-set-row entry).  No marching, no gathers — ~40 VPU
ops per candidate, all fusible.

Exactness: identical to the DDA traversal (raycast_dda) up to float
rounding at pixel-boundary ties; verified against DDA on random rays in
tests/test_analytic.py.  Requires a gridline-structured raster; callers
fall back to DDA otherwise (ragged maps).

Bit tricks used (TPU has no ctz/clz): lowest set bit position of a uint32
via the float32 exponent of (x & -x); highest set bit via the exponent of
the value itself.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bitlookup import _is_gridline_structured, _pack_rows, _select_words

_F32_BIAS = 127


def _first_bit_pos(words, forward):
    """Directional first-set-bit of a multi-word value (word j = bits
    32j..32j+31): lowest where `forward` (elementwise bool), highest
    otherwise.  UNDEFINED (finite garbage, no NaN/inf) when the value is
    zero — callers gate on any-bit-set.

    One fused scan per word instead of computing lowest AND highest then
    selecting: the isolated-bit / raw-value choice moves to the INPUT of
    a single exponent extraction (the hot path of the analytic caster
    runs this twice per slab candidate).
    """
    def scan32(x):
        iso = x & (~x + jnp.uint32(1))
        z = jnp.where(forward, iso, x)
        zi = jax.lax.bitcast_convert_type(z, jnp.int32)
        top = zi < 0
        f = jnp.abs(zi.astype(jnp.float32))
        e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - _F32_BIAS
        # Backward mode only: int->float rounding can overshoot the
        # exponent by one (e.g. 0x7fffffff -> 2^31); clamp, then test.
        # Forward mode is exact (power of two) and x >> e always keeps
        # the isolated bit, so the correction is a no-op there.
        e = jnp.minimum(e, 31)
        e = jnp.where((x >> jnp.clip(e, 0, 31).astype(jnp.uint32))
                      == jnp.uint32(0), e - 1, e)
        # top & backward: the raw value is INT_MIN-side; answer is 31
        # outright (the float path saw |zi|, not the unsigned value).
        # top & forward: iso == 0x80000000 -> the float path is exact.
        return jnp.where(top & ~forward, 31, e)

    pos = [scan32(w) + 32 * j for j, w in enumerate(words)]
    nz = [w != jnp.uint32(0) for w in words]
    # Priority-select the first nonzero word along the scan direction.
    # Boolean ops only, no where-on-i1 (Mosaic cannot lower i1 selects:
    # "Unsupported target bitwidth for truncation").
    fsel = pos[-1]
    for j in range(len(words) - 2, -1, -1):   # ascending priority
        fsel = jnp.where(nz[j], pos[j], fsel)
    bsel = pos[0]
    for j in range(1, len(words)):            # descending priority
        bsel = jnp.where(nz[j], pos[j], bsel)
    return jnp.where(forward, fsel, bsel)


def _range_mask(lo_bit, hi_bit, n_words):
    """n_words uint32 words with bits [lo_bit, hi_bit] set (inclusive);
    empty if lo_bit > hi_bit.  Bits clamped into [0, 32*n_words - 1]."""
    lo_bit = jnp.clip(lo_bit, 0, 32 * n_words)
    hi_bit = jnp.clip(hi_bit, -1, 32 * n_words - 1)

    def word(base):
        # bits [max(lo-base,0), min(hi-base,31)] of one 32-bit word
        a = jnp.clip(lo_bit - base, 0, 32)
        b = jnp.clip(hi_bit - base, -1, 31)
        n = b - a + 1
        full = jnp.uint32(0xFFFFFFFF)
        m = jnp.where(
            n <= 0, jnp.uint32(0),
            jnp.where(n >= 32, full,
                      ((jnp.uint32(1) << n.astype(jnp.uint32))
                       - jnp.uint32(1))
                      << a.astype(jnp.uint32)))
        return m

    return [word(32 * j) for j in range(n_words)]


def _make_pixel_scan(line_pixels: np.ndarray):
    """Band-scan strategy over raw pixel columns: [n_lines, L] bools ->
    (band_scan, origin_bit) closures.  Cost scales with ceil(L/32) words.

    band_scan(kk, lo_r, hi_r, fwd) -> (any_hit, rr): whether line kk has a
    set pixel in rows [lo_r, hi_r], and the first such row along the scan
    direction (garbage when none — callers gate on any_hit).
    origin_bit(kk, r0) -> bool: pixel r0 of line kk (False out of range).
    kk == n_lines selects all-zero words (the invalid-line sentinel).
    """
    rows = _pack_rows(line_pixels)
    n_words = len(rows[0])

    def band_scan(kk, lo_r, hi_r, fwd):
        ws = _select_words(kk, rows)
        ms = _range_mask(lo_r, hi_r, n_words)
        bs = [wj & mj for wj, mj in zip(ws, ms)]
        acc = bs[0]
        for bj in bs[1:]:
            acc = acc | bj
        any_hit = acc != 0
        rr = _first_bit_pos(bs, fwd).astype(jnp.int32)
        return any_hit, rr

    def origin_bit(kk, r0):
        ws = _select_words(kk, rows)   # CSE'd with band_scan's selects
        m0 = _range_mask(r0, r0, n_words)
        ob = ws[0] & m0[0]
        for wj, mj in zip(ws[1:], m0[1:]):
            ob = ob | (wj & mj)
        return ob != 0

    return band_scan, origin_bit


def _make_cell_scan(line_pixels: np.ndarray, cell_px: int):
    """Cell-level band-scan strategy: two SINGLE uint32 words per line
    instead of ceil(L/32) pixel words — map-size-independent cost (maps up
    to 31x32 cells).

    A gridline's pixel column decomposes exactly into cell INTERIORS (the
    cell_px-1 pixels strictly between consecutive corners — uniform,
    because the raster rules draw whole wall segments; word A, bit c) plus
    the shared CORNER pixels at multiples of cell_px (taken straight from
    the raster, which already unions adjacent walls and crossing
    perpendicular segments; word B, bit m).  Returns None when the
    interiors are not uniform (verified, not assumed) or they don't fit
    one word.

    The returned `rr` is the first set row along the direction EXCEPT that
    an interior segment reports its first interior row (cell_px*c + 1
    forward, cell_px*c + cell_px - 1 backward) even when the queried band
    starts mid-segment; that row is then on or before the band start, so
    the caller's s_hit = max(t_in, t_row) clamps it to the slab entry —
    exactly what the true first row would give.
    """
    n_lines, length = line_pixels.shape
    n_cells = (length - 1) // cell_px
    n_corners = n_cells + 1
    if cell_px != 8 or n_cells > 32 or n_corners > 32:
        return None
    a_tab, b_tab = [], []
    for px in line_pixels:
        a = 0
        for c in range(n_cells):
            seg = px[c * cell_px + 1: (c + 1) * cell_px]
            if seg.any() != seg.all():
                return None
            if seg[0]:
                a |= 1 << c
        b = 0
        for mc in range(n_corners):
            if px[mc * cell_px]:
                b |= 1 << mc
        a_tab.append((a,))
        b_tab.append((b,))

    # np (not jnp): a jnp scalar here would be captured as a device
    # constant, which pallas_call rejects in-kernel.
    big = np.int32(1 << 24)

    def band_scan(kk, lo_r, hi_r, fwd):
        a = _select_words(kk, a_tab)[0]
        b = _select_words(kk, b_tab)[0]
        # Interior of cell c ([8c+1, 8c+7]) intersects [lo, hi] iff
        # floor(lo/8) <= c <= floor((hi-1)/8); corner m (row 8m) iff
        # ceil(lo/8) <= m <= floor(hi/8).  (Arithmetic >> = floor div.)
        (mask_a,) = _range_mask(lo_r >> 3, (hi_r - 1) >> 3, 1)
        (mask_b,) = _range_mask((lo_r + 7) >> 3, hi_r >> 3, 1)
        am = a & mask_a
        bm = b & mask_b
        any_a = am != jnp.uint32(0)
        any_b = bm != jnp.uint32(0)
        pa = _first_bit_pos([am], fwd).astype(jnp.int32)
        pb = _first_bit_pos([bm], fwd).astype(jnp.int32)
        ra = (pa << 3) + jnp.where(fwd, 1, cell_px - 1)
        rb = pb << 3
        # Directional merge of the two candidates, empty words pushed to
        # the losing side (gated by any_hit when both are empty).
        rr = jnp.where(
            fwd,
            jnp.minimum(jnp.where(any_a, ra, big), jnp.where(any_b, rb, big)),
            jnp.maximum(jnp.where(any_a, ra, -big), jnp.where(any_b, rb, -big)))
        return any_a | any_b, rr

    def origin_bit(kk, r0):
        a = _select_words(kk, a_tab)[0]
        b = _select_words(kk, b_tab)[0]
        in_len = (r0 >= 0) & (r0 < length)
        r0c = jnp.clip(r0, 0, length - 1)
        idx = (r0c >> 3).astype(jnp.uint32)
        on_corner = (r0c & 7) == 0
        bit_a = ((a >> idx) & jnp.uint32(1)) == 1
        bit_b = ((b >> idx) & jnp.uint32(1)) == 1
        # No where() between i1 vectors (Mosaic cannot lower i1 selects).
        return in_len & ((on_corner & bit_b) | (~on_corner & bit_a))

    return band_scan, origin_bit


def make_analytic_caster(
    occ: np.ndarray, resolution: float, origin_x: float, origin_y: float,
    cell_px: int = 8,
) -> Optional[Callable]:
    """Build `cast(ox, oy, angle, max_range) -> dist` or None if the raster
    is not gridline-structured."""
    occ = np.asarray(occ).astype(bool)
    if not _is_gridline_structured(occ, cell_px):
        return None
    h, w = occ.shape
    # Vertical gridline columns (pixel col = 8k): bits over rows.
    n_v = (w - 1) // cell_px + 1
    v_px = occ[:, ::cell_px].T                 # [n_v, h]
    # Horizontal gridline rows (pixel row = 8r): bits over cols.
    n_h = (h - 1) // cell_px + 1
    h_px = occ[::cell_px]                      # [n_h, w]

    def _axis_scan(line_pixels):
        # Cell tables beat pixel words once the pixel column needs > 2
        # words (at exactly 2 the op count ties and the pixel path measured
        # ~3% faster on-chip at 1M x 34, so small maps keep it; the cell
        # path's cost is map-size-independent from here up to 31x32 cells).
        if (line_pixels.shape[1] + 31) // 32 > 2:
            cs = _make_cell_scan(line_pixels, cell_px)
            if cs is not None:
                return cs
        return _make_pixel_scan(line_pixels)

    v_scan = _axis_scan(v_px)
    h_scan = _axis_scan(h_px)

    # np (not jnp) scalar: a jnp scalar built at caster-construction time
    # would be captured as a device constant, which pallas_call rejects
    # when the cast runs inside the beam-weight kernel.
    inf = np.float32(3e38)
    eps = 1e-9

    def axis_hits(gu, gv, du, dv, n_lines, scans, smax, n_cand):
        """First-hit s (pixel units) against slabs perpendicular to u.

        gu/gv: origin coords (u = axis normal to the lines, v = along).
        Returns s_hit (inf when none) over n_cand candidate lines (the
        origin's slab plus every line reachable within smax).  `scans` is
        the axis's (band_scan, origin_bit) strategy pair.
        """
        band_scan, origin_bit = scans
        small = jnp.abs(du) < eps
        inv_du = 1.0 / jnp.where(small, eps, du)
        sgn = jnp.where(du >= 0, 1, -1).astype(jnp.int32)
        k0 = jnp.floor(gu / cell_px).astype(jnp.int32)
        # Loop invariants hoisted out of the candidate loop: the row-scan
        # direction and reciprocal, and the origin pixel row (the origin
        # can sit inside the c == 0 slab only).
        fwd = dv >= 0
        small_v = jnp.abs(dv) < eps
        inv_dv = 1.0 / jnp.where(small_v, eps, dv)
        r0 = jnp.floor(gv).astype(jnp.int32)
        best = jnp.full(gu.shape, inf, jnp.float32)
        for c in range(n_cand):
            k = k0 + sgn * c
            line_u = (k * cell_px).astype(jnp.float32)   # slab [u, u+1)
            inside = (gu >= line_u) & (gu < line_u + 1.0)
            # Entry/exit times in pixel units.
            t_near = (line_u - gu) * inv_du
            t_far = (line_u + 1.0 - gu) * inv_du
            t_in = jnp.minimum(t_near, t_far)
            t_out = jnp.maximum(t_near, t_far)
            # du ~ 0: never crosses; inside slab -> [0, smax].
            t_in = jnp.where(small, jnp.where(inside, 0.0, inf), t_in)
            t_out = jnp.where(small, jnp.where(inside, smax, -inf), t_out)
            t_in = jnp.maximum(t_in, 0.0)
            t_out_c = jnp.minimum(t_out, smax)
            # Strict: a zero-measure touch (origin exactly on the slab's
            # half-open exit face, gu == line_u + 1) is not a crossing.
            window = t_in < t_out_c
            valid_k = (k >= 0) & (k < n_lines)
            # Rows (v-pixels) touched inside the slab.
            v_in = gv + t_in * dv
            v_out = gv + t_out_c * dv
            r_in = jnp.floor(v_in).astype(jnp.int32)
            r_out = jnp.floor(v_out).astype(jnp.int32)
            lo_r = jnp.minimum(r_in, r_out)
            hi_r = jnp.maximum(r_in, r_out)
            kk = jnp.where(valid_k, k, n_lines)
            # Any set pixel in rows [lo_r, hi_r] of line kk, and the first
            # touched row along the ray direction (garbage when no bit is
            # set — `any_hit` gates it out of `ok`).
            any_hit, rr = band_scan(kk, lo_r, hi_r, fwd)
            # Entry time into that row band.
            row_edge = jnp.where(fwd, rr, rr + 1).astype(jnp.float32)
            t_row = (row_edge - gv) * inv_dv
            t_row = jnp.where(small_v, 0.0, t_row)
            s_hit = jnp.maximum(t_in, t_row)
            ok = window & valid_k & any_hit & (s_hit < smax)
            best = jnp.minimum(best, jnp.where(ok, s_hit, inf))
            if c == 0:
                # Origin inside this slab's occupied pixel -> hit at 0 even
                # when the forward window is empty (e.g. moving out across
                # the entry face; DDA/fixed return 0 for an occupied origin
                # cell).  Only the c == 0 slab can contain the origin:
                # c >= 1 lines sit strictly ahead (k0 + sgn*c with
                # |direction| <= 1 and slab spacing cell_px > 1).
                best = jnp.minimum(
                    best,
                    jnp.where(inside & valid_k & origin_bit(kk, r0),
                              0.0, inf))
        return best

    def cast_dir(ox, oy, dx, dy, max_range):
        """First-hit distance along a UNIT direction (dx, dy).

        Split out from `cast` so the beam-weight kernel can hoist the
        per-particle trig out of its beam loop (angle-addition identity).
        """
        # max_range must be a static Python float (it is cfg.max_range):
        # the candidate-slab count derives from it.
        max_range = float(max_range)
        gx = (ox - origin_x) / resolution
        gy = (oy - origin_y) / resolution
        smax_f = max_range / resolution
        smax = jnp.float32(smax_f)
        # Origin slab + every gridline reachable within smax (spacing =
        # cell_px pixel units along the axis; |direction| <= 1).
        n_cand = int(np.ceil(smax_f / cell_px)) + 1
        sv = axis_hits(gx, gy, dx, dy, n_v, v_scan, smax, n_cand)
        sh = axis_hits(gy, gx, dy, dx, n_h, h_scan, smax, n_cand)
        s = jnp.minimum(jnp.minimum(sv, sh), smax)
        # Reference semantics: the march breaks on the first out-of-map
        # sample, so out-of-map origins return max_range
        # (monte_carlo.cpp:374 via worldToMap failure; DDA matches).
        inb = ((gx >= 0.0) & (gy >= 0.0)
               & (gx < float(w)) & (gy < float(h)))
        s = jnp.where(inb, s, smax)
        return (s * resolution).astype(jnp.float32)

    def cast(ox, oy, angle, max_range):
        return cast_dir(ox, oy, jnp.cos(angle), jnp.sin(angle), max_range)

    cast.cast_dir = cast_dir
    return cast


class AnalyticCasterCache:
    _cache: dict = {}

    @classmethod
    def get(cls, m) -> Optional[Callable]:
        occ = np.asarray(m.occ)
        key = occ.tobytes()
        if key not in cls._cache:
            cls._cache[key] = make_analytic_caster(
                occ, float(m.resolution), float(m.origin_x),
                float(m.origin_y))
        return cls._cache[key]
