"""C++-faithful NumPy oracle of the reference MCL math (SURVEY.md §4).

Sequential, loop-by-loop transcription of the reference SEMANTICS (not
code): Gaussian LUT with linear interpolation (monte_carlo.cpp:139-177),
worldToMap truncation, 9-point validity stencil, 0.1 m fixed ray march,
beam-angle negation, likelihood mixture, and the rot1-trans-rot2 odometry
decomposition.  Used by test_parity to verify the vectorized JAX filter
reproduces the reference numerics on identical inputs.
"""
from __future__ import annotations

import math

import numpy as np


class GaussianLUT:
    """monte_carlo.cpp:139-177: N(0, sigma) pdf table, 1e-4 resolution,
    support [0, 1.1], linear interpolation, 0 outside."""

    def __init__(self, sigma=0.1, resolution=1e-4, max_diff=1.1):
        self.resolution = resolution
        self.max_diff = max_diff
        n = int(max_diff / resolution) + 1
        diffs = np.arange(n) * resolution
        denom = sigma * math.sqrt(2.0 * math.pi)
        self.table = np.exp(-(diffs**2) / (2 * sigma * sigma)) / denom

    def get(self, diff):
        if diff < 0.0 or diff > self.max_diff:
            return 0.0
        f = diff / self.resolution
        i = int(f)
        if i + 1 < len(self.table):
            w = f - i
            return (1.0 - w) * self.table[i] + w * self.table[i + 1]
        return self.table[i]


class Oracle:
    def __init__(self, occ: np.ndarray, resolution=0.1, origin=(0.0, 0.0),
                 sigma=0.1, w_hit=0.8, w_rand=0.2, max_range=1.0,
                 laser_offset=0.1):
        self.occ = np.asarray(occ, dtype=bool)
        self.res = resolution
        self.ox, self.oy = origin
        self.lut = GaussianLUT(sigma)
        self.w_hit, self.w_rand = w_hit, w_rand
        self.max_range = max_range
        self.laser_offset = laser_offset
        self.h, self.w = occ.shape

    # -- map access (monte_carlo.cpp:298-349) --
    def world_to_map(self, wx, wy):
        mx = int((wx - self.ox) / self.res)   # static_cast<int> truncation
        my = int((wy - self.oy) / self.res)
        ok = 0 <= mx < self.w and 0 <= my < self.h
        return mx, my, ok

    def is_occupied(self, wx, wy):
        mx, my, ok = self.world_to_map(wx, wy)
        return ok and bool(self.occ[my, mx])

    def is_inside(self, wx, wy):
        return (self.ox <= wx < self.ox + self.w * self.res
                and self.oy <= wy < self.oy + self.h * self.res)

    def is_valid_pos(self, wx, wy, off=0.1):
        if not self.is_inside(wx, wy):
            return False
        for dx, dy in ((0, 0), (off, 0), (0, off), (-off, 0), (0, -off),
                       (off, off), (off, -off), (-off, off), (-off, -off)):
            if self.is_occupied(wx + dx, wy + dy):
                return False
        return True

    # -- ray march (monte_carlo.cpp:350-390) --
    def raycast(self, x, y, angle_rad, max_range=None):
        max_range = self.max_range if max_range is None else max_range
        dx, dy = math.cos(angle_rad), math.sin(angle_rad)
        r = 0.0
        while r < max_range:
            mx, my, ok = self.world_to_map(x + r * dx, y + r * dy)
            if not ok:
                break
            if self.occ[my, mx]:
                return r
            r += 0.1
        return max_range

    # -- computeWeight (monte_carlo.cpp:623-682) --
    def compute_weight(self, particle, beam_angles, beam_ranges):
        x, y, th = particle
        if not self.is_valid_pos(x, y):
            return 0.0
        ox = x + self.laser_offset * math.cos(th)
        oy = y + self.laser_offset * math.sin(th)
        prob = 0.0
        for a, obs in zip(beam_angles, beam_ranges):
            # angle = -(beam angle in deg); absolute = yaw + offset (:653).
            ray = th - a
            expected = self.raycast(ox, oy, ray)
            diff = abs(obs - expected)
            prob += self.w_hit * self.lut.get(diff)
            prob += self.w_rand * (1.0 if abs(obs - self.max_range) < 0.01
                                   else 0.0)
        return prob

    def compute_weights(self, particles, beam_angles, beam_ranges):
        return np.array([
            self.compute_weight(p, beam_angles, beam_ranges)
            for p in particles])


def diff_drive_decompose(prev, enc_prev, enc_cur, wheel_size=0.062,
                         wheel_space=0.265):
    """diffDriveModel + decomposition (monte_carlo.cpp:695-739), noise-free.

    prev: (x, y, theta); enc_*: (left, right) radians.
    Returns (new_pose, rot1, trans, rot2).
    """
    x, y, th = prev
    d_left = (enc_cur[0] - enc_prev[0]) * wheel_size * 0.5
    d_right = (enc_cur[1] - enc_prev[1]) * wheel_size * 0.5
    d_center = 0.5 * (d_left + d_right)
    dth = (d_left - d_right) / wheel_space
    nth = th + dth
    nx = x + d_center * math.cos(th + 0.5 * dth)
    ny = y + d_center * math.sin(th + 0.5 * dth)
    nth = math.atan2(math.sin(nth), math.cos(nth))
    rot1 = math.atan2(ny - y, nx - x) - th
    trans = math.hypot(nx - x, ny - y)
    rot2 = nth - th - rot1
    return (nx, ny, nth), rot1, trans, rot2
