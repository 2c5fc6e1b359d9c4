"""Fused Pallas TPU kernel for the k-means clustering loop.

The confidence estimator (monte_carlo.cpp:802-949; models/cluster.kmeans)
runs <=20 Lloyd iterations over the particle xy cloud.  The dense XLA
formulation re-materializes distances/masks and launches several reduce
passes per iteration (~4.4 ms at 1M particles on a v5e).  This kernel fuses
the WHOLE loop: grid = (iterations, particle tiles) — the TPU grid is
sequential, so the running centers live in SMEM scratch across the whole
grid, per-cluster partial sums accumulate in VMEM lanes, and each iteration
costs exactly one streamed read of the xy tiles (the only HBM traffic).

Per grid step (i, j):
  * j == 0: finalize iteration i-1 — reduce the lane accumulators to
    scalar (sum_x, sum_y, count) per cluster, update the SMEM centers
    (empty clusters take the precomputed reseed candidate, matching the
    dense path's RNG), reset accumulators.
  * assign the tile's particles to the nearest center (K unrolled
    distance chains, first-index tie-break like the dense argmin) and
    accumulate masked partial sums.
  * last step: finalize the final iteration and emit centers.

Semantics vs models/cluster.kmeans (the parity-faithful dense path):
  * identical update rule, reseed candidates, and tie-breaking;
  * partial sums accumulate in a different (lane-parallel) order, so
    centers can differ by float ulps — boundary particles may flip;
  * NO early-exit `done` latch: the dense path freezes centers once
    assignments stop changing, this kernel keeps applying the (identical)
    fixed-point update.  The results only diverge when a cluster is EMPTY
    at the fixed point (dense freezes the empty center, the kernel keeps
    reseeding it) — statistically irrelevant for MCL particle clouds and
    covered by the tolerance parity test.

Returned assignments are the final iteration's (computed from the centers
BEFORE the last update), exactly like the dense scan carry.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_SUB = 256
TILE_LANE = 128
TILE = TILE_SUB * TILE_LANE  # 32768 particles per grid tile


def _kmeans_kernel(centers0_ref, reseed_ref, x_ref, y_ref,
                   assign_ref, centers_out_ref, cent, acc,
                   *, k: int, iters: int, t_tiles: int, n: int):
    i = pl.program_id(0)  # iteration
    j = pl.program_id(1)  # particle tile

    def finalize(t):
        # t = iteration index whose sums are in `acc`.
        for c in range(k):
            sx = jnp.sum(acc[3 * c])
            sy = jnp.sum(acc[3 * c + 1])
            cnt = jnp.sum(acc[3 * c + 2])
            mx = sx / jnp.maximum(cnt, 1.0)
            my = sy / jnp.maximum(cnt, 1.0)
            # Empty cluster -> reseed candidate (monte_carlo.cpp:861-864).
            rx = reseed_ref[t * 2 * k + 2 * c]
            ry = reseed_ref[t * 2 * k + 2 * c + 1]
            cent[2 * c] = jnp.where(cnt > 0.0, mx, rx)
            cent[2 * c + 1] = jnp.where(cnt > 0.0, my, ry)

    @pl.when((i == 0) & (j == 0))
    def _():
        for c in range(2 * k):
            cent[c] = centers0_ref[c]
        for c in range(3 * k):
            acc[c] = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)

    @pl.when((i > 0) & (j == 0))
    def _():
        finalize(i - 1)
        for c in range(3 * k):
            acc[c] = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)

    x = x_ref[0]  # [TILE_SUB, TILE_LANE]
    y = y_ref[0]
    # Global particle index -> padding mask (padded lanes join no cluster).
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    p_idx = (j * TILE_SUB + sub) * TILE_LANE + lane
    live = p_idx < n

    # Assignment: running argmin over K unrolled distance chains
    # (first index wins ties, like the dense path).
    assign = jnp.zeros(x.shape, jnp.int32)
    best = (x - cent[0]) ** 2 + (y - cent[1]) ** 2
    for c in range(1, k):
        d = (x - cent[2 * c]) ** 2 + (y - cent[2 * c + 1]) ** 2
        closer = d < best
        assign = jnp.where(closer, c, assign)
        best = jnp.where(closer, d, best)
    assign_ref[0] = jnp.where(live, assign, 0)

    for c in range(k):
        mc = live & (assign == c)
        acc[3 * c] = acc[3 * c] + jnp.where(mc, x, 0.0)
        acc[3 * c + 1] = acc[3 * c + 1] + jnp.where(mc, y, 0.0)
        acc[3 * c + 2] = acc[3 * c + 2] + mc.astype(jnp.float32)

    @pl.when((i == iters - 1) & (j == t_tiles - 1))
    def _():
        finalize(iters - 1)
        for c in range(2 * k):
            centers_out_ref[c] = cent[c]


def kmeans_pallas(xy, centers0, reseed, max_iters: int,
                  interpret: bool = False):
    """Fused k-means: xy [N, 2], centers0 [K, 2], reseed [I, K, 2]
    -> (centers [K, 2], assignments [N] int32)."""
    n = xy.shape[0]
    k = centers0.shape[0]
    assert reseed.shape == (max_iters, k, 2)
    pad = (-n) % TILE
    t_tiles = (n + pad) // TILE
    shp = (t_tiles, TILE_SUB, TILE_LANE)
    x = jnp.pad(xy[:, 0], (0, pad)).reshape(shp)
    y = jnp.pad(xy[:, 1], (0, pad)).reshape(shp)

    kernel = functools.partial(_kmeans_kernel, k=k, iters=max_iters,
                               t_tiles=t_tiles, n=n)
    tile_spec = pl.BlockSpec((1, TILE_SUB, TILE_LANE),
                             lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    assign, centers = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(shp, jnp.int32),
            jax.ShapeDtypeStruct((2 * k,), jnp.float32),
        ),
        grid=(max_iters, t_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # centers0 [2K]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # reseed [I*2K]
            tile_spec, tile_spec,
        ],
        out_specs=(
            tile_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((2 * k,), jnp.float32),                     # centers
            pltpu.VMEM((3 * k, TILE_SUB, TILE_LANE), jnp.float32),  # sums
        ],
        interpret=interpret,
    )(centers0.reshape(-1), reseed.reshape(-1), x, y)
    return centers.reshape(k, 2), assign.reshape(-1)[:n]
