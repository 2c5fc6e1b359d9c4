"""Pallas TPU kernel: systematic-resampling expansion without scatter/gather.

The resampling hot spot (monte_carlo.cpp:497-527's draw loop, vectorized) is
the monotone expansion  drawn[k] = particles[idx[k]]  where
idx = searchsorted(cdf, (k + u0)/N).  The XLA formulation (scatter-max +
cummax + gather, models/resample.systematic_indices) costs ~14 ms at 1M on
a v5e because TPU lowers scatter/gather to per-element loops.

This kernel never materializes idx.  Offspring counts
    c_i = clip(floor(N*cdf_i - u0) + 1, 0, N)
are elementwise; source particle i owns the contiguous output interval
[c_{i-1}, c_i).  The kernel walks output tiles (sequential TPU grid) with a
carried source-chunk cursor in SMEM; for each (output tile, source chunk)
pair it builds the 0/1 interval matrix
    M[k, p] = (c_prev[p] <= k) & (k < c[p])
(per output row exactly one hit) and accumulates
    out[:, k] += sum_p vals[:, p] * M[k, p]
on the MXU — a gather expressed as a one-hot matmul, the canonical TPU
idiom.  Total (chunk, tile) pairs <= N/CHUNK + N/OUT (every chunk fully
consumed once, plus one boundary-straddling re-visit per output tile), so
the M-build — the dominant VPU cost — totals ~N*(OUT + CHUNK) lane ops.

Layout trick: counts ride as two extra f32 ROWS (6: c_prev, 7: c) of the
[8, CHUNK] values chunk, so each chunk is one aligned DMA and the interval
compare is a natural [1, 1024] lane-broadcast (a [1024, 1] column layout is
not DMA-able on TPU: lane dims must align to 128).  f32 holds counts
exactly up to 2^24 (N <= 16.7M).

Exactness: each output row of M selects one particle value times 1.0 plus
zeros, so results are bit-identical to
particles[systematic_indices(cdf, u0)].
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = int(os.environ.get("MCL_EXPAND_OUT", "256"))
# Outputs per grid tile (one [8, OUT] accumulator + store).
CHUNK = int(os.environ.get("MCL_EXPAND_CHUNK", "256"))
# Sources per DMA chunk (OUT must stay a CHUNK multiple).  The
# interval-compare M-build totals ~N*(OUT + CHUNK) lane ops (every chunk
# consumed once + one boundary re-visit per tile), so smaller chunks cut
# compare work but add per-chunk DMA/loop overhead.  Measured on v5e at
# 1M (dependency-chain differential timing, 3-pass split matmul):
# 256 = 2.67 ms, 128 = 2.89 ms — the overhead wins; 256 stays default.
DEPTH = int(os.environ.get("MCL_EXPAND_DEPTH", "0"))  # 0 = auto by N
# DMA ring depth (in-flight source-chunk copies + the resident slot).
# The kernel is DMA-count/latency-bound at large N (BENCH_DETAILS
# "scaling cliff"): measured on v5e, depth 2 wins at 1M (2.04 vs
# 2.29 ms) but 4 wins at 4M (2.68 vs 2.84 ms/1M) — auto picks by N.
MAX_N = 1 << 24  # count rows ride as exact f32


def _ring_depth(n: int) -> int:
    return DEPTH if DEPTH else (2 if n <= 2_000_000 else 4)


def offspring_counts(cdf, u0):
    """Cumulative offspring counts c_i = #{k : (k+u0)/N <= cdf_i}.

    The cummax guards against XLA's parallel-scan cumsum producing a
    1-ulp NON-monotone cdf (observed ~1/1M on TPU): without it, inverted
    count pairs make two sources claim one output slot and this kernel
    would sum both particles into that output.
    """
    n = cdf.shape[0]
    c = jnp.clip(jnp.floor(n * cdf - u0).astype(jnp.int32) + 1, 0, n)
    return jax.lax.cummax(c)


def _expand_kernel(c_last_ref, v_ref, out_ref, cur_ref, vbuf, sem,
                   *, num_chunks: int, depth: int):
    j = pl.program_id(0)
    base = j * OUT
    limit = base + OUT

    @pl.when(j == 0)
    def _():
        cur_ref[0] = 0
        cur_ref[1] = -1

    t0 = cur_ref[0]
    # Ring-buffer reuse: scratch persists across (sequential) grid steps,
    # so when this tile revisits the previous tile's straddling chunk
    # (t0 == the last chunk that tile waited), its data is still in slot
    # t0 % DEPTH — skip the re-DMA.  Revisits are ~half of all chunk
    # fetches (one per output tile), and the kernel is DMA-count-bound
    # at >= 4M (BENCH_DETAILS "scaling cliff").
    resident = cur_ref[1]
    reuse0 = t0 == resident

    def chunk_start(t):
        # Outputs covered by chunk t begin at the cumulative count through
        # chunk t-1 (0 for the first chunk).
        return jnp.where(t > 0, c_last_ref[jnp.maximum(t - 1, 0)], 0)

    def needed(t):
        return (t < num_chunks) & (chunk_start(t) < limit)

    def start_dma(t):
        pltpu.make_async_copy(
            v_ref.at[t], vbuf.at[t % depth], sem.at[t % depth]).start()

    # Loop-invariant output-row index matrix [OUT, CHUNK].  (A bf16
    # variant with tile-relative clipped counts — all integers <= OUT,
    # bf16-exact — was tried for cheaper compares + native-bf16 MXU feeds:
    # v5e Mosaic rejects bf16 compares outright, "Target does not support
    # this comparison".  f32 compares it is.)
    kk = (jax.lax.broadcasted_iota(jnp.int32, (OUT, CHUNK), 0)
          + base).astype(jnp.float32)

    def cond(carry):
        t, _ = carry
        return needed(t)

    def body(carry):
        # Invariant: DMAs for chunks t .. t+depth-2 (where needed and not
        # resident) are in flight on entry.
        t, acc = carry

        @pl.when(~((t == t0) & reuse0))
        def _():
            pltpu.make_async_copy(
                v_ref.at[t], vbuf.at[t % depth], sem.at[t % depth]).wait()

        @pl.when(needed(t + depth - 1))
        def _():
            start_dma(t + depth - 1)

        vb = vbuf[t % depth]                           # [8, CHUNK]
        cprow = vb[6:7, :]                             # [1, CHUNK] c_prev
        crow = vb[7:8, :]                              # [1, CHUNK] c
        m = ((kk >= cprow) & (kk < crow)).astype(jnp.float32)
        # Bit-exact f32 select via a manual 3-term bf16 split: h/mid/lo
        # carry disjoint 8-bit mantissa slices (v - h is exact by Sterbenz:
        # h is v rounded to bf16, so v/2 <= h <= 2v; ditto r - mid), each
        # is bf16-exact, and single-pass dots against the 0/1 selection
        # matrix copy them exactly — 3 MXU passes where Precision.HIGHEST
        # spent 6 on the same exact result.
        h16 = vb.astype(jnp.bfloat16)
        h = h16.astype(jnp.float32)
        r = vb - h
        mid16 = r.astype(jnp.bfloat16)
        lo = r - mid16.astype(jnp.float32)
        dims = (((1,), (1,)), ((), ()))
        dot = lambda a: jax.lax.dot_general(
            a, m, dims, preferred_element_type=jnp.float32)
        acc = acc + ((dot(h) + dot(mid16.astype(jnp.float32))) + dot(lo))
        return t + 1, acc

    @pl.when(needed(t0) & ~reuse0)
    def _():
        start_dma(t0)

    for i in range(1, depth - 1):
        @pl.when(needed(t0 + i))
        def _(i=i):
            start_dma(t0 + i)

    t_end, acc = jax.lax.while_loop(
        cond, body, (t0, jnp.zeros((8, OUT), jnp.float32)))
    out_ref[:] = acc
    # Next tile resumes at the first chunk not fully consumed by this one.
    last = jnp.maximum(t_end - 1, 0)
    cur_ref[0] = jnp.where(c_last_ref[last] > limit, last, t_end)
    # `last` is the newest chunk whose data sits (un-overwritable until
    # chunk last+depth) in slot last % depth.
    cur_ref[1] = last


def systematic_expand(particles, cdf, u0, interpret: bool = False):
    """drawn[k] = particles[searchsorted(cdf, (k+u0)/N, 'left')], fused.

    particles [N, D] f32 (D <= 6), cdf [N] f32 monotone to 1, u0 scalar in
    [0, 1).  Bit-exact match of the scatter/cummax/gather path.
    """
    n, d = particles.shape
    assert d <= 6 and n <= MAX_N
    assert OUT % CHUNK == 0, "OUT must be a CHUNK multiple"
    c = offspring_counts(cdf, u0)
    pad = (-n) % OUT
    np_ = n + pad
    t_chunks = np_ // CHUNK
    # Padded sources get the empty interval [n, n).
    c_pad = jnp.pad(c, (0, pad), constant_values=n)
    cp_pad = jnp.concatenate([jnp.zeros((1,), jnp.int32), c_pad[:-1]])
    c_last = c_pad.reshape(t_chunks, CHUNK)[:, -1]
    # Chunk layout [T, 8, CHUNK]: rows 0..d-1 values, 6 c_prev, 7 c (f32).
    vals = jnp.concatenate(
        [
            jnp.pad(particles, ((0, pad), (0, 6 - d))),
            cp_pad[:, None].astype(jnp.float32),
            c_pad[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    v3 = vals.reshape(t_chunks, CHUNK, 8).transpose(0, 2, 1)

    depth = _ring_depth(n)
    kernel = functools.partial(_expand_kernel, num_chunks=t_chunks,
                               depth=depth)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_ // OUT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],   # v3 (manual DMA)
        out_specs=pl.BlockSpec((8, OUT), lambda j, *_: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),    # [cursor, resident chunk]
            pltpu.VMEM((depth, 8, CHUNK), jnp.float32),  # DMA ring buffer
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, np_), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(c_last, v3)
    return out[:d, :n].T
