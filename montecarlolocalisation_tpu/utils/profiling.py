"""Profiling & stage timing.

The reference instruments its hot loops with manual chrono spans logged to
ROS_INFO (computeWeight/resample/k-means/tick — monte_carlo.cpp:625,678,
556,943,1093; values never recorded).  Here timing is a first-class harness:

  * time_fn        — compile-once, block-until-ready wall timing
  * stage_times    — per-stage breakdown of the MCL tick
  * trace          — context manager around jax.profiler for TensorBoard
                     traces of the real device execution
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 1) -> float:
    """Mean wall seconds per call (fn jit-compiled by caller)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_times(m, cfg, scan, state, iters: int = 10) -> Dict[str, float]:
    """Per-stage breakdown of one MCL tick (seconds): motion, weights,
    resample, cluster, full."""
    import jax.numpy as jnp

    from ..models import cluster, filter as mcl, motion, resample, sensor

    enc = jnp.float32(0.1)

    def mw(st):
        _, k_m, k_r, k_c = jax.random.split(st.key, 4)
        odom, parts = motion.motion_update(
            k_m, st.particles, st.odom, enc, enc, cfg.motion)
        w = sensor.beam_weights(m, parts, scan, cfg.sensor,
                                cfg.valid_pos_offset)
        return parts, w, k_r, k_c

    motion_only = jax.jit(lambda st: motion.motion_update(
        jax.random.split(st.key, 4)[1], st.particles, st.odom, enc, enc,
        cfg.motion)[1])
    weights = jax.jit(lambda st: mw(st)[1])

    def res(st):
        parts, w, k_r, _ = mw(st)
        return resample.resample(k_r, parts, w, st.inj, st.was_lost, m,
                                 cfg)[0]

    def clus(st):
        parts, w, k_r, k_c = mw(st)
        p2, w2, inj, _ = resample.resample(k_r, parts, w, st.inj,
                                           st.was_lost, m, cfg)
        return cluster.cluster_confidence(k_c, p2, w2,
                                          st.confident_threshold,
                                          cfg.cluster)[0]

    full = jax.jit(
        lambda st: mcl.mcl_step(st, enc, enc, scan, m, cfg)[0].particles)

    t_motion = time_fn(motion_only, state, iters=iters)
    t_weights = time_fn(weights, state, iters=iters)
    t_resample = time_fn(jax.jit(res), state, iters=iters)
    t_cluster = time_fn(jax.jit(clus), state, iters=iters)
    t_full = time_fn(full, state, iters=iters)
    return dict(
        motion=t_motion,
        weights=t_weights - t_motion,
        resample=t_resample - t_weights,
        cluster=t_cluster - t_resample,
        full=t_full,
    )
