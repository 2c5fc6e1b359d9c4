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
import dataclasses
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


def _knockout_step(m, cfg, scan, st, enc, skip):
    """One mcl_step with the `skip` stages replaced by trivial dependent
    stand-ins.  With skip=() this MUST reproduce models.filter.mcl_step
    bit-exactly (same key splits, stage order, state wiring) — pinned by
    tests/test_ops.py::test_stage_knockout_full_matches_mcl_step so a
    future mcl_step refactor cannot silently desynchronize the profiler.
    """
    import jax.numpy as jnp

    from ..models import cluster, filter as mcl, motion, resample, sensor

    n = st.particles.shape[0]
    key, k_m, k_r, k_c = jax.random.split(st.key, 4)
    was_lost, cluster_thr, conf_thr, _, _ = mcl._hysteresis(st, m, cfg)
    if "motion" in skip:
        odom, parts = st.odom, st.particles
    else:
        odom, parts = motion.motion_update(
            k_m, st.particles, st.odom, enc, enc, cfg.motion)
    if "weights" in skip:
        w = parts[:, 0] * 1e-6
    else:
        w = sensor.beam_weights(m, parts, scan, cfg.sensor,
                                cfg.valid_pos_offset)
    if "resample" in skip:
        parts2 = parts + w[:, None] * 0.0
        w2 = jnp.full((n,), 1.0 / n, jnp.float32)
        inj = st.inj
    else:
        parts2, w2, inj, _ = resample.resample(
            k_r, parts, w, st.inj, was_lost, m, cfg)
    if "cluster" in skip:
        conf, best = jnp.float32(0.5) + parts2[0, 0] * 0, st.best_pose
    else:
        conf, best = cluster.cluster_confidence(
            k_c, parts2, w2, conf_thr, cfg.cluster)
    return dataclasses.replace(
        st, particles=parts2, weights=w2, odom=odom, inj=inj,
        confidence=conf, was_lost=was_lost, cluster_threshold=cluster_thr,
        confident_threshold=conf_thr, best_pose=best, key=key)


def stage_knockout_times(m, cfg, scan, state,
                         iters: int = 20) -> Dict[str, float]:
    """Stage MARGINALS by composed-step knockout (the reliable breakdown).

    Times the FULL jitted step, then re-times it with each stage replaced
    by a trivial dependent stand-in; `marginal_<stage> = full - without`.
    Unlike `stage_times`' subtractive method, this keeps every measurement
    inside one composed program, so per-dispatch overhead (~0.8 ms through
    the axon tunnel) and cross-stage fusion don't distort attribution —
    measured distortion at 1M x 34 on v5e: subtractive said motion 4.1 ms,
    knockout says 0.13 ms.
    """
    import jax.numpy as jnp

    enc = jnp.float32(0.1)

    def run(skip):
        f = jax.jit(lambda st: _knockout_step(m, cfg, scan, st, enc, skip))
        st = f(state)
        jax.block_until_ready(st.particles)
        t0 = time.perf_counter()
        for _ in range(iters):
            st = f(st)
        jax.block_until_ready(st.particles)
        return (time.perf_counter() - t0) / iters

    full = run(())
    out = dict(full=full)
    for stage in ("motion", "weights", "resample", "cluster"):
        out[f"marginal_{stage}"] = full - run((stage,))
    return out


def stage_times(m, cfg, scan, state, iters: int = 10) -> Dict[str, float]:
    """Per-stage breakdown of one MCL tick (seconds): motion, weights,
    resample, cluster, full.

    CAVEAT: subtractive timing of separately-jitted prefixes — each jit
    dispatch through the axon tunnel costs ~0.8 ms and stages lose their
    fusion context, so small stages are OVERSTATED.  Prefer
    `stage_knockout_times` for attribution; this remains for quick
    cumulative-prefix views.
    """
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
