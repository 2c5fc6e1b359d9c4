"""Fleet serving: MANY live filters in one batched device step.

The reference deploys one filter per robot process (monte_carlo.cpp:1153,
one ROS node per Create).  A TPU chip is ~4 orders of magnitude faster than
one robot needs, so the TPU-native deployment unit is a FLEET: R robots'
filter states live on the device as one batched pytree ([R, N, 3]
particles, [R] scalars) and every tick is ONE vmapped `mcl_step` dispatch —
the same batching that makes the episode sweeps fast (the episode-batched
weight kernel and MXU resample expansion dispatch automatically under
vmap).  At the reference's own 1500x34 config, one v5e chip serves
hundreds of robots at their native 10 Hz inside one dispatch.

Protocol (JSONL; one fleet frame per line, arrays indexed by robot):

  {"encoder_left": [R], "encoder_right": [R], "ranges": [R][B],
   "mask": [R][B]?}
  -> {"tick": t, "exact_pose": [R][3], "cell_pose": [R][3],
      "confidence": [R], "song": [R], "wanderer_cmd": [R],
      "n_injected": [R]}

  Raw LaserScan frames (per-robot filterLaserReadings host-side):
  {"encoder_left": [R], "encoder_right": [R], "raw_scans": [R scan dicts]}

  Commands:
    {"cmd": "reset", "seed": n?}                 whole fleet
    {"cmd": "reset", "robot": i, "seed": n?}     one robot (kidnap/redeploy
                                                 without disturbing the rest)
    {"cmd": "checkpoint"|"restore", "path": p}   fleet pytree (.npz)
    {"cmd": "stats"}                             per-robot confidence
    {"cmd": "shutdown"}

Scale-out: pass `mesh=` (e.g. parallel.distributed.make_mesh()) and the
robot axis is sharded over devices — frames are device_put with a
P('robot'-axis) NamedSharding and XLA runs each shard's robots locally
(pure data parallelism: no cross-robot collectives exist by construction).

Pipelined mode (`pipeline=True`): each tick DISPATCHES this frame's step
(JAX async dispatch — returns as soon as the work is enqueued) and
returns the PREVIOUS tick's output, so the fetch of tick t-1 overlaps the
device computing tick t.  Per-tick cost drops from (RTT + compute +
fetch) to ~max(RTT, compute) — on a remote-attached chip the ~33 ms
tunnel round-trip stops stacking on top of the step.  Outputs lag one
tick (standard serving double-buffer); `flush()` drains the in-flight
tick.  The JSONL protocol is unchanged — replies are simply offset — and
every reply carries its own "tick" index.
"""
from __future__ import annotations

import dataclasses
import json
import sys
from typing import IO, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FilterConfig
from ..maps.grid import MazeMap
from ..models import filter as mcl
from ..models import sensor
from . import logs


class MCLFleetServer:
    """R device-resident filters; one compiled vmapped step per tick."""

    def __init__(self, m: MazeMap, cfg: FilterConfig, angles,
                 n_robots: int, seed: int = 0, mesh=None,
                 robot_axis: str = "episode", pipeline: bool = False):
        if n_robots < 1:
            raise ValueError("n_robots must be >= 1")
        self.m = m
        self.cfg = cfg
        self.n_robots = n_robots
        self.angles = np.asarray(angles, np.float32)
        self._angles_dev = jnp.asarray(self.angles)
        self.tick_count = 0
        self.pipeline = pipeline
        self._pending = None  # (tick_index, device MCLOutput) in flight
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P(robot_axis))

        nb = len(self.angles)

        def one_step(state, frame):
            sc = sensor.Scan(angles=self._angles_dev,
                             ranges=frame[2:2 + nb],
                             mask=frame[2 + nb:] > 0.5)
            return mcl.mcl_step(state, frame[0], frame[1], sc, m, cfg)

        self._step = jax.jit(jax.vmap(one_step))
        self._init_one = jax.jit(
            lambda k: mcl.init_state(k, m, cfg))
        # [R, 2 + 2B] f32: ONE upload per fleet tick.
        self._frame = np.zeros((n_robots, 2 + 2 * nb), np.float32)
        self.reset(seed)

    # -- lifecycle -----------------------------------------------------------

    def _place(self, state):
        if self._sharding is None:
            return state
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._sharding), state)

    def reset(self, seed: int = 0) -> None:
        """Re-init the whole fleet (robot r gets fold_in(seed, r))."""
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(seed),
            jnp.arange(self.n_robots, dtype=jnp.uint32))
        self.state = self._place(jax.vmap(
            lambda k: mcl.init_state(k, self.m, self.cfg))(keys))
        self.tick_count = 0

    def reset_robot(self, robot: int, seed: int = 0) -> None:
        """Re-init ONE robot's filter in place (redeploy/kidnap handling);
        the other robots' states are untouched."""
        if not 0 <= robot < self.n_robots:
            raise ValueError(f"robot {robot} out of range "
                             f"[0, {self.n_robots})")
        fresh = self._init_one(jax.random.fold_in(
            jax.random.PRNGKey(seed), np.uint32(robot)))
        self.state = self._place(jax.tree_util.tree_map(
            lambda batch, one: batch.at[robot].set(one), self.state, fresh))

    def checkpoint(self, path: str) -> None:
        logs.save_pytree(path, self.state)

    def restore(self, path: str) -> None:
        self.state = self._place(logs.load_pytree(path, self.state))

    # -- ticks ---------------------------------------------------------------

    def tick(self, encoder_left, encoder_right, ranges, mask=None):
        """One fleet update: every robot advances one filter tick.

        Synchronous mode returns this tick's output dict.  Pipelined mode
        (``pipeline=True``) returns the PREVIOUS tick's output (``None``
        on the first tick) — the dispatch of this tick overlaps the fetch
        of the last one; drain the final in-flight tick with `flush()`.
        """
        r, nb = self.n_robots, len(self.angles)
        ranges = np.asarray(ranges, np.float32)
        if ranges.shape != (r, nb):
            raise ValueError(
                f"ranges has shape {ranges.shape}; fleet expects "
                f"({r}, {nb}) — one row per robot on the beam table")
        f = self._frame
        f[:, 0] = np.asarray(encoder_left, np.float32)
        f[:, 1] = np.asarray(encoder_right, np.float32)
        f[:, 2:2 + nb] = ranges
        f[:, 2 + nb:] = (1.0 if mask is None
                         else np.asarray(mask, np.float32))
        # jnp.asarray copies the packed buffer out of self._frame at
        # dispatch time, so the buffer is safe to refill next tick even
        # while this step is still in flight (async dispatch).
        frame = jnp.asarray(f)
        if self._sharding is not None:
            frame = jax.device_put(frame, self._sharding)
        self.state, out = self._step(self.state, frame)
        self.tick_count += 1
        if not self.pipeline:
            return self._out_dict(out, self.tick_count)
        prev = self.flush()
        self._pending = (self.tick_count, out)
        return prev

    def flush(self) -> Optional[dict]:
        """Fetch and return the in-flight tick's output (pipelined mode);
        None if nothing is pending."""
        if self._pending is None:
            return None
        t, out = self._pending
        self._pending = None
        return self._out_dict(out, t)

    def tick_raw(self, encoder_left, encoder_right, raws) -> dict:
        """Fleet update from R raw LaserScan dicts (filtered host-side)."""
        if len(raws) != self.n_robots:
            raise ValueError(f"got {len(raws)} raw scans for "
                             f"{self.n_robots} robots")
        nb = len(self.angles)
        radii = np.empty((self.n_robots, nb), np.float32)
        masks = np.empty((self.n_robots, nb), np.float32)
        for i, raw in enumerate(raws):
            _, rad, msk = sensor.filter_scan(
                np.asarray(raw["ranges"], np.float64),
                float(raw["angle_min"]), float(raw["angle_increment"]),
                float(raw.get("range_min", 0.0)),
                float(raw.get("range_max", self.cfg.sensor.max_range)),
                self.cfg.sensor, pad_to=nb)
            radii[i], masks[i] = rad, msk
        return self.tick(encoder_left, encoder_right, radii, masks)

    def _out_dict(self, out: mcl.MCLOutput, tick: int) -> dict:
        o = jax.device_get(out)  # ONE fetch for the whole fleet output
        return dict(
            tick=tick,
            exact_pose=np.round(o.exact_pose.astype(np.float64),
                                6).tolist(),
            # ExactPose.thetaQuaternion analog per robot (msg/ExactPose.msg;
            # the reference declares but never assigns it,
            # monte_carlo.cpp:995-1004).
            theta_quaternion=np.round(
                np.sin(0.5 * o.exact_pose.astype(np.float64)[..., 2]),
                6).tolist(),
            cell_pose=np.asarray(o.cell_pose).tolist(),
            confidence=np.round(o.confidence.astype(np.float64),
                                6).tolist(),
            song=np.asarray(o.song).tolist(),
            wanderer_cmd=np.asarray(o.wanderer_cmd).tolist(),
            n_injected=np.asarray(o.n_injected).tolist(),
        )

    # -- stream loop ---------------------------------------------------------

    def serve(self, lines: Iterable[str],
              out_stream: Optional[IO[str]] = None) -> int:
        """Drain a JSONL stream; returns the number of fleet ticks run."""
        out_stream = out_stream or sys.stdout

        def reply(obj):
            print(json.dumps(obj), file=out_stream, flush=True)

        def reply_tick(out):
            # Pipelined mode: the first tick has no completed predecessor.
            if out is not None:
                reply(out)

        for line in lines:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError as e:
                reply(dict(error=f"bad json: {e}"))
                continue
            try:
                if "cmd" in msg:
                    # Drain the in-flight tick first so replies stay in
                    # dispatch order across command boundaries.
                    reply_tick(self.flush())
                    if self._handle_cmd(msg, reply):
                        return self.tick_count
                elif "raw_scans" in msg:
                    reply_tick(self.tick_raw(msg["encoder_left"],
                                             msg["encoder_right"],
                                             msg["raw_scans"]))
                else:
                    reply_tick(self.tick(msg["encoder_left"],
                                         msg["encoder_right"],
                                         msg["ranges"], msg.get("mask")))
            except Exception as e:  # noqa: BLE001 — long-lived server:
                # survive any bad line, reply with the error instead.
                reply(dict(error=f"{type(e).__name__}: {e}"))
        reply_tick(self.flush())
        return self.tick_count

    def _handle_cmd(self, msg: dict, reply) -> bool:
        cmd = msg["cmd"]
        if cmd == "reset":
            if "robot" in msg:
                self.reset_robot(int(msg["robot"]),
                                 int(msg.get("seed", 0)))
            else:
                self.reset(int(msg.get("seed", 0)))
        elif cmd == "checkpoint":
            self.checkpoint(msg["path"])
        elif cmd == "restore":
            self.restore(msg["path"])
        elif cmd == "stats":
            reply(dict(
                tick=self.tick_count,
                n_robots=self.n_robots,
                confidence=np.round(np.asarray(
                    self.state.confidence, np.float64), 6).tolist()))
            return False
        elif cmd == "shutdown":
            reply(dict(ok=True))
            return True
        else:
            reply(dict(error=f"unknown cmd {cmd!r}"))
            return False
        reply(dict(ok=True))
        return False
