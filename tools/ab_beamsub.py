"""A/B the episode-batched weight-kernel layouts on chip (VERDICT r4 #4b).

Row layout (beam_weights_pallas_batched: 1024 particles/tile, in-register
beam loop, episode packing for n <= 512) vs beam-per-sublane layout
(beam_weights_pallas_beamsub: 128 particles x 8 beams per tile, zero
sublane padding at any n, hoisted per-particle work duplicated 8x).

    python tools/ab_beamsub.py --episodes 64 --sizes 500 768 2000
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=64)
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[500, 768, 2000])
    ap.add_argument("--beams", type=int, default=24)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from montecarlolocalisation_tpu import presets
    from montecarlolocalisation_tpu.ops import weights_pallas as wp

    world = presets.make_world(num_beams=args.beams, ray_mode="analytic")
    m, cfg = world.maze, world.cfg.sensor
    angles = jnp.asarray(world.angles, jnp.float32)
    E = args.episodes
    rng = np.random.RandomState(0)

    for n in args.sizes:
        parts = jnp.asarray(np.stack([
            rng.uniform(0.3, 4.5, (E, n)), rng.uniform(0.3, 4.5, (E, n)),
            rng.uniform(-np.pi, np.pi, (E, n))], -1), jnp.float32)
        ranges = jnp.asarray(rng.uniform(0.2, 1.0, (E, args.beams)),
                             jnp.float32)
        mask = jnp.ones((E, args.beams), jnp.float32)
        impls = {
            "row": jax.jit(lambda p, r, mk: wp.beam_weights_pallas_batched(
                m, p, angles, r, mk, cfg, interpret=args.interpret)),
            "beamsub": jax.jit(
                lambda p, r, mk: wp.beam_weights_pallas_beamsub(
                    m, p, angles, r, mk, cfg, interpret=args.interpret)),
        }
        outs, times = {}, {}
        for name, fn in impls.items():
            w = jax.block_until_ready(fn(parts, ranges, mask))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                w = fn(parts, ranges, mask)
            jax.block_until_ready(w)
            times[name] = (time.perf_counter() - t0) / args.iters * 1e3
            outs[name] = np.asarray(w)
        rel = np.max(np.abs(outs["row"] - outs["beamsub"])
                     / np.maximum(np.abs(outs["row"]), 1e-6))
        rows = -(-n // 128)
        waste_row = (wp.pack_geometry(n)[2] if rows < 8
                     else (n + (-n) % 1024) / n)
        print(f"E={E} n={n:5d} B={args.beams}: row {times['row']:7.2f} ms"
              f" (pad waste {waste_row:.2f}x) | beamsub "
              f"{times['beamsub']:7.2f} ms | ratio "
              f"{times['beamsub']/times['row']:.2f} | max rel diff {rel:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
