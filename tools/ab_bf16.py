"""Same-session A/B of the bf16 likelihood tail in the weight kernel
(VERDICT r4 #4a: the "bf16 opt-in march" candidate).

The ray cast's hot ops are INTEGER select chains / exponent tricks with
no low-precision form; MCL_KERNEL_BF16=1 converts the float tail after
the cast (diff, Gaussian, mixture accumulate) to bfloat16 — this bounds
what a bf16 march could buy.  One process, env toggled between traces,
so both variants share the session (tunnel variance cancels).

    python tools/ab_bf16.py --particles 1000000 --beams 34
"""
import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1_000_000)
    ap.add_argument("--beams", type=int, default=34)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from montecarlolocalisation_tpu import presets
    from montecarlolocalisation_tpu.models import sensor
    from montecarlolocalisation_tpu.ops import weights_pallas as wp

    world = presets.make_world(num_beams=args.beams, ray_mode="analytic")
    m, cfg = world.maze, world.cfg.sensor
    angles = jnp.asarray(world.angles, jnp.float32)
    n = args.particles
    rng = np.random.RandomState(0)
    parts = jnp.asarray(np.stack([
        rng.uniform(0.3, 4.5, n), rng.uniform(0.3, 4.5, n),
        rng.uniform(-np.pi, np.pi, n)], -1), jnp.float32)
    scan = sensor.Scan(
        angles=angles,
        ranges=jnp.asarray(rng.uniform(0.2, 1.0, args.beams), jnp.float32),
        mask=jnp.ones((args.beams,), jnp.float32))

    outs, times = {}, {}
    for flag in ("0", "1"):
        os.environ["MCL_KERNEL_BF16"] = flag
        fn = jax.jit(lambda p: wp.beam_weights_pallas(
            m, p, scan, cfg, interpret=args.interpret))
        w = jax.block_until_ready(fn(parts))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            w = fn(parts)
        jax.block_until_ready(w)
        times[flag] = (time.perf_counter() - t0) / args.iters * 1e3
        outs[flag] = np.asarray(w)
    denom = np.maximum(np.abs(outs["0"]), 1e-6)
    rel = np.abs(outs["0"] - outs["1"]) / denom
    print(f"N={n} B={args.beams} analytic: f32 {times['0']:.2f} ms | "
          f"bf16 tail {times['1']:.2f} ms | speedup "
          f"{times['0']/times['1']:.3f}x | parity: max rel "
          f"{rel.max():.2e}, mean rel {rel.mean():.2e}", flush=True)


if __name__ == "__main__":
    main()
