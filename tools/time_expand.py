"""Dependency-chain differential timing of the expand kernel on the chip.

`block_until_ready` through the axon tunnel does NOT synchronize small
executions (BENCH_DETAILS "Measurement note (axon)"), so standalone kernel
numbers come from a lax.scan dependency chain (each iteration's output
feeds the next input) ending in a scalar fetch, timed as
(chain(LONG) - chain(1)) / (LONG - 1).

Usage (on the chip):
    python tools/time_expand.py --n 1000000 --skew 8
    MCL_EXPAND_DEPTH=4 python tools/time_expand.py --n 4000000
"""
import argparse
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def chain_ms(fn, x0, long_iters=33, reps=3):
    """Per-iteration ms of fn via differential scan-chain timing."""

    def run(k):
        @jax.jit
        def chain(p):
            def body(p, _):
                return fn(p), None

            p, _ = jax.lax.scan(body, p, None, length=k)
            return jnp.sum(p)

        out = float(chain(x0))  # includes compile on first call
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = float(chain(x0))
            best = min(best, time.perf_counter() - t0)
        assert out == out, "NaN chain output"
        return best

    t1 = run(1)
    tl = run(long_iters)
    return (tl - t1) / (long_iters - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--skew", type=float, default=8.0,
                    help="weight skew exponent (converged-ish posterior)")
    ap.add_argument("--iters", type=int, default=33)
    args = ap.parse_args()

    from montecarlolocalisation_tpu.ops import expand_pallas as ep

    key = jax.random.PRNGKey(0)
    w = jax.random.uniform(key, (args.n,)) ** args.skew
    cdf = jnp.cumsum(w / jnp.sum(w))
    parts = jax.random.normal(jax.random.PRNGKey(1), (args.n, 3), jnp.float32)
    u0 = jnp.float32(0.37)

    ms = chain_ms(lambda p: ep.systematic_expand(p, cdf, u0), parts,
                  long_iters=args.iters)
    print(f"n={args.n} skew={args.skew} DEPTH={ep.DEPTH} OUT={ep.OUT} "
          f"CHUNK={ep.CHUNK}: {ms:.2f} ms ({ms / (args.n / 1e6):.2f} ms/1M)")


if __name__ == "__main__":
    main()
