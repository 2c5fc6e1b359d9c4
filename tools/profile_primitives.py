"""Measure TPU costs of resample-expansion candidate primitives at 1M.

Run on the chip: python tools/profile_primitives.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000


def timeit(fn, *args, iters=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.uniform(k1, (N,)) ** 8  # skewed weights
    cdf = jnp.cumsum(w / jnp.sum(w))
    parts = jax.random.normal(k2, (N, 3), jnp.float32)
    u0 = jnp.float32(0.37)

    def counts(cdf, u0):
        return jnp.clip(jnp.floor(N * cdf - u0).astype(jnp.int32) + 1, 0, N)

    def idx_scatter_cummax(cdf, u0):
        c = counts(cdf, u0)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), c[:-1]])
        has = c > starts
        ids = jnp.arange(N, dtype=jnp.int32)
        pos = jnp.where(has, starts, N)
        out = jnp.zeros((N,), jnp.int32).at[pos].max(ids, mode="drop")
        return jax.lax.cummax(out)

    idx = jax.jit(idx_scatter_cummax)(cdf, u0)
    idx = jax.block_until_ready(idx)
    sorted_idx = idx  # monotone by construction
    rand_idx = jax.random.randint(k3, (N,), 0, N)

    print("cumsum [1M]           %.2f ms" % timeit(jnp.cumsum, w))
    print("counts (elementwise)  %.2f ms" % timeit(counts, cdf, u0))
    print("idx scatter+cummax    %.2f ms" % timeit(idx_scatter_cummax, cdf, u0))
    print("cummax alone [1M]     %.2f ms" % timeit(jax.lax.cummax, idx))
    print("gather [1M,3] monot.  %.2f ms" % timeit(lambda p, i: p[i], parts, sorted_idx))
    print("gather [1M,3] random  %.2f ms" % timeit(lambda p, i: p[i], parts, rand_idx))
    print("gather [1M] 1ch monot %.2f ms" % timeit(lambda p, i: p[i], parts[:, 0], sorted_idx))
    print("take_along 3x1ch      %.2f ms" % timeit(
        lambda p, i: jnp.stack([p[:, 0][i], p[:, 1][i], p[:, 2][i]], -1),
        parts, sorted_idx))

    # associative_scan forward-fill of scattered (flag, x, y, th)
    def scan_fill(cdf, u0, parts):
        c = counts(cdf, u0)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), c[:-1]])
        has = c > starts
        pos = jnp.where(has, starts, N)
        z = jnp.zeros((N, 4), jnp.float32)
        vals = jnp.concatenate(
            [jnp.ones((N, 1), jnp.float32), parts], axis=-1)
        scat = z.at[pos].max(vals, mode="drop")  # flag as max is fine

        def comb(a, b):
            return jnp.where(b[..., :1] > 0, b, a)

        return jax.lax.associative_scan(comb, scat, axis=0)

    print("scatter4+scanfill     %.2f ms" % timeit(scan_fill, cdf, u0, parts))

    # donate_argnums retest
    try:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def donate_step(p):
            return p * 1.0001 + 0.1

        p = jnp.ones((N, 3), jnp.float32)
        for _ in range(3):
            p = donate_step(p)
        jax.block_until_ready(p)
        print("donate_argnums: OK")
    except Exception as e:  # noqa: BLE001
        print(f"donate_argnums: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
