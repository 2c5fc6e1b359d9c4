"""Pallas systematic-expansion kernel: exactness vs the XLA path.

Runs in interpret mode on the CPU test mesh; the same assertions were
verified compiled on the v5e chip (bit-exact at 1M across weight skews).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlolocalisation_tpu.models.resample import (
    offspring_counts, systematic_indices,
)
from montecarlolocalisation_tpu.ops.expand_pallas import systematic_expand


def _case(n, skew, seed, d=3):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.uniform(k1, (n,)) ** skew if skew else jnp.ones((n,))
    cdf = jnp.cumsum(w / jnp.sum(w))
    parts = jax.random.normal(k2, (n, d), jnp.float32)
    return parts, cdf


@pytest.mark.parametrize("n,skew,seed", [
    (2048, 0, 0),      # uniform weights: identity-ish mapping
    (4096, 1, 1),
    (4096, 12, 2),     # heavy skew: long repeats + long skips
    (1500, 4, 3),      # non-multiple of CHUNK (reference particle count)
    (257, 2, 4),       # barely above one chunk
])
def test_expand_matches_xla_path(n, skew, seed):
    parts, cdf = _case(n, skew, seed)
    u0 = jnp.float32(0.625)
    want = parts[systematic_indices(cdf, u0)]
    got = systematic_expand(parts, cdf, u0, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_expand_one_particle_takes_all():
    # Degenerate posterior: all weight on one particle -> every output is
    # that particle (the kidnapped-robot collapse case).
    n = 2048
    w = jnp.zeros((n,)).at[777].set(1.0)
    cdf = jnp.cumsum(w)
    parts = jnp.stack([jnp.arange(n, dtype=jnp.float32)] * 3, axis=-1)
    got = systematic_expand(parts, cdf, jnp.float32(0.5), interpret=True)
    assert bool(jnp.all(got == 777.0))


def test_offspring_counts_monotone_and_total():
    n = 4096
    _, cdf = _case(n, 6, 7)
    c = np.asarray(offspring_counts(cdf, jnp.float32(0.25)))
    assert (np.diff(c) >= 0).all()
    assert c[-1] == n


def test_resample_uses_kernel_result_semantics():
    # End-to-end: resample(systematic, expand='xla') must equal itself with
    # the expansion forced through the interpret-mode kernel semantics --
    # i.e. the kernel is a drop-in for the gather (checked via the public
    # systematic_indices contract above); here we just pin that the config
    # knob dispatches without changing shapes/rng.
    import os.path as osp

    from montecarlolocalisation_tpu.config import (
        FilterConfig, ResampleConfig, SensorModelConfig,
    )
    from montecarlolocalisation_tpu.maps import from_map_file
    from montecarlolocalisation_tpu.models import resample as R

    maze = from_map_file(osp.join(
        osp.dirname(__file__), "..", "montecarlolocalisation_tpu", "maps",
        "default_map.txt"))
    cfg = FilterConfig(num_particles=512,
                       sensor=SensorModelConfig(ray_mode="fixed"),
                       resample=ResampleConfig(method="systematic",
                                               expand="xla"))
    key = jax.random.PRNGKey(0)
    parts = R.sample_uniform_particles(key, maze, 512)
    w = jax.random.uniform(jax.random.PRNGKey(1), (512,))
    out = R.resample(jax.random.PRNGKey(2), parts, w, R.InjectionState.zero(),
                     jnp.bool_(True), maze, cfg)
    assert out[0].shape == (512, 3)
    assert bool(jnp.isfinite(out[0]).all())


def test_onehot_batched_expand_matches_indices():
    # The vmap-rule fast path for sweeps: dense one-hot matmul expansion
    # must be bit-identical to the per-episode index path.
    from montecarlolocalisation_tpu.models.resample import (
        _expand_onehot_batched,
    )

    n_ep, n = 5, 500
    keys = jax.random.split(jax.random.PRNGKey(11), n_ep)
    parts, cdfs = [], []
    for e, k in enumerate(keys):
        p, cdf = _case(n, skew=3 * e, seed=100 + e)
        parts.append(p)
        cdfs.append(cdf)
    parts = jnp.stack(parts)
    cdfs = jnp.stack(cdfs)
    u0 = jnp.linspace(0.05, 0.95, n_ep).astype(jnp.float32)
    got = _expand_onehot_batched(parts, cdfs, u0)
    for e in range(n_ep):
        want = parts[e][systematic_indices(cdfs[e], u0[e])]
        np.testing.assert_array_equal(np.asarray(got[e]), np.asarray(want))


def test_laxmap_batched_expand_matches_indices():
    # The big-N vmap-rule branch: lax.map launching the expansion kernel
    # per episode (sequential scan -- no vmap of pallas_call).
    n_ep, n = 3, 2048
    parts, cdfs, u0s = [], [], []
    for e in range(n_ep):
        p, cdf = _case(n, skew=2 + e, seed=40 + e)
        parts.append(p)
        cdfs.append(cdf)
    parts, cdfs = jnp.stack(parts), jnp.stack(cdfs)
    u0 = jnp.asarray([0.1, 0.5, 0.9], jnp.float32)
    got = jax.lax.map(
        lambda args: systematic_expand(*args, interpret=True),
        (parts, cdfs, u0))
    for e in range(n_ep):
        want = parts[e][systematic_indices(cdfs[e], u0[e])]
        np.testing.assert_array_equal(np.asarray(got[e]), np.asarray(want))
