"""Parity tests for the fused k-means Pallas kernel (ops/kmeans_pallas).

Interpret mode on the CPU test mesh.  The kernel shares init centers and
reseed candidates with the dense scan; results agree except for float-ulp
reassociation in the partial sums (boundary particles may flip) and the
empty-cluster-at-fixed-point corner (documented in the kernel docstring),
so assertions are tolerance/fraction based.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlolocalisation_tpu.config import ClusterConfig
from montecarlolocalisation_tpu.models import cluster
from montecarlolocalisation_tpu.ops.kmeans_pallas import kmeans_pallas


def _shared_inputs(key, xy, cfg):
    n = xy.shape[0]
    k_init, k_iters = jax.random.split(key)
    centers0 = xy[jax.random.randint(k_init, (cfg.k,), 0, n)]
    iter_keys = jax.random.split(k_iters, cfg.max_iters)
    reseed = xy[jax.vmap(
        lambda kk: jax.random.randint(kk, (cfg.k,), 0, n))(iter_keys)]
    return centers0, reseed


def _mixture(key, n=6000):
    """Three well-separated blobs + uniform background."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    blobs = [
        jnp.array([1.0, 1.0]) + 0.15 * jax.random.normal(k1, (n // 3, 2)),
        jnp.array([4.0, 1.5]) + 0.15 * jax.random.normal(k2, (n // 3, 2)),
        jnp.array([2.5, 4.0]) + 0.15 * jax.random.normal(k3, (n // 3, 2)),
    ]
    bg = jax.random.uniform(k4, (n - 3 * (n // 3), 2)) * 5.0
    return jnp.concatenate(blobs + [bg]).astype(jnp.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_dense(seed):
    cfg = ClusterConfig()
    key = jax.random.PRNGKey(seed)
    xy = _mixture(jax.random.fold_in(key, 7))
    centers0, reseed = _shared_inputs(key, xy, cfg)
    c_dense, a_dense = cluster._kmeans_dense(xy, centers0, reseed, cfg)
    c_kern, a_kern = kmeans_pallas(xy, centers0, reseed, cfg.max_iters,
                                   interpret=True)
    # Centers match to accumulated reassociation error.
    np.testing.assert_allclose(np.asarray(c_kern), np.asarray(c_dense),
                               rtol=1e-4, atol=1e-4)
    # Assignments: only distance-boundary particles may flip.
    agree = (np.asarray(a_kern) == np.asarray(a_dense)).mean()
    assert agree > 0.999


def test_kernel_pads_and_masks():
    # N far from a tile multiple: padded lanes must join no cluster.
    cfg = ClusterConfig()
    key = jax.random.PRNGKey(3)
    xy = _mixture(jax.random.fold_in(key, 7), n=5001)
    centers0, reseed = _shared_inputs(key, xy, cfg)
    c_dense, _ = cluster._kmeans_dense(xy, centers0, reseed, cfg)
    c_kern, a_kern = kmeans_pallas(xy, centers0, reseed, cfg.max_iters,
                                   interpret=True)
    assert a_kern.shape == (5001,)
    np.testing.assert_allclose(np.asarray(c_kern), np.asarray(c_dense),
                               rtol=1e-4, atol=1e-4)


def test_empty_cluster_reseeds():
    # Init all three centers on top of each other far from the data: two
    # go empty immediately and must take reseed candidates, not NaN.
    cfg = ClusterConfig()
    xy = _mixture(jax.random.PRNGKey(5))
    centers0 = jnp.tile(jnp.array([[100.0, 100.0]], jnp.float32), (3, 1))
    reseed = jnp.broadcast_to(
        xy[:3][None], (cfg.max_iters, 3, 2)).astype(jnp.float32)
    c_kern, _ = kmeans_pallas(xy, centers0, reseed, cfg.max_iters,
                              interpret=True)
    assert np.isfinite(np.asarray(c_kern)).all()
    # All centers pulled back into the data's bounding box.
    assert (np.asarray(c_kern) < 10.0).all()


@pytest.mark.parametrize("impl", ["dense", "pallas"])
def test_forced_impl_dispatch(impl):
    # Both forced impls must route through the public kmeans() entry; the
    # forced kernel path runs in interpret mode off-TPU.  Same RNG-derived
    # inits, so the two impls land in the same mixture modes.
    cfg = ClusterConfig(impl=impl)
    key = jax.random.PRNGKey(9)
    xy = _mixture(key)
    centers, assign = cluster.kmeans(key, xy, cfg)
    assert centers.shape == (3, 2) and assign.shape == (xy.shape[0],)
    assert np.isfinite(np.asarray(centers)).all()
    assert (np.asarray(centers) < 10.0).all()
