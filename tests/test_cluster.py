"""k-means confidence tests, mirroring the reference's synthetic-cluster
fixture (generateParticleCluster, monte_carlo.cpp:1100-1150)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlolocalisation_tpu.config import ClusterConfig
from montecarlolocalisation_tpu.models import cluster

CFG = ClusterConfig()


def synthetic_cluster(key, n=1500, n_random=100,
                      center=(1.2, 4.4, -np.pi / 4)):
    """k uniform particles in [0, 4.4]^2 + a tight cluster (reference fixture)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    xs = jax.random.uniform(k1, (n,), minval=0.0, maxval=4.4)
    ys = jax.random.uniform(k2, (n,), minval=0.0, maxval=4.4)
    ts = jax.random.uniform(k3, (n,), minval=-3.14, maxval=3.14)
    cx = center[0] + jax.random.uniform(k4, (n,), minval=-0.005, maxval=0.005)
    cy = center[1] + jax.random.uniform(k5, (n,), minval=-0.005, maxval=0.005)
    in_cluster = jnp.arange(n) >= n_random
    parts = jnp.stack([
        jnp.where(in_cluster, cx, xs),
        jnp.where(in_cluster, cy, ys),
        jnp.where(in_cluster, center[2], ts)], axis=-1)
    weights = jnp.full((n,), 1.0 / n)
    return parts, weights


def test_tight_cluster_found_and_confident():
    parts, weights = synthetic_cluster(jax.random.PRNGKey(0))
    ratio, pose = cluster.cluster_confidence(
        jax.random.PRNGKey(1), parts, weights, jnp.float32(0.5), CFG)
    # ~93% of particles within 0.4 m of the cluster center.
    assert float(ratio) > 0.8
    assert float(pose[0]) == pytest.approx(1.2, abs=0.15)
    assert float(pose[1]) == pytest.approx(4.4, abs=0.15)
    assert float(pose[2]) == pytest.approx(-np.pi / 4, abs=0.1)


def test_diffuse_particles_not_confident():
    key = jax.random.PRNGKey(2)
    parts, weights = synthetic_cluster(key, n=1500, n_random=1500)
    ratio, pose = cluster.cluster_confidence(
        jax.random.PRNGKey(3), parts, weights, jnp.float32(0.8), CFG)
    assert float(ratio) < 0.8
    np.testing.assert_array_equal(np.asarray(pose), [-1.0, -1.0, -1.0])


def test_best_cluster_by_weight_not_size():
    # Two spatial clusters; the smaller one carries all the weight.
    n = 200
    a = jnp.stack([jnp.full((150,), 0.5), jnp.full((150,), 0.5),
                   jnp.zeros((150,))], axis=-1)
    b = jnp.stack([jnp.full((50,), 3.5), jnp.full((50,), 3.5),
                   jnp.zeros((50,))], axis=-1)
    parts = jnp.concatenate([a, b])
    weights = jnp.concatenate([jnp.zeros((150,)), jnp.full((50,), 1.0)])
    # Seed chosen so the random init separates the two point masses (the
    # reference's random init has the same degenerate-init failure mode).
    ratio, pose = cluster.cluster_confidence(
        jax.random.PRNGKey(0), parts, weights, jnp.float32(0.1), CFG)
    assert float(pose[0]) == pytest.approx(3.5, abs=0.05)
    # Confidence counts ALL particles near the best center: 50/200.
    assert float(ratio) == pytest.approx(0.25, abs=0.02)


def test_kmeans_shapes_and_determinism():
    parts, _ = synthetic_cluster(jax.random.PRNGKey(5))
    c1, a1 = cluster.kmeans(jax.random.PRNGKey(6), parts[:, :2], CFG)
    c2, a2 = cluster.kmeans(jax.random.PRNGKey(6), parts[:, :2], CFG)
    assert c1.shape == (3, 2) and a1.shape == (1500,)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
