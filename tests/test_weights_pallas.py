"""Parity tests for the fused beam-weight Pallas kernel (ops/weights_pallas).

Runs in interpret mode on the CPU test mesh (the real-TPU dispatch is
exercised by bench.py / the graft entry); asserts the kernel matches the
dense XLA path for every (ray_mode, beam_combine, quantize) combination the
dispatch in sensor.beam_weights routes to it.

Interpret mode executes the kernel grid as a Python loop, so cost scales
with tiles x beams x march steps and the XLA compile cache cannot help —
the single-launch parity tests run at ONE-tile shapes in the default
(fast) tier, and the batched/packed launch-geometry sweeps are marked
`slow` (same assertions, generous shapes; run with -m slow).
"""
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlolocalisation_tpu.config import SensorModelConfig
from montecarlolocalisation_tpu.maps import from_map_file
from montecarlolocalisation_tpu.models import resample, sensor
from montecarlolocalisation_tpu.models.sensor import _beam_weights_dense
from montecarlolocalisation_tpu.ops.weights_pallas import beam_weights_pallas

MAP_PATH = osp.join(osp.dirname(__file__), "..", "montecarlolocalisation_tpu",
                    "maps", "default_map.txt")


def _fixture(n=1024, beams=8, seed=0):
    m = from_map_file(MAP_PATH)
    cfg0 = SensorModelConfig()
    angles = np.deg2rad(np.linspace(-118, 118, beams)).astype(np.float32)
    parts = resample.sample_uniform_particles(jax.random.PRNGKey(seed), m, n)
    scan = sensor.simulate_scan(m, jnp.array([1.25, 1.25, 0.0]), angles,
                                cfg0)
    # Exercise the mask path: pad two dead lanes.
    scan = sensor.Scan(
        angles=jnp.pad(scan.angles, (0, 2)),
        ranges=jnp.pad(scan.ranges, (0, 2)),
        mask=jnp.pad(jnp.ones(beams, bool), (0, 2)),
    )
    return m, parts, scan


def _finish_log(m, cfg, parts, raw_logs):
    return sensor.finish_log_weights(m, cfg, parts, raw_logs)


@pytest.mark.parametrize("ray_mode", ["fixed", "analytic"])
@pytest.mark.parametrize("quantize", [False, True])
def test_kernel_matches_dense_sum(ray_mode, quantize):
    m, parts, scan = _fixture()
    cfg = SensorModelConfig(ray_mode=ray_mode, quantize_ray_deg=quantize)
    want = np.asarray(_beam_weights_dense(m, parts, scan, cfg,
                                          m.resolution, "bits"))
    got = np.asarray(beam_weights_pallas(m, parts, scan, cfg,
                                         interpret=True))
    # fixed mode matches to reassociation ulps (the kernel accumulates
    # beams sequentially, the dense reduce re-associates); analytic can
    # additionally differ by float rounding at pixel-boundary ties (one ray
    # in ~1e5), which shifts a beam's whole Gaussian.
    if ray_mode == "fixed":
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    else:
        close = np.isclose(got, want, rtol=1e-5, atol=1e-5)
        assert close.mean() > 0.999
        np.testing.assert_allclose(got[close], want[close],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ray_mode", ["fixed", "analytic"])
def test_kernel_matches_dense_log(ray_mode):
    m, parts, scan = _fixture()
    cfg = SensorModelConfig(ray_mode=ray_mode, beam_combine="log",
                            log_temperature=2.0)
    want = np.asarray(_beam_weights_dense(m, parts, scan, cfg,
                                          m.resolution, "bits"))
    raw = beam_weights_pallas(m, parts, scan, cfg, interpret=True)
    got = np.asarray(_finish_log(m, cfg, parts, raw))
    close = np.isclose(got, want, rtol=1e-4, atol=1e-6)
    if ray_mode == "analytic":
        assert close.mean() > 0.999
    else:
        assert close.all()


def test_kernel_rejects_dda():
    m, parts, scan = _fixture(n=64)
    cfg = SensorModelConfig(ray_mode="dda")
    with pytest.raises(ValueError):
        beam_weights_pallas(m, parts, scan, cfg, interpret=True)


def test_kernel_pads_to_tile():
    # N not a multiple of the 1024-lane tile: padding must not leak.
    m, parts, scan = _fixture(n=500)
    cfg = SensorModelConfig()
    want = np.asarray(_beam_weights_dense(m, parts, scan, cfg,
                                          m.resolution, "bits"))
    got = np.asarray(beam_weights_pallas(m, parts, scan, cfg,
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _batch_fixture(n_ep=3, n=1500, beams=12):
    m = from_map_file(MAP_PATH)
    cfg0 = SensorModelConfig()
    angles = np.deg2rad(np.linspace(-118, 118, beams)).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), n_ep + 1)
    parts = jnp.stack([
        resample.sample_uniform_particles(k, m, n) for k in keys[:-1]])
    poses = jnp.array([[1.25, 1.25, 0.0], [2.1, 0.5, 1.2], [0.5, 3.3, -2.0]])
    ranges = jnp.stack([
        sensor.simulate_scan(m, poses[e], angles, cfg0).ranges
        for e in range(n_ep)])
    mask = jnp.ones((n_ep, beams), bool).at[1, 3].set(False)
    return m, parts, jnp.asarray(angles), ranges, mask


@pytest.mark.slow
@pytest.mark.parametrize("ray_mode", ["fixed", "analytic"])
@pytest.mark.parametrize("combine", ["sum", "log"])
def test_batched_kernel_matches_per_episode(ray_mode, combine, monkeypatch):
    from montecarlolocalisation_tpu.ops.weights_pallas import (
        beam_weights_pallas_batched,
    )

    m, parts, angles, ranges, mask = _batch_fixture()
    cfg = SensorModelConfig(ray_mode=ray_mode, beam_combine=combine)

    def run():
        got = np.asarray(beam_weights_pallas_batched(
            m, parts, angles, ranges, mask, cfg, interpret=True))
        want = np.stack([
            np.asarray(beam_weights_pallas(
                m, parts[e],
                sensor.Scan(angles=angles, ranges=ranges[e], mask=mask[e]),
                cfg, interpret=True))
            for e in range(parts.shape[0])])
        return got, want

    # Default unroll: the grouped beam loop lets XLA fuse/reassociate
    # differently per launch shape (batched grid vs single grid), so the
    # two launches agree only to ulps.
    got, want = run()
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=0)
    # unroll=1 is the documented bit-exact single-beam loop: the batched
    # launch must match the per-episode launch EXACTLY.
    monkeypatch.setenv("MCL_BEAM_UNROLL", "1")
    got, want = run()
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_batched_dispatch_under_vmap_matches_dense():
    # The custom_vmap rule on TPU routes a vmapped beam_weights call to the
    # batched kernel; on CPU it takes the dense fallback.  Pin that the
    # BATCHED KERNEL SEMANTICS equal the dense vmap result (what the rule
    # promises), episode by episode, including the log epilogue.
    m, parts, angles, ranges, mask = _batch_fixture()
    for combine in ["sum", "log"]:
        cfg = SensorModelConfig(ray_mode="fixed", beam_combine=combine)
        want = np.asarray(jax.vmap(
            lambda p, r, mk: _beam_weights_dense(
                m, p, sensor.Scan(angles=angles, ranges=r, mask=mk), cfg,
                m.resolution, "bits"))(parts, ranges, mask))
        raws = []
        for e in range(parts.shape[0]):
            scan = sensor.Scan(angles=angles, ranges=ranges[e], mask=mask[e])
            raw = beam_weights_pallas(m, parts[e], scan, cfg, interpret=True)
            if combine == "log":
                raw = _finish_log(m, cfg, parts[e], raw)
            raws.append(np.asarray(raw))
        got = np.stack(raws)
        rtol = 1e-5 if combine == "sum" else 1e-4
        np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-6)


@pytest.mark.slow
def test_batched_kernel_nested_vmap_folds():
    # A second vmap level folds into the episode axis by reshape.
    from montecarlolocalisation_tpu.models.sensor import (
        _beam_weights_batched,
    )

    m, parts, angles, ranges, mask = _batch_fixture(n_ep=3, n=257)
    cfg = SensorModelConfig(ray_mode="fixed")
    p2 = jnp.stack([parts, parts + 0.01])          # [2, 3, N, 3]
    r2 = jnp.stack([ranges, ranges])
    m2 = jnp.stack([mask, mask])
    got = jax.vmap(lambda pp, rr, mm: _beam_weights_batched(
        m, pp, angles, rr, mm, cfg, interpret=True))(p2, r2, m2)
    flat = _beam_weights_batched(
        m, p2.reshape(6, 257, 3), angles, r2.reshape(6, -1),
        m2.reshape(6, -1), cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got).reshape(6, 257),
                                  np.asarray(flat))


@pytest.mark.slow
@pytest.mark.parametrize("n,n_ep", [
    (500, 3),    # rows=4, pack=2, one dangling episode in the last group
    (100, 9),    # rows=1, pack=8
    (300, 4),    # rows=3, pack=2, 2 dead sublanes per tile
])
def test_packed_batched_kernel_matches_per_episode(n, n_ep):
    from montecarlolocalisation_tpu.ops.weights_pallas import (
        beam_weights_pallas_batched, pack_geometry,
    )

    rows, n_pack, waste = pack_geometry(n)
    assert n_pack > 1 and waste < 1.75  # parity must hold even where the
    # dispatch gate (waste <= 1.25) would pick the dense path
    m = from_map_file(MAP_PATH)
    cfg0 = SensorModelConfig()
    beams = 12
    angles = np.deg2rad(np.linspace(-118, 118, beams)).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(21), n_ep)
    parts = jnp.stack([
        resample.sample_uniform_particles(k, m, n) for k in keys])
    ranges = jnp.stack([
        sensor.simulate_scan(
            m, jnp.array([0.9 + 0.4 * e, 1.1, 0.3 * e]), angles,
            cfg0).ranges
        for e in range(n_ep)])
    mask = jnp.ones((n_ep, beams), bool).at[0, 5].set(False)
    cfg = SensorModelConfig(ray_mode="fixed")
    got = np.asarray(beam_weights_pallas_batched(
        m, parts, jnp.asarray(angles), ranges, mask, cfg, interpret=True))
    assert got.shape == (n_ep, n)
    for e in range(n_ep):
        scan = sensor.Scan(angles=jnp.asarray(angles), ranges=ranges[e],
                           mask=mask[e])
        want = np.asarray(beam_weights_pallas(m, parts[e], scan, cfg,
                                              interpret=True))
        np.testing.assert_array_equal(got[e], want)


@pytest.mark.parametrize("ray_mode", ["fixed", "analytic"])
def test_kernel_on_wide_map(ray_mode):
    # Maps wider/taller than 64 raster px (> 7 cells) need multi-word bit
    # packing — regression for the W<=64 crash the map-family fuzz found.
    from montecarlolocalisation_tpu.maps import from_walls, generator

    m = from_walls(generator.generate_maze(9, 12, seed=4))
    cfg0 = SensorModelConfig()
    angles = np.deg2rad(np.linspace(-118, 118, 8)).astype(np.float32)
    parts = resample.sample_uniform_particles(jax.random.PRNGKey(2), m, 1024)
    scan = sensor.simulate_scan(m, jnp.array([2.0, 2.0, 0.3]), angles, cfg0)
    cfg = SensorModelConfig(ray_mode=ray_mode)
    want = np.asarray(_beam_weights_dense(m, parts, scan, cfg,
                                          m.resolution, "bits"))
    got = np.asarray(beam_weights_pallas(m, parts, scan, cfg,
                                         interpret=True))
    close = np.isclose(got, want, rtol=1e-5, atol=1e-6)
    if ray_mode == "fixed":
        assert close.all()
    else:
        # Analytic ties: the kernel's hoisted angle-addition directions
        # differ from cos(th+a) by ulps, flipping pixel-boundary ties —
        # this wall-dense 9x12 maze has ~0.5% tie lanes (the cast itself
        # matches DDA to 1e-4 on this map in test_analytic's fuzz).
        assert close.mean() > 0.99


@pytest.mark.slow
def test_fixed_march_prepared_matches_chain(monkeypatch):
    """march_prepared (default) is bit-exact with the legacy bitlookup
    chain march (MCL_FIXED_MARCH=loop) on a gridline map."""
    from montecarlolocalisation_tpu.ops import weights_pallas as wp

    m, parts, scan = _fixture(n=1024)
    cfg = SensorModelConfig(ray_mode="fixed")
    got_default = np.asarray(beam_weights_pallas(m, parts, scan, cfg,
                                                 interpret=True))
    monkeypatch.setenv("MCL_FIXED_MARCH", "loop")
    got_chain = np.asarray(beam_weights_pallas(m, parts, scan, cfg,
                                               interpret=True))
    np.testing.assert_array_equal(got_default, got_chain)


def test_fixed_kernel_nongridline_chain_march():
    """Non-gridline rasters have no analytic caster: the kernel must fall
    back to the in-kernel bitlookup chain march and still match the dense
    path (this is the only remaining consumer of that march)."""
    from montecarlolocalisation_tpu.maps import from_raster

    occ = np.zeros((33, 33), dtype=bool)
    occ[:, 0] = occ[:, -1] = occ[0, :] = occ[-1, :] = True
    occ[13, 4:28] = True   # off-lattice wall row
    occ[4:28, 21] = True   # off-lattice wall column
    m = from_raster(occ, resolution=0.1)

    from montecarlolocalisation_tpu.ops.analytic import AnalyticCasterCache

    assert AnalyticCasterCache.get(m) is None  # really non-gridline

    cfg = SensorModelConfig(ray_mode="fixed")
    angles = np.deg2rad(np.linspace(-118, 118, 6)).astype(np.float32)
    parts = resample.sample_uniform_particles(jax.random.PRNGKey(3), m, 1024)
    scan = sensor.simulate_scan(m, jnp.array([1.6, 1.6, 0.7]), angles, cfg)
    want = np.asarray(_beam_weights_dense(m, parts, scan, cfg,
                                          m.resolution, "bits"))
    got = np.asarray(beam_weights_pallas(m, parts, scan, cfg,
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
