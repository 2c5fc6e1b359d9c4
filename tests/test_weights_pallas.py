"""Parity tests for the fused beam-weight Pallas kernel (ops/weights_pallas).

Runs in interpret mode on the CPU test mesh (the real-TPU dispatch is
exercised by bench.py / the graft entry); asserts the kernel matches the
dense XLA path for every (ray_mode, beam_combine, quantize) combination the
dispatch in sensor.beam_weights routes to it.
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


def _fixture(n=2048, beams=12, seed=0):
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
    logs = raw_logs / cfg.log_temperature
    prob = jnp.exp(logs - jnp.max(logs))
    valid = sensor._valid_pos_bits(m, parts[:, 0], parts[:, 1])
    return jnp.where(valid, prob, 0.0)


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
    m, parts, scan = _fixture(n=1500)
    cfg = SensorModelConfig()
    want = np.asarray(_beam_weights_dense(m, parts, scan, cfg,
                                          m.resolution, "bits"))
    got = np.asarray(beam_weights_pallas(m, parts, scan, cfg,
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
