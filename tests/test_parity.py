"""Numerical parity vs a C++-faithful NumPy oracle (SURVEY.md §4).

The oracle (tests/oracle.py) transcribes the reference's sequential math
(Gaussian LUT + lerp, trunc worldToMap, 9-point stencil, 0.1 m march,
negated beams, likelihood mixture).  The vectorized JAX filter must match
it to float tolerance on identical inputs.
"""
import math
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlolocalisation_tpu.config import FilterConfig, SensorModelConfig
from montecarlolocalisation_tpu.maps import from_map_file
from montecarlolocalisation_tpu.models import motion, resample, sensor

from oracle import Oracle, diff_drive_decompose

MAP_PATH = osp.join(osp.dirname(__file__), "..", "montecarlolocalisation_tpu",
                    "maps", "default_map.txt")


@pytest.fixture(scope="module")
def setup():
    m = from_map_file(MAP_PATH)
    oracle = Oracle(np.asarray(m.occ))
    cfg = SensorModelConfig(ray_mode="fixed", lookup_mode="gather")
    angles = np.deg2rad(np.linspace(-115, 115, 16)).astype(np.float32)
    return m, oracle, cfg, angles


def test_beam_weights_match_oracle(setup):
    m, oracle, cfg, angles = setup
    parts = np.asarray(resample.sample_uniform_particles(
        jax.random.PRNGKey(3), m, 256))
    scan = sensor.simulate_scan(
        m, jnp.array([2.05, 2.05, 0.4]), angles, cfg)
    ranges = np.asarray(scan.ranges)
    got = np.asarray(sensor.beam_weights(m, jnp.asarray(parts), scan, cfg))
    want = oracle.compute_weights(parts.astype(np.float64), angles, ranges)
    # Exact-Gaussian vs LUT-with-lerp agree to ~1e-7 relative; f32 compute
    # gives a few 1e-4 absolute.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # Zero/non-zero (validity gating) must agree exactly.
    np.testing.assert_array_equal(got == 0.0, want == 0.0)


def test_raycast_matches_oracle(setup):
    m, oracle, cfg, _ = setup
    rng = np.random.default_rng(1)
    from montecarlolocalisation_tpu.models.raycast import raycast

    xs = rng.uniform(0.2, 4.6, 128)
    ys = rng.uniform(0.2, 4.6, 128)
    ths = rng.uniform(-np.pi, np.pi, 128)
    got = np.asarray(raycast(m, jnp.asarray(xs, jnp.float32),
                             jnp.asarray(ys, jnp.float32),
                             jnp.asarray(ths, jnp.float32), cfg))
    want = np.array([oracle.raycast(x, y, t)
                     for x, y, t in zip(xs, ys, ths)])
    # f32 vs f64 step accumulation can flip a boundary sample.
    agree = np.isclose(got, want, atol=1e-5)
    assert agree.mean() > 0.97
    if (~agree).any():
        assert np.abs(got[~agree] - want[~agree]).max() <= 0.1 + 1e-6


def test_validity_matches_oracle(setup):
    m, oracle, cfg, _ = setup
    from montecarlolocalisation_tpu.maps.grid import is_valid_pos

    rng = np.random.default_rng(2)
    xs = rng.uniform(-0.2, 5.1, 512)
    ys = rng.uniform(-0.2, 5.1, 512)
    got = np.asarray(is_valid_pos(m, jnp.asarray(xs, jnp.float32),
                                  jnp.asarray(ys, jnp.float32)))
    want = np.array([oracle.is_valid_pos(x, y) for x, y in zip(xs, ys)])
    assert (got == want).mean() > 0.995  # float pixel-tie boundary cases


def test_motion_decomposition_matches_oracle():
    st = motion.OdometryState.zero()
    cases = [((3.0, 5.0)), ((10.0, 4.0)), ((-2.0, 2.0)), ((7.7, 7.7))]
    pose = (0.0, 0.0, 0.0)
    enc_prev = (0.0, 0.0)
    for enc in cases:
        cfg = motion.MotionModelConfig() if hasattr(motion, "MotionModelConfig") \
            else None
        from montecarlolocalisation_tpu.config import MotionModelConfig
        cfg = MotionModelConfig()
        new, rot1, trans, rot2 = motion.diff_drive_update(
            st, jnp.float32(enc[0]), jnp.float32(enc[1]), cfg)
        (ox, oy, oth), orot1, otrans, orot2 = diff_drive_decompose(
            pose, enc_prev, enc)
        assert float(new.x) == pytest.approx(ox, abs=1e-5)
        assert float(new.y) == pytest.approx(oy, abs=1e-5)
        assert float(new.theta) == pytest.approx(oth, abs=1e-5)
        assert float(rot1) == pytest.approx(orot1, abs=1e-5)
        assert float(trans) == pytest.approx(otrans, abs=1e-5)
        assert float(rot2) == pytest.approx(orot2, abs=1e-5)


def test_gauss_exact_vs_lut_error_bound():
    from oracle import GaussianLUT

    lut = GaussianLUT()
    cfg = SensorModelConfig()
    diffs = np.linspace(0, 1.1, 2003)
    exact = np.asarray(sensor.gauss_pdf(jnp.asarray(diffs, jnp.float32), cfg))
    table = np.array([lut.get(d) for d in diffs])
    np.testing.assert_allclose(exact, table, atol=5e-5)
