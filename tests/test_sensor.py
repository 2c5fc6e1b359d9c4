"""Sensor model tests: scan filtering, likelihood, simulator consistency."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlolocalisation_tpu.config import SensorModelConfig
from montecarlolocalisation_tpu.maps import from_walls
from montecarlolocalisation_tpu.models import sensor

BOX = from_walls([[[0, 1, 2, 3]]])
CFG = SensorModelConfig(ray_mode="dda")


def test_filter_scan_reference_rules():
    cfg = SensorModelConfig()
    n = 726
    angle_min = math.radians(-135.0)
    inc = math.radians(0.352)
    ranges = np.full(n, 0.5)
    ranges[5] = np.nan          # -> replaced by 1.05, kept
    ranges[6] = np.inf          # -> replaced by 1.05, kept
    ranges[7] = 99.0            # finite out-of-range -> DROPPED
    angles, radii, mask = sensor.filter_scan(
        ranges, angle_min, inc, range_min=0.1, range_max=5.0, cfg=cfg)
    # Crop (-120, 120) strict; beam 7 dropped shifts indices after it.
    deg = np.degrees(angles)
    assert (deg > -120).all() and (deg < 120).all()
    assert mask.all()
    # Reproduce by hand:
    keep = []
    for i in range(n):
        r = ranges[i]
        a = angle_min + i * inc
        if not np.isfinite(r):
            keep.append((1.05, a))
        elif 0.1 <= r <= 5.0:
            keep.append((r, a))
    keep = [(r, a) for (r, a) in keep if -120 < math.degrees(a) < 120]
    keep = keep[::cfg.beam_skip]
    assert len(keep) == len(radii)
    np.testing.assert_allclose(radii, [r for r, _ in keep], rtol=1e-6)
    np.testing.assert_allclose(angles, [a for _, a in keep], rtol=1e-6)


def test_filter_scan_padding():
    angles, radii, mask = sensor.filter_scan(
        np.full(726, 0.5), math.radians(-135), math.radians(0.352),
        0.1, 5.0, pad_to=40)
    # 682 beams survive the (-120,120) crop; every 20th -> 35.
    assert len(angles) == 40 and mask.sum() == 35


def test_gauss_pdf_matches_lut_semantics():
    cfg = SensorModelConfig()
    d = jnp.array([0.0, 0.1, 1.0, 1.11, -0.01])
    p = np.asarray(sensor.gauss_pdf(d, cfg))
    denom = 0.1 * math.sqrt(2 * math.pi)
    assert p[0] == pytest.approx(1.0 / denom, rel=1e-6)
    assert p[1] == pytest.approx(math.exp(-0.5) / denom, rel=1e-5)
    assert p[3] == 0.0 and p[4] == 0.0  # outside LUT support


def test_true_pose_scores_highest():
    angles = np.deg2rad(np.linspace(-120, 120, 13)).astype(np.float32)
    true_pose = jnp.array([0.45, 0.38, 0.7])
    scan = sensor.simulate_scan(BOX, true_pose, angles, CFG)
    candidates = jnp.stack([
        true_pose,
        jnp.array([0.30, 0.50, 2.0]),
        jnp.array([0.55, 0.25, -1.0]),
        jnp.array([0.45, 0.38, 0.7 + np.pi]),
    ])
    w = np.asarray(sensor.beam_weights(BOX, candidates, scan, CFG))
    assert w[0] == w.max()
    assert w[0] > 0


def test_invalid_particle_weight_exactly_zero():
    angles = np.deg2rad(np.linspace(-120, 120, 13)).astype(np.float32)
    scan = sensor.simulate_scan(BOX, jnp.array([0.45, 0.45, 0.0]), angles, CFG)
    parts = jnp.array([
        [0.05, 0.45, 0.0],   # inside wall
        [-1.0, 0.45, 0.0],   # off map
        [0.45, 0.45, 0.0],   # valid-ish? stencil 0.1 touches walls at 0.8/0.0
    ])
    w = np.asarray(sensor.beam_weights(BOX, parts, scan, CFG))
    assert w[0] == 0.0 and w[1] == 0.0


def test_rand_component_on_max_range():
    cfg = CFG
    angles = np.array([0.0], dtype=np.float32)
    # Open 2x2 map, pose far from walls -> expected = max_range.
    m = from_walls([[[1, 2], [1]], [[2], []]])
    pose = jnp.array([0.45, 0.45, 0.0])
    scan = sensor.simulate_scan(m, pose, angles, cfg)
    assert float(scan.ranges[0]) == pytest.approx(1.0)
    # A particle at the same pose: diff=0 -> gauss max, plus w_rand kicks in
    # because obs == max_range.
    w = sensor.beam_weights(m, pose[None, :], scan, cfg)
    denom = cfg.sigma * math.sqrt(2 * math.pi)
    expected = cfg.w_hit * (1.0 / denom) + cfg.w_rand * 1.0
    assert float(w[0]) == pytest.approx(expected, rel=1e-5)


def test_mask_zeroes_contribution():
    angles = np.deg2rad(np.linspace(-120, 120, 13)).astype(np.float32)
    pose = jnp.array([0.45, 0.38, 0.7])
    scan = sensor.simulate_scan(BOX, pose, angles, CFG)
    masked = sensor.Scan(angles=scan.angles, ranges=scan.ranges,
                         mask=jnp.zeros_like(scan.mask))
    w = sensor.beam_weights(BOX, pose[None, :], masked, CFG)
    assert float(w[0]) == 0.0


def test_negation_convention_is_applied():
    # With an asymmetric pose, negated vs non-negated beam angles must give
    # different expectations for off-axis beams.
    cfg_neg = CFG
    cfg_pos = SensorModelConfig(ray_mode="dda", negate_beam_angle=False)
    pose = jnp.array([0.45, 0.25, 0.3])
    a = jnp.array([np.deg2rad(60.0)], dtype=jnp.float32)
    e_neg = sensor.expected_ranges(BOX, pose, a, cfg_neg)
    e_pos = sensor.expected_ranges(BOX, pose, a, cfg_pos)
    assert abs(float(e_neg[0]) - float(e_pos[0])) > 1e-3


def test_simulator_noise_reproducible():
    angles = np.deg2rad(np.linspace(-120, 120, 13)).astype(np.float32)
    pose = jnp.array([0.45, 0.38, 0.7])
    k = jax.random.PRNGKey(0)
    s1 = sensor.simulate_scan(BOX, pose, angles, CFG, key=k)
    s2 = sensor.simulate_scan(BOX, pose, angles, CFG, key=k)
    np.testing.assert_array_equal(np.asarray(s1.ranges), np.asarray(s2.ranges))
    s3 = sensor.simulate_scan(BOX, pose, angles, CFG, key=jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(s1.ranges), np.asarray(s3.ranges))


def test_log_beam_combine_mode():
    """Opt-in product-likelihood mode: positive weights, max at the truth,
    and monotone in the sum-mode ordering near the mode."""
    cfg = SensorModelConfig(ray_mode="dda", beam_combine="log")
    angles = np.deg2rad(np.linspace(-120, 120, 13)).astype(np.float32)
    true_pose = jnp.array([0.45, 0.38, 0.7])
    scan = sensor.simulate_scan(BOX, true_pose, angles, CFG)
    candidates = jnp.stack([
        true_pose,
        jnp.array([0.30, 0.50, 2.0]),
        jnp.array([0.45, 0.38, 0.7 + np.pi]),
    ])
    w = np.asarray(sensor.beam_weights(BOX, candidates, scan, cfg))
    assert (w >= 0).all() and np.isfinite(w).all()
    assert w[0] == w.max() and w[0] > 0
    # Max-shift normalization: the best particle gets weight 1.
    assert w[0] == pytest.approx(1.0, rel=1e-5)
    # Temperature softens the ratio.
    cfg_t = SensorModelConfig(ray_mode="dda", beam_combine="log",
                              log_temperature=4.0)
    wt = np.asarray(sensor.beam_weights(BOX, candidates, scan, cfg_t))
    assert wt[1] / wt[0] > w[1] / w[0]


def test_simulate_scan_dropout_and_outliers(default_map):
    cfg = SensorModelConfig(lookup_mode="gather")
    angles = np.deg2rad(np.linspace(-118, 118, 256)).astype(np.float32)
    pose = jnp.array([1.25, 1.25, 0.0])
    key = jax.random.PRNGKey(0)
    # dropout_p=1: every beam reports the NaN-replacement radius.
    s = sensor.simulate_scan(default_map, pose, angles, cfg, key=key,
                             noise_sigma=0.0, dropout_p=1.0)
    np.testing.assert_allclose(np.asarray(s.ranges),
                               cfg.invalid_beam_range)
    # outlier_p=0.5: roughly half the beams move off the clean value.
    clean = np.asarray(
        sensor.simulate_scan(default_map, pose, angles, cfg).ranges)
    s = sensor.simulate_scan(default_map, pose, angles, cfg, key=key,
                             noise_sigma=0.0, outlier_p=0.5)
    frac = np.mean(~np.isclose(np.asarray(s.ranges), clean))
    assert 0.3 < frac < 0.7
    # No key: knobs are inert, scan is the clean expectation.
    s0 = sensor.simulate_scan(default_map, pose, angles, cfg,
                              dropout_p=1.0, outlier_p=1.0)
    np.testing.assert_allclose(np.asarray(s0.ranges), clean)


def test_simulate_scan_unmapped_obstacle(default_map):
    cfg = SensorModelConfig(lookup_mode="gather")
    angles = np.zeros(1, np.float32)  # single forward beam
    pose = jnp.array([1.25, 1.25, 0.0])
    clean = float(sensor.simulate_scan(default_map, pose, angles,
                                       cfg).ranges[0])
    assert clean > 0.1
    # Disc halfway to the first wall (beam negation irrelevant at angle 0;
    # ray origin is laser_offset ahead of the pose).
    ox = 1.25 + cfg.laser_offset
    radius = 0.05
    s = sensor.simulate_scan(
        default_map, pose, angles, cfg,
        obstacle=(ox + clean / 2 + radius, 1.25, radius))
    d = float(s.ranges[0])
    assert abs(d - clean / 2) < 1e-5 and d < clean
    # Disc behind the robot: no effect.
    s = sensor.simulate_scan(default_map, pose, angles, cfg,
                             obstacle=(ox - 0.5, 1.25, radius))
    assert abs(float(s.ranges[0]) - clean) < 1e-6


def test_ray_disc_distance_miss_and_tangent():
    d = sensor.ray_disc_distance(0.0, 0.0, 0.0, 1.0, 0.5, 0.2, 2.0)
    assert float(d) == 2.0  # passes 0.5 above a 0.2-radius disc
    d = sensor.ray_disc_distance(0.0, 0.0, 0.0, 1.0, 0.0, 0.25, 2.0)
    np.testing.assert_allclose(float(d), 0.75, rtol=1e-6)


# ---------------------------------------------------------------------------
# Round-4: unknown-aware scoring on partial learned maps
# ---------------------------------------------------------------------------
def _corridor_pair():
    """1x2 corridor: conservative maze seals the shared edge (the
    'unexplored' frontier), the known maze leaves it open."""
    cons = from_walls([[[0, 1, 2, 3], [0, 1, 2, 3]]])
    known = from_walls([[[1, 2, 3], [0, 1, 3]]])
    return cons, known


def test_beam_weights_partial_fully_known_matches_standard():
    """When known == conservative there is no frontier: the partial
    scorer must equal beam_weights exactly (same casts, same model)."""
    cfg = SensorModelConfig(ray_mode="dda", lookup_mode="gather")
    m = from_walls([[[1, 2, 3], [0, 1, 3]]])
    key = jax.random.PRNGKey(0)
    parts = jnp.stack([
        jax.random.uniform(key, (64,), minval=0.15, maxval=1.45),
        jax.random.uniform(jax.random.fold_in(key, 1), (64,),
                           minval=0.15, maxval=0.65),
        jax.random.uniform(jax.random.fold_in(key, 2), (64,),
                           minval=-3.0, maxval=3.0)], axis=-1)
    angles = jnp.asarray(np.deg2rad([-45.0, 0.0, 45.0]), jnp.float32)
    scan = sensor.make_scan(angles, jnp.asarray([0.4, 0.6, 0.9]))
    a = sensor.beam_weights(m, parts, scan, cfg, valid_offset=m.resolution)
    b = sensor.beam_weights_partial(m, m, parts, scan, cfg,
                                    valid_offset=m.resolution)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-7)


def test_beam_weights_partial_frontier_credit():
    """A beam that crosses the exploration frontier and measures beyond
    it gets the flat unknown credit — not the phantom-wall mismatch the
    conservative map alone would give.  (Pins the "flat" mode explicitly;
    the default is the interval credit since round 5.)"""
    cfg = SensorModelConfig(ray_mode="dda", lookup_mode="gather",
                            unknown_credit_mode="flat")
    cons, known = _corridor_pair()
    # Facing +x from the left cell: frontier (sealed shared edge) at
    # x=0.8 -> d_cons = 0.45 from the laser at x=0.35; known map runs to
    # the far wall (capped at max_range 1.0).
    parts = jnp.asarray([[0.25, 0.4, 0.0]], jnp.float32)
    angles = jnp.zeros((1,), jnp.float32)

    def score(obs, fn=sensor.beam_weights_partial, **kw):
        scan = sensor.make_scan(angles, jnp.asarray([obs], jnp.float32))
        return float(fn(cons, known, parts, scan, cfg,
                        valid_offset=cons.resolution, **kw)[0])

    peak = cfg.w_hit / (cfg.sigma * math.sqrt(2.0 * math.pi))
    credit = cfg.unknown_credit * peak
    # (a) measured beyond the frontier: flat credit, NOT a mismatch.
    np.testing.assert_allclose(score(0.9), credit, rtol=1e-5)
    # (b) measured at the frontier distance: still uninformative.
    np.testing.assert_allclose(score(0.45), credit, rtol=1e-5)
    # (c) measured SHORT of the frontier: a claim about mapped free
    # space — scored (punished) against the known map, same as the
    # standard model on the known maze.
    scan_short = sensor.make_scan(angles, jnp.asarray([0.2], jnp.float32))
    std = float(sensor.beam_weights(known, parts, scan_short, cfg,
                                    valid_offset=known.resolution)[0])
    np.testing.assert_allclose(score(0.2), std, rtol=1e-5)
    # The conservative-only scorer would have punished (a): the partial
    # scorer's credit must dominate it.
    scan_beyond = sensor.make_scan(angles, jnp.asarray([0.9], jnp.float32))
    cons_only = float(sensor.beam_weights(
        cons, parts, scan_beyond, cfg, valid_offset=cons.resolution)[0])
    assert score(0.9) > 10.0 * cons_only


def test_beam_weights_partial_interval_credit():
    """unknown_credit_mode='interval' (frontier-DISTANCE-aware credit,
    r4 VERDICT #2): the credit is the marginal density of the observation
    under "a wall sits uniformly in the unknown stretch beyond the
    frontier" — 1/(max_range - d_frontier + sigma), capped at the
    Gaussian peak.  Grazing beams (short unknown stretch) score HIGHER
    than beams traveling deep through unknown space; chip-measured to
    nearly double half-explored-map relocalization (BENCH_DETAILS
    round-5 reloc table)."""
    import dataclasses as dc

    cfg = SensorModelConfig(ray_mode="dda", lookup_mode="gather",
                            unknown_credit_mode="interval")
    cons, known = _corridor_pair()
    parts = jnp.asarray([[0.25, 0.4, 0.0]], jnp.float32)
    angles = jnp.zeros((1,), jnp.float32)

    def score(obs, c=cfg):
        scan = sensor.make_scan(angles, jnp.asarray([obs], jnp.float32))
        return float(sensor.beam_weights_partial(
            cons, known, parts, scan, c, valid_offset=cons.resolution)[0])

    # Frontier at d_cons = 0.45: expected credit w_hit / (1.0 - 0.45 + σ).
    want = cfg.w_hit / (cfg.max_range - 0.45 + cfg.sigma)
    np.testing.assert_allclose(score(0.9), want, rtol=1e-4)
    # The credit formula is monotone in the frontier distance (grazing >
    # deep unknown) and capped at the Gaussian peak.
    peak = cfg.w_hit / (cfg.sigma * math.sqrt(2.0 * math.pi))
    credit = lambda d: cfg.w_hit * min(
        1.0 / (cfg.max_range - d + cfg.sigma), peak / cfg.w_hit)
    assert credit(0.05) < credit(0.45) < credit(0.95) <= peak
    assert want < peak
    # Short-of-frontier observations keep the standard (punishing) score
    # exactly as in flat mode.
    flat = dc.replace(cfg, unknown_credit_mode="flat")
    scan_short = sensor.make_scan(angles, jnp.asarray([0.2], jnp.float32))
    a = float(sensor.beam_weights_partial(
        cons, known, parts, scan_short, cfg,
        valid_offset=cons.resolution)[0])
    b = float(sensor.beam_weights_partial(
        cons, known, parts, scan_short, flat,
        valid_offset=cons.resolution)[0])
    np.testing.assert_allclose(a, b, rtol=1e-6)
