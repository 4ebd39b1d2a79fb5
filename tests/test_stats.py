"""Parameter-math goldens, mirroring the reference's own unit tests."""

import math

from lsh_rs_spark import stats


def test_l2_ph_golden():
    # reference golden: lsh-rs/src/stats.rs:169-174 ("tested w/ numpy")
    assert abs(stats.collision_prob_l2(2.0, 1.0) - 0.609548422215397) < 1e-12


def test_estimate_l_golden():
    # reference golden: lsh-rs/src/stats.rs:177-183
    assert stats.estimate_l(0.2, 0.6, 5) == 20


def test_srp_collision_prob():
    # srp_ph (stats.rs:32-34): 1 - acos(s)/pi
    assert abs(stats.collision_prob_cosine(1.0) - 1.0) < 1e-12
    assert abs(stats.collision_prob_cosine(0.0) - 0.5) < 1e-12
    assert abs(stats.collision_prob_cosine(math.cos(math.pi / 4)) - 0.75) < 1e-12


def test_det_prob_query_scurve():
    # floky/stats.py:46-64: S-curve monotone in p1, L
    p = stats.det_prob_query(0.8, 4, 16)
    assert 0.99 < p <= 1.0
    assert stats.det_prob_query(0.2, 4, 16) < p


def test_band_threshold_matches_scurve_midpoint():
    t = stats.minhash_band_threshold(16, 8)
    # at the threshold similarity the S-curve is ≈ 1-(1-1/b)^b ≈ 0.63
    p = stats.det_prob_query(t, 8, 16)
    assert 0.5 < p < 0.75


def test_optimal_bands_rows():
    b, r = stats.optimal_bands_rows(128, 0.7)
    assert b * r == 128
    # chosen threshold should sit near the target
    assert abs(stats.minhash_band_threshold(b, r) - 0.7) < 0.2
