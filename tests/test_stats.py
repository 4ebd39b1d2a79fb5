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


def test_simhash_probe_recall_floor_pigeonhole_endpoints():
    """Closed-form consequences of the exact probe model: plain banding
    certifies h <= bands-1; full single-bit probing (budget = bits/band)
    certifies h <= 2*bands-1 and no further (RECALL_SWEEP.md r5)."""
    for h in range(0, 4):  # bands-1 = 3
        assert stats.simhash_probe_recall_floor(32, 4, 0, h) == 1.0
    assert stats.simhash_probe_recall_floor(32, 4, 0, 4) < 1.0
    for h in range(0, 8):  # 2*bands-1 = 7
        assert stats.simhash_probe_recall_floor(32, 4, 8, h) == 1.0
    assert stats.simhash_probe_recall_floor(32, 4, 8, 8) < 1.0


def test_simhash_probe_recall_floor_matches_hand_inclusion_exclusion():
    # budget=0, h=5, 4 bands of 8/32 bits: P(some band error-free) by
    # inclusion-exclusion = (4*C(24,5) - 6*C(16,5) + 4*C(8,5)) / C(32,5)
    want = (4 * math.comb(24, 5) - 6 * math.comb(16, 5)
            + 4 * math.comb(8, 5)) / math.comb(32, 5)
    got = stats.simhash_probe_recall_floor(32, 4, 0, 5)
    assert abs(got - want) < 1e-12


def test_simhash_probe_recall_floor_tracks_the_measured_sweep():
    """RECALL_SWEEP.md r5 measured recall over pairs at h <= 5; the model
    at exactly h=5 (worst distance in the set) must sit at or below every
    measured row up to a sub-1% uniform-position tolerance (bit positions
    in real sketches are mildly correlated), and be monotone in budget."""
    measured = {0: 0.8071, 2: 0.9215, 4: 0.9608, 8: 1.0000}
    prev = -1.0
    for q, r in measured.items():
        floor = stats.simhash_probe_recall_floor(32, 4, q, 5)
        assert floor <= r + 0.005
        assert floor > prev
        prev = floor


def test_suggest_probe_budget():
    # simhash: certification is exact — full probing needed at h=2b-1,
    # none at h<=b-1
    assert stats.suggest_probe_budget(1.0, "simhash", n_bits=32, bands=4) == 8
    assert stats.suggest_probe_budget(
        1.0, "simhash", n_bits=32, bands=4, hamming_threshold=3) == 0
    # a partial-probing target between the endpoints
    q = stats.suggest_probe_budget(
        0.9, "simhash", n_bits=32, bands=4, hamming_threshold=5)
    assert 0 < q <= 8
    assert stats.simhash_probe_recall_floor(32, 4, q, 5) >= 0.9
    assert stats.simhash_probe_recall_floor(32, 4, q - 1, 5) < 0.9
    # calibrated families: smallest swept budget meeting the target
    assert stats.suggest_probe_budget(0.90, "l2") == 32
    assert stats.suggest_probe_budget(0.70, "l2") == 8
    assert stats.suggest_probe_budget(0.15, "minhash") == 16
    import pytest
    with pytest.raises(ValueError, match="saturates"):
        stats.suggest_probe_budget(0.99, "l2")
    with pytest.raises(ValueError, match="re-band"):
        stats.suggest_probe_budget(1.0, "simhash", n_bits=32, bands=4,
                                   hamming_threshold=9)


def test_suggest_shuffle_partitions():
    from lsh_rs_spark.tuning import suggest_shuffle_partitions

    # waves floor: tiny corpus still gets 2 tasks per core
    assert suggest_shuffle_partitions(1_000, 8) == 16
    assert suggest_shuffle_partitions(1_000, 32) == 64
    # size constraint: the 5.6M-doc scaling corpus needs well over one
    # task wave at 8 cores (the partitions=cores setting that spilled)
    p = suggest_shuffle_partitions(5_600_000, 8)
    assert p > 32
    # each partition's heavy-exchange share stays under the 64 MB target
    from lsh_rs_spark.tuning import EDGES_SHUFFLE_BYTES_PER_DOC

    assert EDGES_SHUFFLE_BYTES_PER_DOC * 5_600_000 / p <= 64 << 20
    # monotone in corpus size and doc size
    assert suggest_shuffle_partitions(10_000_000, 8) >= p
    assert suggest_shuffle_partitions(
        5_600_000, 8, avg_doc_bytes=7500) >= p
    # 100 TB-ish sanity: partition count lands in the tens of thousands,
    # not millions (AQE-coalescible) — scale math holds
    assert 50_000 < suggest_shuffle_partitions(
        10_000_000_000, 1000, avg_doc_bytes=10_000) < 5_000_000


def test_suggest_shuffle_partitions_calibrated_constants():
    from lsh_rs_spark.tuning import suggest_shuffle_partitions

    # calibrated constants override the module defaults verbatim (no
    # avg_doc_bytes rescaling — measured bytes already embed doc length)
    base = suggest_shuffle_partitions(5_600_000, 8)
    doubled = suggest_shuffle_partitions(
        5_600_000, 8, edges_bytes_per_doc=2 * 1690)
    assert doubled >= 2 * base - 16
    # a lighter corpus needs fewer partitions, floored at 2 waves/core
    assert suggest_shuffle_partitions(
        5_600_000, 8, pairs_bytes_per_doc=10, edges_bytes_per_doc=20
    ) < base
