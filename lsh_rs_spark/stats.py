"""LSH parameter-tuning math (public formulas; no Spark dependency).

Re-derives, from the published LSH literature, the same helpers the
reference exposes:

* ``collision_prob_l2``      ≙ `lsh-rs/src/stats.rs:23-27` (``l2_ph``),
  `lsh-py/floky/stats.py:5-28` — E2LSH P1 (Datar et al. 2004, and
  https://arxiv.org/pdf/1411.3787.pdf eq. 10).
* ``collision_prob_cosine``  ≙ `lsh-rs/src/stats.rs:32-34` (``srp_ph``) —
  SRP collision prob 1 - θ/π (Charikar 2002).
* ``estimate_l``             ≙ `lsh-rs/src/stats.rs:43-45`.
* ``det_prob_query``         ≙ `lsh-py/floky/stats.py:46-64` — the S-curve
  1-(1-p1^k)^l, which is also exactly the MinHash banding curve with
  k=rows_per_band, l=bands.
* ``minhash_band_threshold`` — (1/b)^(1/r), the standard banding threshold.
* ``optimal_bands_rows``     — grid search over (b, r) minimizing the
  false-positive + false-negative integral at a target Jaccard threshold
  (the datasketch-style tuner; public technique from Leskovec et al.,
  Mining of Massive Datasets ch. 3).
"""

from __future__ import annotations

import math


def _norm_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def collision_prob_l2(r: float, distance: float = 1.0) -> float:
    """P1 for the p-stable L2 hash with bucket width r at distance `distance`."""
    a = 1.0 - 2.0 * _norm_cdf(-r / distance)
    b = (
        2.0
        / (math.sqrt(2.0 * math.pi) * r / distance)
        * (1.0 - math.exp(-(r * r) / (2.0 * distance * distance)))
    )
    return a - b


def collision_prob_cosine(sim: float) -> float:
    """P1 for sign random projections at cosine similarity `sim`."""
    return 1.0 - math.acos(max(-1.0, min(1.0, sim))) / math.pi


def estimate_l(delta: float, p1: float, k: int) -> int:
    """Number of hash tables L so that P(miss NN) <= delta: round(ln δ / ln(1-p1^k))."""
    return round(math.log(delta) / math.log(1.0 - p1 ** k))


def det_prob_query(p1: float, k: int, l: int) -> float:
    """S-curve: probability at least one of L tables collides on all K rows."""
    return 1.0 - (1.0 - p1 ** k) ** l


def minhash_band_threshold(bands: int, rows_per_band: int) -> float:
    """Jaccard where the banding S-curve crosses ≈0.5: (1/b)^(1/r)."""
    return (1.0 / bands) ** (1.0 / rows_per_band)


def simhash_probe_recall_floor(
    n_bits: int, bands: int, budget: int, hamming: int
) -> float:
    """EXACT recall floor of banded SimHash + store-side single-bit probing
    for a pair at exactly ``hamming`` differing bits (uniform positions).

    Model (matches operators/simhash_ops.simhash_multiprobe_pairs):
    ``bands`` bands of m = n_bits/bands bits; the store emits, per band,
    the original key plus ``budget`` single-bit-flip copies.  A band with
    e differing bits collides with probability c(e): c(0)=1 (identical
    band), c(1)=budget/m (the one errored bit must be among the probed
    positions), c(e>=2)=0 (single-bit probes cannot bridge 2+ errors).
    Pair collides iff >= 1 band collides; error positions are a uniform
    ``hamming``-subset of the n_bits positions, so the miss probability is
    a multivariate-hypergeometric sum computed by DP over bands:

        P(miss) = [ sum over (e_1..e_b), sum e_i = h,
                    prod_i C(m, e_i) * (1 - c(e_i)) ] / C(n, h)

    Closed-form consequences (both pytest-gated):
    * budget=0, h <= bands-1  -> 1.0  (plain-banding pigeonhole)
    * budget=m, h <= 2*bands-1 -> 1.0 (every 1-error band is bridged, so a
      miss needs >= 2 errors in EVERY band, i.e. h >= 2*bands)
    Against a measured sweep row at threshold h (which mixes pair distances
    <= h, all with higher collision probability) the model at exactly h
    acts as a floor UNDER THE UNIFORM-POSITION ASSUMPTION; real sketches
    have mildly correlated bit positions, so sub-1% overshoots are possible
    (observed: model 0.9644 vs measured 0.9608 at budget 4 in
    RECALL_SWEEP.md r5 — the endpoints are assumption-free and exact).
    """
    if n_bits % bands:
        raise ValueError("n_bits must divide into equal bands")
    m = n_bits // bands
    if not 0 <= budget <= m:
        raise ValueError(f"budget must be in [0, {m}] (single-bit flips per band)")
    if hamming < 0 or hamming > n_bits:
        raise ValueError("hamming out of range")
    if hamming == 0:
        return 1.0
    surv = {0: 0.0, 1: 1.0 - budget / m}  # 1 - c(e); e>=2 -> 1.0
    # DP over bands: g[r] = weighted count of error layouts for the bands
    # so far using r errors with EVERY band non-colliding
    g = [0.0] * (hamming + 1)
    g[0] = 1.0
    for _ in range(bands):
        nxt = [0.0] * (hamming + 1)
        for r, acc in enumerate(g):
            if acc == 0.0:
                continue
            for e in range(0, min(m, hamming - r) + 1):
                w = surv.get(e, 1.0)
                if w == 0.0:
                    continue
                nxt[r + e] += acc * math.comb(m, e) * w
        g = nxt
    return 1.0 - g[hamming] / math.comb(n_bits, hamming)


#: Measured recall-vs-budget calibration tables from RECALL_SWEEP.md
#: (rounds 4/5 sweeps; deterministic seeded corpora).  These carry the
#: CURVE SHAPE on a representative synthetic corpus — the suggestion for
#: the heuristic families interpolates them, which is honest about the
#: fact that no closed-form recall model exists for second-minimum
#: MinHash probing or xi-ranked L2 probing (Lv et al. give bounds, not
#: exact curves).  The SimHash family needs no table: its floor model
#: above is exact.
_SWEEP_CALIBRATION: dict[str, list[tuple[int, float]]] = {
    # RECALL_SWEEP.md round 5 — L2 query-directed xi^2 probing
    "l2": [(0, 0.2265), (2, 0.4530), (4, 0.5912), (8, 0.7514),
           (16, 0.8840), (32, 0.9558)],
    # RECALL_SWEEP.md round 4 — MinHash second-minimum substitution
    # (mid-similarity corpus BELOW the banding threshold — the regime
    # where probing matters at all)
    "minhash": [(0, 0.067), (2, 0.083), (4, 0.093), (8, 0.127),
                (16, 0.170)],
}


def suggest_probe_budget(
    target_recall: float,
    family: str,
    *,
    n_bits: int = 32,
    bands: int = 4,
    hamming_threshold: int | None = None,
) -> int:
    """Smallest probe budget predicted to reach ``target_recall``.

    * ``family="simhash"`` — exact: smallest budget whose
      ``simhash_probe_recall_floor`` at the certification distance
      (``hamming_threshold``, default 2*bands-1) reaches the target.  The
      floor is worst-case-at-threshold, so the measured sweep recall
      (RECALL_SWEEP.md r5) sits above the prediction at every budget.
    * ``family="l2"`` / ``"minhash"`` — calibrated: smallest swept budget
      whose measured recall on the RECALL_SWEEP corpus meets the target.
      Raises ValueError when the target exceeds the calibrated range —
      probing saturates; re-band (more tables / more bands) instead.
    """
    if not 0.0 < target_recall <= 1.0:
        raise ValueError("target_recall must be in (0, 1]")
    if family == "simhash":
        m = n_bits // bands
        h = hamming_threshold if hamming_threshold is not None else 2 * bands - 1
        for q in range(0, m + 1):
            if simhash_probe_recall_floor(n_bits, bands, q, h) >= target_recall - 1e-12:
                return q
        raise ValueError(
            f"even full single-bit probing (budget={m}) cannot certify "
            f"recall {target_recall} at hamming {h} with {bands} bands of "
            f"{m} bits — certification tops out at h <= {2 * bands - 1}; "
            "re-band (more bands) or lower the threshold"
        )
    table = _SWEEP_CALIBRATION.get(family)
    if table is None:
        raise ValueError(f"unknown family {family!r} (simhash | l2 | minhash)")
    for budget, recall in table:
        if recall >= target_recall:
            return budget
    raise ValueError(
        f"target recall {target_recall} exceeds the calibrated probing range "
        f"for {family!r} (max measured {table[-1][1]} at budget "
        f"{table[-1][0]}) — probing saturates; add tables/bands instead"
    )


def optimal_bands_rows(
    num_perm: int,
    threshold: float,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
    resolution: int = 200,
) -> tuple[int, int]:
    """Pick (bands, rows) for `num_perm` minimizing weighted FP+FN area.

    Integrates the S-curve below/above `threshold` numerically — the public
    tuning recipe (MMDS ch.3 / datasketch's _optimal_param).
    """
    best = (1, num_perm)
    best_err = float("inf")
    for r in range(1, num_perm + 1):
        if num_perm % r:
            continue
        b = num_perm // r
        fp = sum(
            det_prob_query(threshold * i / resolution, r, b)
            for i in range(resolution)
        ) * (threshold / resolution)
        fn = sum(
            1.0 - det_prob_query(threshold + (1 - threshold) * i / resolution, r, b)
            for i in range(resolution)
        ) * ((1.0 - threshold) / resolution)
        err = fp_weight * fp + fn_weight * fn
        if err < best_err:
            best_err = err
            best = (b, r)
    return best
