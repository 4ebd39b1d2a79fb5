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
