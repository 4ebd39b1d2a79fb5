"""Containment-pair recall of symmetric MinHash banding vs size ratio.

`verify.containment_edges` documents its recall bound honestly: candidate
pairs come from bands calibrated for JACCARD, and a containment pair
(small set A fully inside large set B) has jaccard ≈ |A|/|B| = 1/ratio, so
band collision probability decays with the size ratio.  This sweep
MEASURES that curve on planted data so the docstring's "adequate ≲3×"
claim is a number, not a vibe, and a user picking between
containment_edges and the suffix-array substring path (which has no such
bound — byte-level anchors don't care about document size) can read the
cutoff.

Planted corpus (deterministic, seed in the word stream): N base documents
of BASE_WORDS unique-ish words; for each ratio R, a wrapper document
containing the base text verbatim inside ~(R-1)×BASE_WORDS words of
filler.  Ground truth: every (base, wrapper) pair has word-shingle
containment ≈ 1.0.  Recall @ R = fraction of the N pairs that survive
candidate_pairs(explode_bands(signatures)) with the PRODUCTION config
(K=128, b=16, r=8, OPH) — exactly the pipeline's candidate stage.

Analytic twin printed alongside: p = 1-(1-j^r)^b at j = 1/R (the S-curve
at the implied jaccard), so the measurement also validates the formula a
capacity planner would use.

Usage: python tools/containment_recall.py [n_pairs_per_ratio]
Writes tools/containment_recall.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_WORDS = 120
RATIOS = (1.2, 1.5, 2.0, 3.0, 5.0, 8.0)


def _words(tag: str, n: int) -> list[str]:
    # deterministic, collision-free word stream per tag — no RNG needed
    return [f"{tag}w{i}x" for i in range(n)]


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from pyspark.sql import SparkSession, functions as F

    from lsh_rs_spark.config import PIPELINE_CONFIG as cfg
    from lsh_rs_spark.operators import lsh as L
    from lsh_rs_spark.stats import det_prob_query

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for ratio in RATIOS:
        rows = []
        filler_n = int(BASE_WORDS * (ratio - 1.0))
        for i in range(n_pairs):
            base = _words(f"r{ratio}b{i}", BASE_WORDS)
            filler = _words(f"r{ratio}f{i}", filler_n)
            # wrapper = filler head + verbatim base + filler tail
            half = filler_n // 2
            wrapper = filler[:half] + base + filler[half:]
            rows.append((2 * i, " ".join(base)))
            rows.append((2 * i + 1, " ".join(wrapper)))
        docs = spark.createDataFrame(rows, "doc_id: long, text: string")
        sig = L.signatures(docs, cfg)
        pairs = L.candidate_pairs(L.explode_bands(sig, cfg), cfg)
        got = {
            (r.src, r.dst)
            for r in pairs.collect()
            # only count planted (base, wrapper) pairs; cross-pair filler
            # collisions (possible at 64-bit word-hash level) don't count
            if r.dst == r.src + 1 and r.src % 2 == 0
        }
        recall = len(got) / n_pairs
        j = 1.0 / ratio  # implied jaccard of a full-containment pair
        analytic = det_prob_query(j, cfg.rows_per_band, cfg.bands)
        results[str(ratio)] = {
            "measured_recall": round(recall, 4),
            "implied_jaccard": round(j, 4),
            "analytic_band_collision_prob": round(analytic, 4),
        }
        print(f"ratio {ratio}: measured {recall:.3f} analytic {analytic:.3f}",
              file=sys.stderr)

    out = {
        "metric": "containment_pair_band_recall",
        "config": {"num_perm": cfg.num_perm, "bands": cfg.bands,
                   "rows_per_band": cfg.rows_per_band,
                   "minhash_mode": cfg.minhash_mode},
        "n_pairs_per_ratio": n_pairs,
        "base_words": BASE_WORDS,
        "results": results,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(REPO, "tools", "containment_recall.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
