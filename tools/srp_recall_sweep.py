"""SRP banding sweep on planted-twin embeddings — the vector-family
analogue of RECALL_SWEEP.md's MinHash table (reference harness:
`examples/notebooks/LSH_recall.ipynb` cells 10-13, recall vs K × L).

For each (n_bits, bands) config: recall@1 of ann_topk twin retrieval vs the
planted truth, the S-curve prediction at the twins' median cosine, and the
candidate-pair volume (the cost side of the tradeoff).

Usage: python tools/srp_recall_sweep.py [n_vecs]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from lsh_rs_spark.config import SRPConfig  # noqa: E402
from lsh_rs_spark.operators import ann as ANN  # noqa: E402
from lsh_rs_spark.sources.embeddings import synth_embeddings  # noqa: E402

GRID = [
    (8, 2),
    (16, 4),
    (16, 8),
    (32, 4),
    (32, 8),
    (64, 16),
]


def scurve(cos: float, bits_per_band: int, bands: int) -> float:
    theta = math.acos(max(-1.0, min(1.0, cos)))
    p1 = 1.0 - theta / math.pi
    return 1.0 - (1.0 - p1 ** bits_per_band) ** bands


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = synth_embeddings(spark, n, partitions=16).persist()
    twins = emb.where(F.col("is_twin")).persist()
    n_twins = twins.count()

    # median twin cosine (for the S-curve column)
    from lsh_rs_spark.functions.vectors import cosine_sim

    tw = twins.alias("t").join(
        emb.alias("b"), F.col("t.twin_of") == F.col("b.vec_id")
    ).select(cosine_sim(F.col("t.embedding"), F.col("b.embedding")).alias("cos"))
    med_cos = tw.approxQuantile("cos", [0.5], 0.001)[0]

    rows = []
    for n_bits, bands in GRID:
        cfg = SRPConfig(n_bits=n_bits, bands=bands, dim=64, seed=42)
        sk = ANN.srp_sketches(emb, cfg)
        n_cand = ANN.srp_candidate_pairs(sk, cfg).count()
        found = (
            ANN.ann_topk(twins, emb, cfg, k=1)
            .join(
                twins.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("twin_of").alias("neighbor_id"),
                ),
                ["query_id", "neighbor_id"],
                "left_semi",
            )
            .count()
        )
        rows.append(
            {
                "n_bits": n_bits,
                "bands": bands,
                "bits_per_band": n_bits // bands,
                "candidate_pairs": n_cand,
                "twin_recall_at_1": round(found / n_twins, 4),
                "scurve_at_median_cos": round(
                    scurve(med_cos, n_bits // bands, bands), 4
                ),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print(
        json.dumps(
            {
                "metric": "srp_twin_recall_sweep",
                "n_vecs": n,
                "n_twins": n_twins,
                "median_twin_cos": round(med_cos, 4),
                "rows": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
