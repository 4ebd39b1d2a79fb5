"""Dedup-suite operators for training-data pipelines.

Exact dedup (hash-groupBy), n-gram-Jaccard near-dup (the MinHash pipeline's
exact little sibling for small candidate sets), and embedding-cosine
near-dup.  MinHash+LSH and SimHash near-dup live in ``lsh.py``/``verify.py``;
substring dedup in ``suffix.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lsh_rs_spark.functions.vectors import cosine_sim


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate detection: identical `text` bytes → one group.

    Output: (doc_id, rep_id, group_size) — rep is the min id per group.
    At scale this is one hash-agg on xxhash64(text) then a rep join; here we
    group on text directly (semantically identical, oracle-friendly).
    """
    w = Window.partitionBy(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.min(id_col).over(w).alias("rep_id"),
        F.count("*").over(w).alias("group_size"),
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (brute-force; the exact baseline).

    O(n²) by construction — the scale path is SRP-bucketed pairing
    (operators/ann.py srp_candidate_pairs) feeding the same cosine verify.
    """
    a = emb.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("src") < F.col("dst"))
        .withColumn("cos", cosine_sim("va", "vb"))
        .where(F.col("cos") >= threshold)
        .select("src", "dst", "cos")
    )
