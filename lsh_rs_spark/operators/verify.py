"""Exact-verify stage: candidate pairs → verified edges.

The reference re-ranks candidates with exact distances
(`lsh-py/src/dist.rs:26-52` — cosine/L2 `cdist` then sort).  The dedup
analogue is exact **Jaccard on shingle sets** (MinHash family) and exact
**Hamming on sketches** (SimHash family), computed pair-shaped instead of
query-shaped.

Jaccard is computed relationally — explode the two shingle sets, count
matching ids, derive |A∩B| / (|A|+|B|-|A∩B|) — no UDF, fully codegen, and
the intersection join shuffles on ``sid`` (well-distributed hash keys) so
hot documents do not make hot partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lsh_rs_spark.config import DedupConfig, SimHashConfig
from lsh_rs_spark.functions.simhash import hamming


def shingle_table(sig: DataFrame) -> DataFrame:
    """(doc_id, shingles) → long (doc_id, sid), ids already distinct per doc."""
    return sig.select("doc_id", F.explode("shingles").alias("sid"))


def jaccard_edges(
    pairs: DataFrame, sig: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Exact Jaccard for each candidate pair; keep >= threshold.

    Plan shape: pairs ⋈ shingles(src) ⋈ shingles(dst) on sid — two shuffles
    on doc keys plus one count agg on the pair key. Set sizes come from the
    signature table (one extra cheap agg), not a recount of the join.
    """
    # prune: only docs that occur in a candidate pair need their shingles
    # shuffled — at web scale candidates are a small fraction of the corpus,
    # so this semi-join shrinks the intersection join by ~the dup rate.
    cand_docs = (
        pairs.select(F.col("src").alias("doc_id"))
        .unionByName(pairs.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    sh = shingle_table(sig.join(cand_docs, "doc_id", "left_semi"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs
        .join(sh.select(F.col("doc_id").alias("src"), "sid"), "src")
        .join(sh.select(F.col("doc_id").alias("dst"), "sid"), ["dst", "sid"])
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("src"), F.col("n").alias("n_src")), "src")
        .join(sizes.select(F.col("doc_id").alias("dst"), F.col("n").alias("n_dst")), "dst")
        .withColumn("n_union", F.col("n_src") + F.col("n_dst") - F.col("n_common"))
        .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .where(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("src", "dst", "n_common", "n_union", "jaccard")
    )


def hamming_edges(
    pairs: DataFrame, sketches: DataFrame, cfg: SimHashConfig
) -> DataFrame:
    """(src,dst) pairs × (doc_id, simhash) → pairs with Hamming <= threshold.

    The sketch table is narrow (16 bytes/row) but corpus-sized — no
    broadcast hint; AQE picks broadcast only when it actually fits.
    """
    sk = sketches.select("doc_id", "simhash")
    return (
        pairs
        .join(sk.select(F.col("doc_id").alias("src"), F.col("simhash").alias("h_src")), "src")
        .join(sk.select(F.col("doc_id").alias("dst"), F.col("simhash").alias("h_dst")), "dst")
        .withColumn("hamming", hamming("h_src", "h_dst").cast("int"))
        .where(F.col("hamming") <= cfg.hamming_threshold)
        .select("src", "dst", "hamming")
    )
