"""SimHash document sketching + near-dup pair generation.

Two equivalent builders for the sketch table (doc_id, simhash):

* ``simhash_sketches(..., use_udf=True)`` — production: one Arrow/NumPy
  bit-vote kernel per batch (functions/simhash.simhash_kernel).
* ``use_udf=False`` — declarative: explode (token × bit) and aggregate
  votes relationally.  Exact same integers; this is the form mirrored by
  the DuckDB oracle SQL.

Pair generation: band the sketch (bits_per_band-sized slices as bucket
keys — Hamming-LSH), self-join, exact ``bit_count(xor)`` filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lsh_rs_spark.config import SimHashConfig
from lsh_rs_spark.functions.hashing import shingle_id
from lsh_rs_spark.functions.simhash import band_expr, hamming, make_simhash_udf


def token_hashes(docs: DataFrame, cfg: SimHashConfig, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tok_hashes ARRAY<BIGINT>) — whitespace tokens, empties dropped,
    duplicates preserved (SimHash weights by term frequency)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    return (
        docs.where(F.col("text").isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.transform(toks, lambda t: shingle_id(t, cfg.hash_family)).alias(
                "tok_hashes"
            ),
        )
        .where(F.size("tok_hashes") > 0)
    )


def simhash_sketches(
    docs: DataFrame, cfg: SimHashConfig, id_col: str = "doc_id", use_udf: bool = True,
    use_arrow: bool = True,
) -> DataFrame:
    """(doc_id, simhash BIGINT).

    ``use_udf=True`` runs the NumPy bit-vote kernel; with ``use_arrow``
    (default) it is fed via ``mapInArrow`` reading the token-hash
    ListArray buffers zero-copy — bit-identical sketches, no per-row
    ndarray materialization."""
    th = token_hashes(docs, cfg, id_col)
    if use_udf and use_arrow:
        from lsh_rs_spark.functions.simhash import make_simhash_arrow_fn

        return th.mapInArrow(make_simhash_arrow_fn(cfg), "doc_id long, simhash long")
    if use_udf:
        return th.select("doc_id", make_simhash_udf(cfg)("tok_hashes").alias("simhash"))
    # Declarative twin: explode token hashes × bit positions, sum ±1 votes.
    votes = (
        th.select("doc_id", F.explode("tok_hashes").alias("h"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(cfg.n_bits - 1))).alias("j"),
            F.col("h"),
        )
        .withColumn("vote", F.expr("(shiftright(h, j) & 1) * 2 - 1"))
        .groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("s"))
    )
    return (
        votes.withColumn(
            "bit",
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)"))
            .otherwise(F.lit(0).cast("long")),
        )
        .groupBy("doc_id")
        .agg(F.sum("bit").cast("long").alias("simhash"))
    )


def simhash_candidate_pairs(
    sketches: DataFrame, cfg: SimHashConfig, max_bucket_size: int = 10_000
) -> DataFrame:
    """Hamming-LSH banding: pairs agreeing on >= 1 band.

    One scan (struct-array explode) + one shuffle (pairs_from_buckets)."""
    from lsh_rs_spark.functions.simhash import sketch_bands
    from lsh_rs_spark.operators.lsh import pairs_from_buckets

    bands = sketch_bands(
        sketches, "simhash", "doc_id", cfg.bands, cfg.bits_per_band, "doc_id"
    )
    return pairs_from_buckets(
        bands, ["band_idx", "band_key"], max_bucket_size, id_col="doc_id"
    )


def simhash_near_dup_pairs(
    docs: DataFrame, cfg: SimHashConfig, id_col: str = "doc_id", use_udf: bool = True
) -> DataFrame:
    """Full SimHash near-dup path: sketch → band pairs → Hamming filter.

    The sketch table is referenced three times (banding + both join sides)
    — persist it so the sketch UDF runs once, not 3×.  On a cluster the
    pipeline's StageStore checkpoint plays this role; inside one query the
    in-memory persist is the right lever.
    """
    sk = simhash_sketches(docs, cfg, id_col, use_udf=use_udf).persist()
    pairs = simhash_candidate_pairs(sk, cfg)
    skb = sk  # corpus-sized: no broadcast hint, AQE decides
    return (
        pairs
        .join(skb.select(F.col("doc_id").alias("src"), F.col("simhash").alias("h_src")), "src")
        .join(skb.select(F.col("doc_id").alias("dst"), F.col("simhash").alias("h_dst")), "dst")
        .withColumn("hamming", hamming("h_src", "h_dst").cast("int"))
        .where(F.col("hamming") <= cfg.hamming_threshold)
        .select("src", "dst", "hamming")
    )
