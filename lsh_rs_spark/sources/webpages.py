"""Deterministic synthetic Common-Crawl-style web-page corpus.

Input-hint shape: (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
lang STRING).  Generated entirely with Spark Column expressions from
``spark.range`` — no driver-side data, no RNG on executors (xxhash64 of the
row id is the entropy source), so the corpus is identical at any
parallelism, partitioning, or cluster size.  That property is what lets the
N-vs-4N scaling benchmark run the *same* job on the *same* input.

Planted structure (all ratios config-pinned):
* ``dup_rate`` of pages get a near-duplicate twin: same word stream with
  ~1/``mutate_every`` words replaced → word-3-shingle Jaccard ≈ 0.85-0.97.
* ``exact_dup_rate`` get a byte-identical twin (exact dedup coverage).
* a small boilerplate set shares one template text (hot-bucket generator —
  exercises the skew guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: deterministic vocabulary (100 words) — content words for synthetic pages
VOCAB = [
    f"w{i:03d}" for i in range(80)
] + ["the", "and", "data", "spark", "table", "query", "batch", "stream",
     "index", "merge", "sort", "join", "hash", "scan", "filter", "window",
     "page", "crawl", "web", "dedup"]


def _word_at(seed_expr, vocab_arr):
    return F.element_at(vocab_arr, (F.pmod(F.xxhash64(seed_expr), F.lit(len(VOCAB)))).cast("int") + 1)


def synth_webpages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    min_words: int = 40,
    max_words: int = 200,
    dup_rate: float = 0.1,
    exact_dup_rate: float = 0.02,
    boilerplate_rate: float = 0.01,
    mutate_every: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """Corpus of ~n_pages * (1 + dup_rate + exact_dup_rate) rows."""
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    span = max_words - min_words

    base = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    base = base.select(F.col("id").alias("page_id"))

    n_words = (
        F.pmod(F.xxhash64(F.concat(F.lit(f"len:{seed}:"), "page_id")), F.lit(span))
        + min_words
    ).cast("int")

    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: _word_at(
            F.concat(F.lit(f"w:{seed}:"), F.col("page_id"), F.lit(":"), i), vocab_arr
        ),
    )
    base = base.withColumn("words", words)

    # boilerplate pages: overwrite with a shared template (hot bucket)
    is_boiler = (
        F.pmod(F.xxhash64(F.concat(F.lit(f"boiler:{seed}:"), "page_id")), F.lit(10_000))
        < int(boilerplate_rate * 10_000)
    )
    template = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: _word_at(F.concat(F.lit(f"tmpl:{seed}:"), i), vocab_arr),
    )
    base = base.withColumn("words", F.when(is_boiler, template).otherwise(F.col("words")))

    def page_row(df: DataFrame, id_expr, text_col, kind: str) -> DataFrame:
        url = F.concat(
            F.lit("https://example.com/"),
            F.lower(F.hex(F.xxhash64(F.concat(F.lit(f"host:{seed}:"), id_expr % 1000)))),
            F.lit("/"),
            id_expr.cast("string"),
        )
        ts = F.timestamp_seconds(F.lit(1_600_000_000) + id_expr * 7)
        html = F.encode(
            F.concat(F.lit("<html><body><p>"), text_col, F.lit("</p></body></html>")),
            "utf-8",
        )
        lang = F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            F.pmod(F.xxhash64(F.concat(F.lit(f"lang:{seed}:"), id_expr)), F.lit(6)).cast("int") + 1,
        )
        return df.select(
            url.alias("url"),
            ts.alias("warc_ts"),
            html.alias("html"),
            text_col.alias("text"),
            lang.alias("lang"),
        )

    originals = page_row(
        base, F.col("page_id"), F.concat_ws(" ", "words").alias("text"), "orig"
    )

    # near-dup twins: mutate ~1/mutate_every words
    near_sel = base.where(
        F.pmod(F.xxhash64(F.concat(F.lit(f"nd:{seed}:"), "page_id")), F.lit(10_000))
        < int(dup_rate * 10_000)
    )
    mutated = F.transform(
        F.col("words"),
        lambda w, i: F.when(
            F.pmod(
                F.xxhash64(F.concat(F.lit(f"mut:{seed}:"), F.col("page_id"), F.lit(":"), i)),
                F.lit(mutate_every),
            )
            == 0,
            _word_at(F.concat(F.lit(f"repl:{seed}:"), F.col("page_id"), F.lit(":"), i), vocab_arr),
        ).otherwise(w),
    )
    near_dups = page_row(
        near_sel.withColumn("words", mutated),
        F.col("page_id") + n_pages,
        F.concat_ws(" ", "words").alias("text"),
        "neardup",
    )

    # exact twins
    exact_sel = base.where(
        F.pmod(F.xxhash64(F.concat(F.lit(f"xd:{seed}:"), "page_id")), F.lit(10_000))
        < int(exact_dup_rate * 10_000)
    )
    exact_dups = page_row(
        exact_sel,
        F.col("page_id") + 2 * n_pages,
        F.concat_ws(" ", "words").alias("text"),
        "exactdup",
    )

    return originals.unionByName(near_dups).unionByName(exact_dups)


def with_doc_ids(pages: DataFrame) -> DataFrame:
    """Stable content-derived key: doc_id = xxhash64(url) — reproducible
    across partitionings, unlike monotonically_increasing_id (SURVEY §1.1)."""
    return pages.withColumn("doc_id", F.xxhash64("url"))
