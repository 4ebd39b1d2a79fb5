"""Deterministic, engine-portable corpus splitting and sampling.

A training-data pipeline needs doc-level train/val/test assignment that is
(1) stable across runs, partitionings and cluster sizes, (2) independent of
row order (``df.sample``/``rand()`` are neither), and (3) reproducible by
OTHER engines auditing the corpus.  The standard construction: hash the
document key with a seed, take a bucket in [0, BUCKETS), cut the bucket
space at the cumulative-fraction boundaries.

Uses the md5_64 oracle-parity family (`functions/hashing.py`), so the
DuckDB twin assigns byte-identical splits — gated like every operator
(driver gate ``hash_split_assignments``).  Membership of a doc is decided
by (key, seed) alone: growing the corpus never reshuffles existing docs'
splits (the property that keeps eval sets uncontaminated across crawls).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lsh_rs_spark.functions.hashing import md5_64, md5_64_sql

#: bucket-space resolution: fractions are honored to 1e-6
BUCKETS = 1_000_000


def split_bucket(key: Column | str, seed: int = 42) -> Column:
    """Deterministic bucket in [0, BUCKETS) from (key, seed).

    md5_64 output is a nonnegative 60-bit BIGINT, so ``%`` and ``pmod``
    agree (the round-4 '%' trap only bites signed hashes)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(md5_64(F.concat(c.cast("string"), F.lit(f":{seed}"))),
                  F.lit(BUCKETS))


def split_bucket_sql(key_expr: str, seed: int = 42) -> str:
    """DuckDB fragment computing the same bucket as :func:`split_bucket`."""
    keyed = f"CAST({key_expr} AS VARCHAR) || ':{seed}'"
    return f"{md5_64_sql(keyed)} % {BUCKETS}"


def _boundaries(fractions: dict[str, float]) -> list[tuple[str, int]]:
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    if any(v <= 0 for v in fractions.values()):
        raise ValueError("every fraction must be > 0")
    out, cum = [], 0.0
    for name, frac in fractions.items():  # dict order = caller's order
        cum += frac
        out.append((name, int(round(cum * BUCKETS))))
    out[-1] = (out[-1][0], BUCKETS)  # absorb float residue: total coverage
    return out


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split-label column.

    ``fractions`` e.g. ``{"train": 0.98, "val": 0.01, "test": 0.01}`` —
    must sum to 1; every row gets exactly one label.  Pure Column
    expression (no shuffle, no RNG state): the assignment survives
    repartitioning, resume, and engine changes.
    """
    b = split_bucket(key_col, seed)
    expr = None
    for name, hi in _boundaries(fractions):
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def hash_split_sql(
    key_expr: str, fractions: dict[str, float], seed: int = 42
) -> str:
    """DuckDB CASE fragment labeling rows identically to :func:`hash_split`."""
    b = split_bucket_sql(key_expr, seed)
    arms = " ".join(
        f"WHEN ({b}) < {hi} THEN '{name}'"
        for name, hi in _boundaries(fractions)
    )
    return f"CASE {arms} END"


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic ~``rate`` subsample: keep rows whose bucket falls below
    ``rate * BUCKETS``.  Unlike ``DataFrame.sample`` the result is a pure
    filter — stable row set for a given (key, seed), pushdown-friendly,
    and the SAME docs stay sampled when the corpus grows."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    return df.where(split_bucket(key_col, seed) < int(round(rate * BUCKETS)))


def split_leakage(
    labels: DataFrame, splits: DataFrame, split_col: str = "split"
) -> DataFrame:
    """Eval-contamination report: duplicate clusters whose members straddle
    split boundaries.

    Hash splits are assigned per DOCUMENT, but near-duplicates are the
    same CONTENT — if one copy lands in train and another in test, the
    eval is contaminated (the canonical published failure this pipeline
    exists to prevent; the fix is dedup-then-split, or split by
    cluster_id instead of doc_id).  ``labels`` = (doc_id, cluster_id)
    from the dedup pipeline, ``splits`` = (doc_id, split) from
    :func:`hash_split`.  Returns one row per offending cluster:
    (cluster_id, n_docs, n_splits, splits_csv) — splits_csv sorted CSV so
    the row is engine-hashable.  Plan: one join + one partial-aggregable
    groupBy; empty result == certified-clean corpus.
    """
    j = labels.join(splits.select("doc_id", split_col), "doc_id")
    return (
        j.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_set(split_col)).alias("_s"),
        )
        .where(F.size("_s") >= 2)
        .select(
            "cluster_id",
            "n_docs",
            F.size("_s").cast("long").alias("n_splits"),
            F.array_join("_s", ",").alias("splits_csv"),
        )
    )


def cluster_safe_split(
    labels: DataFrame,
    fractions: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Leak-free split assignment: hash the CLUSTER id, not the doc id.

    Every member of a duplicate cluster lands in the same split by
    construction, so :func:`split_leakage` over the result is empty —
    the dedup-then-split recipe as one operator.  ``labels`` =
    (doc_id, cluster_id) with singletons included
    (`components.with_singletons`).  Returns (doc_id, cluster_id, split).
    Same md5-bucket determinism contract as :func:`hash_split`: stable
    under repartitioning, corpus growth and engine changes.
    """
    b = split_bucket("cluster_id", seed)
    expr = None
    for name, hi in _boundaries(fractions):
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return labels.select("doc_id", "cluster_id", expr.alias(split_col))
