"""Vector dataset sources/sinks (reference §2.1 scans).

* CSV scan (S4): ≙ `read_csv` `floky-bin/src/main.rs:16-36` — parse f32 CSV
  rows into vectors.  Schema is explicit (dim known up front, like the
  reference's `dim` constructor arg); the scan stays JVM-side and Catalyst
  prunes unused columns.
* Point lookups / range scans (S6, S7): ≙ `select_vec_by_row_ids` /
  `select_row_id` (`examples/reverse-img-search/src/{utils,query}.rs`).
* Delete / update (SO3, SO4): ≙ `delete_vec` / `update_by_idx`
  (`lsh-rs/src/lsh/lsh.rs:453-462,532-541`) — expressed as anti-join /
  union-overwrite producing a NEW bucket table (append-only storage; the
  relational form of the reference's in-place mutation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import FloatType, StructField, StructType


def read_vector_csv(
    spark: SparkSession, path: str, dim: int, header: bool = False
) -> DataFrame:
    """CSV of `dim` float columns → (vec_id BIGINT, embedding ARRAY<FLOAT>).

    vec_id is a content hash of the row (stable across partitionings);
    use `with_sequential_ids` when reference-style chronological u32 ids
    are needed on a SMALL dataset.
    """
    schema = StructType([StructField(f"c{i}", FloatType()) for i in range(dim)])
    raw = spark.read.csv(path, schema=schema, header=header)
    vec = F.array(*[F.col(f"c{i}") for i in range(dim)])
    return raw.select(
        F.xxhash64(F.concat_ws(",", *[F.col(f"c{i}") for i in range(dim)])).alias("vec_id"),
        vec.alias("embedding"),
    )


def select_by_id_range(df: DataFrame, lo: int, hi: int, id_col: str = "vec_id") -> DataFrame:
    """Range scan (S6): predicate pushes down to the parquet scan."""
    return df.where(F.col(id_col).between(lo, hi))


def select_by_ids(df: DataFrame, ids: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Point-lookup set (S7): left-semi join against the id list."""
    return df.join(ids.select(F.col(ids.columns[0]).alias(id_col)), id_col, "left_semi")


def delete_vectors(buckets: DataFrame, ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """SO3: remove ids from the bucket table (vectors stay in the store,
    exactly the reference's delete semantics `mem.rs:58-68`)."""
    return buckets.join(
        ids.select(F.col(ids.columns[0]).alias(id_col)), id_col, "left_anti"
    )


def upsert_vectors(
    buckets: DataFrame, new_buckets: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """SO4 (`update_by_idx`): delete+insert — rows for updated ids are
    replaced by their re-hashed bucket rows."""
    ids = new_buckets.select(id_col).distinct()
    return delete_vectors(buckets, ids, id_col).unionByName(new_buckets)
