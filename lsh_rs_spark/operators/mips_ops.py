"""MIPS (maximum inner product search) operators — P3 + A5.

Reference lifecycle (`lsh-rs/src/hash.rs:137-237`, Python surface ``LshMips``
`lsh-py/src/lib.rs:440-485`): ``fit`` the max norm → ``tranform_put`` the
corpus into L2 hash tables → ``transform_query`` + probe → exact re-rank.

Spark shape: the fit is one agg (driver scalar, broadcast as literal); both
transforms are Column expressions (or one NumPy batch kernel on the
production path); bucket probing is the same band-key equi-join as every
other family; the exact re-rank scores the ORIGINAL vectors' inner product
so the asymmetric approximation never changes the final order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, StringType

from lsh_rs_spark.config import MIPSConfig
from lsh_rs_spark.functions.l2 import l2_hash_batch, l2_hash_col, l2_params
from lsh_rs_spark.functions.mips import (
    inner_product_col,
    mips_fit,
    mips_transform_put_col,
    mips_transform_query_col,
)


def make_mips_bands_udf(cfg: MIPSConfig, M: float, side: str):
    """Production path: transform + L2-hash one Arrow batch in NumPy.

    side='put' → tranform_put semantics; side='query' → transform_query.
    Returns ARRAY<STRING> of 'table:h1-h2-…' band keys (same contract as
    functions/l2.make_l2_bands_udf).
    """
    A, b = l2_params(cfg.n_tables, cfg.k_hash, cfg.hash_dim, cfg.r, cfg.seed)
    U, m, dim, r = cfg.U, cfg.m, cfg.dim, cfg.r
    n_tables = cfg.n_tables

    @F.pandas_udf(ArrayType(StringType()))
    def mips_bands(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        if side == "put":
            scaled = X / M * U
            ns = (scaled * scaled).sum(axis=1, keepdims=True)
            tail = np.concatenate(
                [ns ** i for i in range(1, m + 1)], axis=1
            )
        else:
            norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
            scaled = X / norms
            tail = np.full((X.shape[0], m), 0.5)
        T = np.concatenate([scaled, tail], axis=1)
        H = l2_hash_batch(T, A, b, r)  # (n, L, K)
        out = []
        for row in H:
            # same key text as l2_hash_col's concat_ws('-', t, parts)
            out.append(
                [
                    "-".join([str(t)] + [str(int(x)) for x in row[t]])
                    for t in range(n_tables)
                ]
            )
        return pd.Series(out)

    return mips_bands


def mips_band_table(
    emb: DataFrame,
    cfg: MIPSConfig,
    M: float,
    side: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_alias: str = "vec_id",
    use_udf: bool = True,
) -> DataFrame:
    """(<id_alias>, band_key STRING) bucket table after the MIPS transform.

    use_udf=False → pure Column expressions (oracle-parity path; identical
    keys to the NumPy kernel — same doubles, same floor)."""
    if use_udf:
        keys = make_mips_bands_udf(cfg, M, side)(vec_col)
        return emb.select(F.col(id_col).alias(id_alias), keys.alias("keys")).select(
            id_alias, F.explode("keys").alias("band_key")
        )
    tv = (
        mips_transform_put_col(vec_col, M, cfg.U, cfg.m, cfg.dim)
        if side == "put"
        else mips_transform_query_col(vec_col, cfg.m, cfg.dim)
    )
    # Materialize the transformed vector behind a shuffle barrier before
    # hashing: without it every element_at() inside the hash fold re-derives
    # the whole transform expression (interpreted higher-order functions →
    # O(dim² · keys) per row).  One tiny shuffle vs ~100× eval blowup.
    base = emb.select(F.col(id_col).alias(id_alias), tv.alias("_tv")).repartition(
        F.col(id_alias)
    )
    keys = l2_hash_col("_tv", cfg.n_tables, cfg.k_hash, cfg.hash_dim, cfg.r, cfg.seed)
    return base.select(id_alias, keys.alias("keys")).select(
        id_alias, F.explode("keys").alias("band_key")
    )


def mips_topk(
    queries: DataFrame,
    corpus: DataFrame,
    cfg: MIPSConfig,
    k: int,
    M: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_udf: bool = True,
    broadcast_probes: bool | None = None,
) -> DataFrame:
    """Full MIPS predict: fit → asymmetric bucket probe → exact dot re-rank.

    Returns (query_id, neighbor_id, dot, rank).  The probe-side broadcast
    is adaptive (same policy as operators/topk.py): hinted when the
    exploded probe keys stay bounded, else AQE plans the join — so the
    corpus bucket table never shuffles in the common small-query case and
    a corpus-scale query side cannot OOM executors.
    """
    if M is None:
        M = mips_fit(corpus, vec_col, cfg.dim)
    put = mips_band_table(corpus, cfg, M, "put", id_col, vec_col, "neighbor_id", use_udf)
    probe = mips_band_table(queries, cfg, M, "query", id_col, vec_col, "query_id", use_udf)
    if use_udf:
        # production path: hash the 'table:h1-…' strings to 8-byte BIGINT
        # keys in the producing stage — the probe join never moves strings
        from lsh_rs_spark.functions.l2 import compact_band_keys

        put, probe = compact_band_keys(put), compact_band_keys(probe)
    from lsh_rs_spark.operators.topk import resolve_probe_broadcast

    if resolve_probe_broadcast(queries, cfg.n_tables, broadcast_probes):
        probe = F.broadcast(probe)
    cand = (
        probe
        .join(put, "band_key")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
            "query_id",
        )
        .join(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
            "neighbor_id",
        )
        .withColumn("dot", inner_product_col("qv", "cv", cfg.dim))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def mips_brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact max-inner-product top-k (the recall oracle for mips_topk)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", inner_product_col("qv", "cv", dim))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )
