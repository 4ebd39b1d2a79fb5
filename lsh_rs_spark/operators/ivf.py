"""IVF (inverted-file) ANN over dense embeddings — the coarse-quantizer
counterpart to the SRP/LSH bucket path (operators/ann.py).

Public technique (Sivic & Zisserman bag-of-words / FAISS IVF-flat):

1. **Train**: k-means on a bounded driver-side sample (seeded NumPy Lloyd
   iterations — the sample is small by construction; the corpus itself is
   never collected).
2. **Assign**: every vector goes to its nearest centroid — one BLAS matmul
   per Arrow batch against the broadcast (n_lists, dim) codebook.
3. **Query**: probe the ``nprobe`` nearest lists, exact cosine re-rank of
   the candidates, window top-k.

Same plan shape as the LSH path: map-side assignment, one equi-join on
``list_id``, re-rank, window — no all-pairs term; recall is controlled by
``nprobe`` exactly like probe budget in multi-probe LSH.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, IntegerType

from lsh_rs_spark.functions.vectors import cosine_sim, dot, l2_norm


def train_centroids(
    emb: DataFrame,
    n_lists: int,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded Lloyd k-means on a bounded sample. (n_lists, dim) float64."""
    frac = min(1.0, sample_size / max(1, emb.count()))
    sample = emb.select(vec_col).sample(False, frac, seed=seed).collect()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(X.shape[0], size=min(n_lists, X.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on normalized rows
        for j in range(C.shape[0]):
            members = X[assign == j]
            if members.shape[0]:
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def _assign_udf(C: np.ndarray, nprobe: int):
    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return assign


def assign_lists(
    emb: DataFrame, C: np.ndarray, nprobe: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding", id_alias: str = "vec_id",
) -> DataFrame:
    """(id, list_id) — nprobe nearest lists per vector (1 for indexing)."""
    return (
        emb.select(F.col(id_col).alias(id_alias), _assign_udf(C, nprobe)(vec_col).alias("ls"))
        .select(id_alias, F.explode("ls").alias("list_id"))
    )


def seed_codebook(
    emb: DataFrame, mod: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic codebook: the table's own vectors at ``id % mod == 0``
    become the coarse-quantizer centroids (list_id = id).

    A data-defined codebook needs no training pass and — because the seeds
    ARE rows of the registered table — a DuckDB twin reproduces it exactly
    with a WHERE clause: no centroid literals, no BLAS-vs-fold arithmetic
    gap.  This is the oracle-gated IVF variant; the k-means codebook
    (``train_centroids``) is the production recall-tuned one."""
    return emb.where(F.col(id_col) % mod == 0).select(
        F.col(id_col).alias("list_id"), F.col(vec_col).alias("cvec")
    )


def assign_lists_join(
    emb: DataFrame, codebook: DataFrame, nprobe: int,
    id_col: str = "vec_id", vec_col: str = "embedding", id_alias: str = "vec_id",
) -> DataFrame:
    """(id, list_id) — declarative assignment: broadcast codebook cross
    join + sequential-fold cosine + per-vector window top-``nprobe``.

    O(n·n_lists) like the matmul kernel, all JVM/codegen; doubles match
    DuckDB's LIST_SUM fold bit-for-bit (same arithmetic as the gated
    ann/srp twins), ties pinned by list_id ascending."""
    scored = (
        emb.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(codebook))
        .withColumn("sim", cosine_sim("v", "cvec"))
    )
    w = Window.partitionBy(id_alias).orderBy(
        F.col("sim").desc(), F.col("list_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select(id_alias, "list_id")
    )


def _probe_and_rank(
    probes: DataFrame, index: DataFrame, queries: DataFrame, corpus: DataFrame,
    k: int, id_col: str, vec_col: str,
) -> DataFrame:
    cand = (
        probes.join(index, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
                l2_norm(vec_col).alias("qn"),
            ),
            "query_id",
        )
        .join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
                l2_norm(vec_col).alias("cn"),
            ),
            "neighbor_id",
        )
        .withColumn("cos", dot("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _maybe_broadcast_probes(
    probes: DataFrame, queries: DataFrame, nprobe: int,
    broadcast_probes: bool | None,
) -> DataFrame:
    """Adaptive probe-side broadcast (shared topk.py policy): hint only
    when the exploded probe rows stay bounded; a corpus-scale query side
    falls back to an AQE-planned join."""
    from lsh_rs_spark.operators.topk import resolve_probe_broadcast

    if resolve_probe_broadcast(queries, nprobe, broadcast_probes):
        return F.broadcast(probes)
    return probes


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_lists: int = 64,
    nprobe: int = 4,
    k: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_probes: bool | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cos, rank) — IVF-flat approximate top-k
    (k-means codebook, production path)."""
    C = train_centroids(corpus, n_lists, seed=seed, vec_col=vec_col)
    index = assign_lists(corpus, C, 1, id_col, vec_col, id_alias="neighbor_id")
    probes = _maybe_broadcast_probes(
        assign_lists(queries, C, nprobe, id_col, vec_col, id_alias="query_id"),
        queries, nprobe, broadcast_probes,
    )
    return _probe_and_rank(probes, index, queries, corpus, k, id_col, vec_col)


def ivf_topk_seeded(
    queries: DataFrame,
    corpus: DataFrame,
    mod: int = 40,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_probes: bool | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cos, rank) — IVF over the seeded codebook
    (oracle-gated variant: assignment, probing and re-rank all
    DuckDB-reproducible; only the Lloyd training differs from ivf_topk)."""
    cb = seed_codebook(corpus, mod, id_col, vec_col)
    index = assign_lists_join(corpus, cb, 1, id_col, vec_col, id_alias="neighbor_id")
    probes = _maybe_broadcast_probes(
        assign_lists_join(queries, cb, nprobe, id_col, vec_col, id_alias="query_id"),
        queries, nprobe, broadcast_probes,
    )
    return _probe_and_rank(probes, index, queries, corpus, k, id_col, vec_col)
