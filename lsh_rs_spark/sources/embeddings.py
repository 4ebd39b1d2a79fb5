"""Deterministic synthetic embedding corpus with planted near-dup twins.

The embedding sibling of ``sources/webpages.py``: pure Column expressions
from ``spark.range`` — Box-Muller gaussians whose entropy source is
xxhash64 of (seed, vec_id, component), so the corpus is identical at any
parallelism or cluster size.  ``twin_rate`` of the base vectors get a
near-duplicate twin (base + noise·gaussian, cosine ≈ 0.95 at the default
noise) — the planted structure that makes ANN recall a meaningful metric
(recall@k against unstructured random vectors measures nothing: the "true"
top-k are arbitrary cos≈0.4 strangers).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

_M = (1 << 31) - 1


def _unif(tag: str, seed: int, id_expr, i) -> "F.Column":
    """U(0,1] from a hash of (tag, seed, id, i) — never 0 (log-safe)."""
    h = F.xxhash64(F.concat(F.lit(f"{tag}:{seed}:"), id_expr.cast("string"), F.lit(":"), i.cast("string")))
    return (F.pmod(h, F.lit(_M)) + 1).cast("double") / F.lit(float(_M + 1))


def _gauss(tag: str, seed: int, id_expr, i) -> "F.Column":
    """Box-Muller: z = sqrt(-2 ln u1) * cos(2π u2)."""
    u1 = _unif(tag + ".u1", seed, id_expr, i)
    u2 = _unif(tag + ".u2", seed, id_expr, i)
    return F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    twin_rate: float = 0.1,
    noise: float = 0.3,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """(vec_id, embedding ARRAY<FLOAT>, is_twin, twin_of) — base vectors are
    iid standard gaussians; twins are base + noise·gaussian with
    vec_id = base_id + n_vecs (cos(base, twin) ≈ 1/√(1+noise²) ≈ 0.96 at
    the default).
    """
    base = spark.range(
        0, n_vecs, 1, partitions or spark.sparkContext.defaultParallelism
    ).select(F.col("id").alias("vec_id"))

    def vec(tag: str, id_expr):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: _gauss(tag, seed, id_expr, i).cast("float"),
        )

    originals = base.select(
        "vec_id",
        vec("base", F.col("vec_id")).alias("embedding"),
        F.lit(False).alias("is_twin"),
        F.lit(None).cast("long").alias("twin_of"),
    )
    twin_sel = base.where(
        F.pmod(F.xxhash64(F.concat(F.lit(f"tw:{seed}:"), "vec_id")), F.lit(10_000))
        < int(twin_rate * 10_000)
    )
    # two selects: aliasing "vec_id" first and then referencing it in the
    # same list would hit lateral-column-alias resolution (the new alias
    # shadows the input column and the twin would correlate with id+n_vecs)
    twins = twin_sel.select(
        F.col("vec_id").alias("base_id"),
        F.zip_with(
            vec("base", F.col("vec_id")),
            vec("noise", F.col("vec_id")),
            lambda b, z: (b + F.lit(noise) * z).cast("float"),
        ).alias("embedding"),
    ).select(
        (F.col("base_id") + n_vecs).alias("vec_id"),
        "embedding",
        F.lit(True).alias("is_twin"),
        F.col("base_id").alias("twin_of"),
    )
    return originals.unionByName(twins)
