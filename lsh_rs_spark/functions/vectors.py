"""Dense-vector math: the reference's distance layer, Spark-side.

Reference: `lsh-rs/src/dist.rs:20-59` (l2_norm, inner_prod, cosine_sim) and
the Python exact re-rank `cdist` (`lsh-py/src/dist.rs:4-24`).

Two tiers:
* Column expressions (`F.zip_with` + `F.aggregate` ordered folds) — JVM-side
  and byte-identical to DuckDB's sequential list kernels, used for oracle
  queries.  IEEE doubles, left-to-right accumulation in both engines.
* NumPy batch kernels inside pandas UDFs — the production path for wide
  fan-out (brute-force / re-rank at scale), BLAS matmul per Arrow batch.

SRP (sign random projections) over embeddings uses Rademacher hyperplanes
derived from the md5_64 family: sign_{j,d} = ±1 from bit parity of
md5("srp:<seed>:<j>:<d>") — a valid SRP per the LSH literature
(Achlioptas-style ±1 projections), and exactly reproducible in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from lsh_rs_spark.functions.hashing import md5_64_py, md5_64_sql


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered-fold dot product in double (matches DuckDB list_dot_product order)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_dist(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


# DuckDB twins (embedding columns cast to DOUBLE[] before the fold)
def dot_sql(a: str, b: str) -> str:
    return (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN({a}) + 1), "
        f"i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)))"
    )


def norm_sql(a: str) -> str:
    return f"SQRT({dot_sql(a, a)})"


def cosine_sim_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)}) / ({norm_sql(a)} * {norm_sql(b)})"


# ---------------------------------------------------------------------------
# SRP over dense embeddings (Rademacher planes from md5 parity)
# ---------------------------------------------------------------------------

def srp_sign(seed: int, j: int, d: int) -> int:
    """±1 hyperplane entry — deterministic, engine-independent."""
    return 1 if md5_64_py(f"srp:{seed}:{j}:{d}") & 1 else -1


def srp_planes(seed: int, n_bits: int, dim: int) -> np.ndarray:
    """(n_bits, dim) ±1 matrix, generated once on the driver."""
    return np.array(
        [[srp_sign(seed, j, d) for d in range(dim)] for j in range(n_bits)],
        dtype=np.float64,
    )


def srp_sketch_col(vec: Column | str, seed: int, n_bits: int, dim: int) -> Column:
    """BIGINT SRP sketch via Column expressions (oracle-parity path).

    bit_j = 1 iff SUM_d sign_{j,d} * v_d > 0  (ties → 0, pinned).
    Signs are inlined as literals, so the plan is pure codegen arithmetic.
    """
    planes = srp_planes(seed, n_bits, dim).astype(np.int64)
    v = _c(vec)
    sketch = F.lit(0).cast("long")

    def _term_fn(row: np.ndarray):
        # closure factory: keeps the transform lambda at arity 1 (element
        # only) — a 2-arg lambda would be treated as (element, index)
        signs = F.array(*[F.lit(int(s)) for s in row])
        return lambda i: (
            F.element_at(signs, i + 1).cast("double")
            * F.element_at(v, i + 1).cast("double")
        )

    for j in range(n_bits):
        terms = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _term_fn(planes[j]))
        proj = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
        sketch = sketch + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sketch


def srp_sketch_sql(vec_expr: str, seed: int, n_bits: int, dim: int) -> str:
    """DuckDB twin of srp_sketch_col (signs inlined identically)."""
    planes = srp_planes(seed, n_bits, dim).astype(np.int64)
    parts = []
    for j in range(n_bits):
        signs = ", ".join(str(int(s)) for s in planes[j])
        proj = (
            f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
            f"i -> CAST(([{signs}])[i] AS DOUBLE) * CAST(({vec_expr})[i] AS DOUBLE)))"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def make_srp_udf(seed: int, n_bits: int, dim: int):
    """Production SRP: one BLAS matmul per Arrow batch."""
    planes = srp_planes(seed, n_bits, dim)  # (n_bits, dim)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf(LongType())
    def srp_udf(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        proj = X @ planes.T  # (n, n_bits)
        return pd.Series(((proj > 0).astype(np.int64) * weights[None, :]).sum(axis=1))

    return srp_udf


def make_cosine_topk_udf(corpus: np.ndarray, corpus_ids: np.ndarray, k: int):
    """Brute-force exact top-k vs a broadcast corpus (production re-rank).

    Returns a pandas UDF: embedding → ARRAY<BIGINT> of the k nearest ids by
    cosine (descending, ties by id ascending).
    """
    norms = np.linalg.norm(corpus, axis=1)
    norms[norms == 0] = 1.0
    C = corpus / norms[:, None]

    @F.pandas_udf(ArrayType(LongType()))
    def topk_udf(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        xn = np.linalg.norm(X, axis=1)
        xn[xn == 0] = 1.0
        sims = (X / xn[:, None]) @ C.T  # (q, n)
        out = []
        for row in sims:
            order = np.lexsort((corpus_ids, -row))[:k]
            out.append(corpus_ids[order])
        return pd.Series(out)

    return topk_udf
