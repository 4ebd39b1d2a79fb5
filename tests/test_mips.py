"""MIPS family (P3 + A5): fit, asymmetric transform, bucket parity, recall.

Reference semantics: `lsh-rs/src/hash.rs:137-237` (fit :163-173,
tranform_put :175-192, transform_query :194-208) and the `LshMips`
surface (`lsh-py/src/lib.rs:440-485`).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_rs_spark.config import MIPSConfig
from lsh_rs_spark.functions.mips import (
    mips_fit,
    mips_transform_put_col,
    mips_transform_query_col,
    norm_sq_col,
)
from lsh_rs_spark.operators.mips_ops import (
    mips_band_table,
    mips_brute_force_topk,
    mips_multiprobe_candidates,
    mips_store_multiprobe_candidates,
    mips_topk,
)

SF_DIR = "/root/testdata/sf0.001"
CFG = MIPSConfig()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def test_mips_fit_is_max_norm(spark, emb):
    M = mips_fit(emb, "embedding", CFG.dim)
    rows = emb.select("embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    expected = float(np.sqrt((X * X).sum(axis=1)).max())
    assert M == pytest.approx(expected, rel=1e-12)


def test_transform_put_semantics(spark, emb):
    """hash.rs:175-192 — scaled norm < U, tail = norm_sq^i of the scaled vec."""
    M = mips_fit(emb, "embedding", CFG.dim)
    tv = emb.select(
        "vec_id",
        mips_transform_put_col("embedding", M, CFG.U, CFG.m, CFG.dim).alias("tv"),
        F.col("embedding"),
    ).limit(20).collect()
    for r in tv:
        t = np.array(r["tv"])
        assert t.shape[0] == CFG.dim + CFG.m
        head, tail = t[: CFG.dim], t[CFG.dim :]
        x = np.array(r["embedding"], dtype=np.float64)
        np.testing.assert_allclose(head, x / M * CFG.U, rtol=1e-12)
        ns = float((head * head).sum())
        assert np.sqrt(ns) <= CFG.U + 1e-9
        np.testing.assert_allclose(
            tail, [ns ** i for i in range(1, CFG.m + 1)], rtol=1e-9
        )


def test_transform_query_semantics(spark, emb):
    """hash.rs:194-208 — unit-norm head, 0.5 tail."""
    tv = emb.select(
        mips_transform_query_col("embedding", CFG.m, CFG.dim).alias("tv")
    ).limit(20).collect()
    for r in tv:
        t = np.array(r["tv"])
        head, tail = t[: CFG.dim], t[CFG.dim :]
        assert np.sqrt((head * head).sum()) == pytest.approx(1.0, rel=1e-9)
        assert (tail == 0.5).all()


def test_bands_udf_matches_column_path(spark, emb):
    """Production NumPy kernel vs Column-expression oracle path.

    The kernel sums with one BLAS matmul (pairwise order) while the Column
    fold is sequential — identical keys everywhere except exactly on a
    floor() bucket boundary, which has measure ~0; assert equality and
    tolerate nothing (seeded data, fixed params → deterministic)."""
    M = mips_fit(emb, "embedding", CFG.dim)
    a = mips_band_table(emb, CFG, M, "put", use_udf=True)
    b = mips_band_table(emb, CFG, M, "put", use_udf=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    qa = mips_band_table(emb, CFG, M, "query", use_udf=True)
    qb = mips_band_table(emb, CFG, M, "query", use_udf=False)
    assert qa.exceptAll(qb).count() == 0 and qb.exceptAll(qa).count() == 0


def test_mips_topk_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") % 20 == 0)
    k = 5
    approx = mips_topk(queries, emb, CFG, k).select("query_id", "neighbor_id")
    exact = mips_brute_force_topk(queries, emb, k, CFG.dim).select(
        "query_id", "neighbor_id"
    )
    hit = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    assert total > 0
    recall = hit / total
    assert recall >= 0.8, f"MIPS recall {recall:.2f} < 0.8"


def test_mips_multiprobe_paths_agree_and_monotone(spark, emb):
    """M2 × P3: the NumPy heap enumeration (production) and the relational
    Column-path enumeration (oracle twin shape) yield the SAME candidate
    set, and the set grows monotonically with the probe budget from the
    budget-0 base (= plain mips bucket candidates)."""
    queries = emb.where(F.col("vec_id") % 20 == 0)

    def pairs(df):
        return {(r["query_id"], r["doc_id"]) for r in df.collect()}

    prev = None
    for budget in (0, 2, 4):
        a = pairs(
            mips_multiprobe_candidates(queries, emb, CFG, budget, use_udf=True)
        )
        b = pairs(
            mips_multiprobe_candidates(queries, emb, CFG, budget, use_udf=False)
        )
        assert a == b, f"path divergence at budget={budget}"
        if prev is not None:
            assert prev <= a, f"budget {budget} lost base candidates"
        prev = a
    assert len(prev) > 0


def test_mips_store_multiprobe_paths_agree_and_monotone(spark, emb):
    """Store-side dual: NumPy and relational Column paths agree; the set
    grows monotonically with budget; budget-0 equals the query-side
    budget-0 base (both degenerate to the plain bucket join)."""
    queries = emb.where(F.col("vec_id") % 20 == 0)

    def pairs(df):
        return {(r["query_id"], r["doc_id"]) for r in df.collect()}

    base_q = pairs(
        mips_multiprobe_candidates(queries, emb, CFG, 0, use_udf=True)
    )
    prev = None
    for budget in (0, 3):
        a = pairs(mips_store_multiprobe_candidates(
            queries, emb, CFG, budget, use_udf=True))
        b = pairs(mips_store_multiprobe_candidates(
            queries, emb, CFG, budget, use_udf=False))
        assert a == b, f"path divergence at budget={budget}"
        if budget == 0:
            assert a == base_q
        if prev is not None:
            assert prev <= a
        prev = a
    assert len(prev) > 0


def test_mips_topk_orders_by_inner_product(spark, emb):
    queries = emb.where(F.col("vec_id") % 50 == 0)
    rows = mips_topk(queries, emb, CFG, 5).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["dot"]))
    for q, pairs in by_q.items():
        pairs.sort()
        dots = [d for _, d in pairs]
        assert dots == sorted(dots, reverse=True)
