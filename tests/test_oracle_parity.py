"""Continuous guard for the driver-contract parity: a fast subset of the
__spark_entry__ queries compared against their DuckDB oracles at sf0.001.
(The full 23-query sweep lives in tools/check_oracle.py.)"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tools.check_oracle import TABLES, norm_rows  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

FAST = [
    "lsh_buckets",
    "edges_jaccard",
    "dup_components",
    "dup_clusters",
    "simhash_pairs",
    "knn_text_topk",
    "doc_fingerprints",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, con, name):
    df = E.queries()[name](spark, SF_DIR)
    s_cols, s_rows = df.columns, [tuple(r) for r in df.collect()]
    res = con.sql(E.oracle_sql()[name])
    d_cols, d_rows = res.columns, res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    _, sn = norm_rows(s_cols, s_rows)
    _, dn = norm_rows(d_cols, d_rows)
    assert sn == dn
