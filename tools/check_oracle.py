"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares
row count, column names (sorted), and exact values (rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def float_close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b)) or (
            math.isnan(a) and math.isnan(b)
        )
    return a == b


def compare(name, spark_df, con, sql):
    t0 = time.time()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    t_spark = time.time() - t0
    t0 = time.time()
    res = con.sql(sql)
    d_cols = res.columns
    d_rows = res.fetchall()
    t_duck = time.time() - t0
    problems = []
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if not problems:
        _, sn = norm_rows(s_cols, s_rows)
        _, dn = norm_rows(d_cols, d_rows)
        n_bad = 0
        first_bad = None
        exact = True
        for a, b in zip(sn, dn):
            if a != b:
                exact = False
                if all(float_close(x, y) for x, y in zip(a, b)):
                    continue
                n_bad += 1
                if first_bad is None:
                    first_bad = (a, b)
        if n_bad:
            problems.append(f"{n_bad} mismatched rows; first: {first_bad}")
        elif not exact:
            problems.append("FLOAT-ONLY diffs (within 1e-12) — driver hash may differ!")
    status = "OK" if not problems else "MISMATCH"
    print(
        f"{status:9s} {name:28s} rows={len(s_rows):6d} "
        f"spark={t_spark:5.1f}s duck={t_duck:4.1f}s"
        + (f"  {'; '.join(problems)}" if problems else "")
    )
    return not problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    cores = os.environ.get("SPARK_CHECK_CORES", "8")
    parts = os.environ.get("SPARK_CHECK_PARTITIONS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    ok = bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"ROWS-ONLY {name:28s} rows={n:6d}")
                continue
            if compare(name, df, con, oracles[name]):
                ok += 1
            else:
                bad += 1
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERROR     {name:28s} {type(e).__name__}: {str(e)[:400]}")
    print(f"\n{ok} ok, {bad} mismatched/errored")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
