"""Repro: the round-start DuckDB twin of `substring_spans` is
nondeterministic under DuckDB's threaded execution (discovered during
round-7 verification; the SQL text is frozen by the measurement rules, so
this documents the latent risk instead of fixing it).

Mechanism: `spans0` can contain DUPLICATE (doc_id, s, e) rows (the same
span reached from two k-gram diagonals via UNION ALL).  The `flagged`
window (computes new_i) and the `islands` window (running-sums new_i) are
evaluated independently with ORDER BY (s, e) — a non-total order for the
duplicated rows — so the two evaluations can disagree about which
duplicate is "first": one duplicate carries new_i=1, and if the islands
sort places the new_i=0 twin first, the two twins land in DIFFERENT
islands and the final GROUP BY emits the same (doc_id, span_start,
span_end) row twice.  The Spark side is deterministic and set-identical;
only the duplicate rowcount differs.

Precondition (duplicate spans0 rows) and observed behavior on the pinned
testdata:
  sf0.001: 3 duplicated spans0 keys -> rowcount flips 45/46 across runs
           (46 = one duplicated output row).
  sf0.01 (the driver's gate SF): 1 duplicated spans0 key, but 25/25 local
           runs and six rounds of driver artifacts all read 47 — the
           schedule that splits the tie has never been observed at this
           size.

Usage: python tools/span_oracle_flake.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import sys
from collections import Counter

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from lsh_rs_spark import oracle as O  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sql = O.q_substring_spans(min_match=48, k_gram=16)
    pre = sql.split(",\nflagged AS")[0] + (
        "\nSELECT doc_id, s, e, COUNT(*) c FROM spans0 "
        "GROUP BY doc_id, s, e HAVING COUNT(*)>1"
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    print("duplicate spans0 keys:", con.sql(pre).fetchall())
    counts = Counter()
    for _ in range(n):
        rows = [tuple(r) for r in con.sql(sql).fetchall()]
        dups = {k: v for k, v in Counter(rows).items() if v > 1}
        counts[(len(rows), tuple(sorted(dups)))] += 1
    for (cnt, dups), seen in sorted(counts.items()):
        print(f"rowcount={cnt} duplicated_rows={list(dups)}: {seen}/{n} runs")


if __name__ == "__main__":
    main()
