"""Edges/verify-stage plan shootout (judge r6 item 3): time the exact-verify
stage alternatives in isolation on a persisted synthetic corpus, pairs
pre-materialized so ONLY the verify plan differs.

Variants:
  current   — semi-join prune + eager localCheckpoint of the pruned
              signature table, then two join-backs with in-row
              size(array_intersect) (production ``jaccard_edges``)
  nockpt    — same plan without the localCheckpoint (the corpus-sized
              signature scan runs once per join-back side instead)
  bloom     — NO manual prune; Spark's runtime bloom-filter join pruning
              (spark.sql.optimizer.runtime.bloomFilter) is left to inject
              the semi-join filter into the signature scan
  exploded  — the relational explode-on-sid twin (oracle form), for scale
              reference

Usage: python tools/edges_variants.py [n_pages] [cores] [n_runs]
Prints one JSON line; taskset/BLAS/tmpfs methodology identical to
tools/scaling_bench.py so numbers are comparable with the stage profile.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from lsh_rs_spark.config import PIPELINE_CONFIG as cfg
from lsh_rs_spark.operators import lsh as L, verify as V

cores = {cores}
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(cores * {parts_factor}))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.driver.memory", "12g")
    .config("spark.local.dir", "/dev/shm/spark-tmp")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from lsh_rs_spark.sources.webpages import synth_webpages, with_doc_ids
docs = with_doc_ids(synth_webpages(spark, {n_pages}, partitions=cores * 2))
sig = L.signatures(docs, cfg).persist()
sig.count()
pairs = (L.candidate_pairs(L.explode_bands(sig, cfg), cfg)
         .localCheckpoint(eager=True))
n_pairs = pairs.count()


def run_variant(name):
    if name == "current":
        e = V.jaccard_edges(pairs, sig, cfg)
    elif name == "nockpt":
        cand = (pairs.select(F.col("src").alias("doc_id"))
                .unionByName(pairs.select(F.col("dst").alias("doc_id")))
                .distinct())
        pr = sig.select("doc_id", "shingles").join(cand, "doc_id", "left_semi")
        e = (pairs
             .join(pr.select(F.col("doc_id").alias("src"),
                             F.col("shingles").alias("sh_src")), "src")
             .join(pr.select(F.col("doc_id").alias("dst"),
                             F.col("shingles").alias("sh_dst")), "dst")
             .withColumn("n_common",
                         F.size(F.array_intersect("sh_src", "sh_dst"))
                         .cast("long"))
             .withColumn("n_union",
                         (F.size("sh_src") + F.size("sh_dst")).cast("long")
                         - F.col("n_common"))
             .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
             .where(F.col("jaccard") >= cfg.jaccard_threshold)
             .select("src", "dst", "n_common", "n_union", "jaccard"))
    elif name == "bloom":
        sh = sig.select("doc_id", "shingles")
        e = (pairs
             .join(sh.select(F.col("doc_id").alias("src"),
                             F.col("shingles").alias("sh_src")), "src")
             .join(sh.select(F.col("doc_id").alias("dst"),
                             F.col("shingles").alias("sh_dst")), "dst")
             .withColumn("n_common",
                         F.size(F.array_intersect("sh_src", "sh_dst"))
                         .cast("long"))
             .withColumn("n_union",
                         (F.size("sh_src") + F.size("sh_dst")).cast("long")
                         - F.col("n_common"))
             .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
             .where(F.col("jaccard") >= cfg.jaccard_threshold)
             .select("src", "dst", "n_common", "n_union", "jaccard"))
    elif name == "exploded":
        e = V.jaccard_edges_exploded(pairs, sig, cfg)
    t0 = time.time()
    n = e.count()
    return time.time() - t0, n


out = {{"cores": cores, "n_pairs": n_pairs, "variants": {{}}}}
for name in ("current", "nockpt", "bloom", "exploded"):
    walls, n_edges = [], None
    for _ in range({n_runs}):
        spark.catalog.clearCache()
        sig.persist(); sig.count()
        w, n_edges = run_variant(name)
        walls.append(round(w, 2))
    out["variants"][name] = {{"walls": walls, "min": min(walls),
                              "n_edges": n_edges}}
    print(f"{{name}}: {{walls}} n_edges={{n_edges}}", file=sys.stderr)
print("RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 560_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    code = SNIPPET.format(
        repo=REPO, cores=cores, n_pages=n_pages, n_runs=n_runs,
        parts_factor=int(os.environ.get("SCALING_PARTS_FACTOR", "4")),
    )
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        env[var] = "1"
    # executors re-exec python fresh: the repo must be on PYTHONPATH (driver
    # sys.path does not propagate) — otherwise the harness only works when
    # launched from the repo root
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600, check=True, env=env,
    )
    sys.stderr.write(out.stderr[-2000:])
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line[len("RESULT "):])
            return
    raise RuntimeError(f"no RESULT line:\n{out.stdout[-2000:]}")


if __name__ == "__main__":
    main()
