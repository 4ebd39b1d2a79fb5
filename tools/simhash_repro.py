"""Isolated repro of the bench `simhash_pairs_documents` query (judge r6
item 2): 5 runs in one session, same config/session settings as bench.py,
prints one JSON line. Run from a repo checkout root (HEAD or the round-4
worktree) so the checkout's own lsh_rs_spark is imported.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession  # noqa: E402

from lsh_rs_spark.config import SimHashConfig  # noqa: E402
from lsh_rs_spark.operators import simhash_ops as SH  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "12g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
docs.count()

secs, n_pairs = [], None
for i in range(5):
    spark.catalog.clearCache()
    t0 = time.time()
    n_pairs = SH.simhash_near_dup_pairs(
        docs, SimHashConfig(n_bits=48, bands=6, hamming_threshold=4)
    ).count()
    secs.append(round(time.time() - t0, 3))
print("RESULT " + json.dumps({
    "checkout": os.getcwd(),
    "runs": secs,
    "median": sorted(secs)[2],
    "min": min(secs),
    "n_pairs": n_pairs,
}))
spark.stop()
