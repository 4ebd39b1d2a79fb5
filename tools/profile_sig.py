"""Micro-profile of the signature stage: shingling vs minhash UDF vs persist."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from lsh_rs_spark.config import PIPELINE_CONFIG  # noqa: E402
from lsh_rs_spark.functions.minhash import make_minhash_udf  # noqa: E402
from lsh_rs_spark.functions.shingles import shingle_ids_col  # noqa: E402
from lsh_rs_spark.sources.webpages import synth_webpages, with_doc_ids  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("PROFILE_PAGES", "50000"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-sig")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PIPELINE_CONFIG

    def timed(name, fn):
        t0 = time.time()
        fn()
        print(f"{name:32s} {time.time() - t0:8.3f}s", flush=True)

    docs = with_doc_ids(synth_webpages(spark, N_PAGES, partitions=CPUS * 2)).persist()
    timed("materialize_pages", docs.count)

    sh = docs.where(F.col("text").isNotNull()).select(
        "doc_id", shingle_ids_col(cfg).alias("shingles")
    )
    # run twice: first run includes codegen+worker spinup
    timed("shingles_only_run1", lambda: sh.select(F.sum(F.size("shingles"))).collect())
    timed("shingles_only_run2", lambda: sh.select(F.sum(F.size("shingles"))).collect())

    sig = sh.withColumn("minhash", make_minhash_udf(cfg)("shingles"))
    timed("shingles+minhash_run1", lambda: sig.select(F.sum(F.size("minhash"))).collect())
    timed("shingles+minhash_run2", lambda: sig.select(F.sum(F.size("minhash"))).collect())

    p = sig.persist()
    timed("persist_materialize", p.count)
    timed("read_from_cache", p.count)
    spark.stop()


if __name__ == "__main__":
    main()
