"""Isolate minhash-UDF cost: partitioning sweep + pure-numpy bound."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from lsh_rs_spark.config import PIPELINE_CONFIG  # noqa: E402
from lsh_rs_spark.functions.minhash import make_minhash_udf, oph_kernel  # noqa: E402
from lsh_rs_spark.functions.hashing import minhash_params  # noqa: E402
from lsh_rs_spark.functions.shingles import shingle_ids_col  # noqa: E402
from lsh_rs_spark.sources.webpages import synth_webpages, with_doc_ids  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("PROFILE_PAGES", "50000"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-udf")
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
    udf = make_minhash_udf(cfg)

    docs = with_doc_ids(synth_webpages(spark, N_PAGES, partitions=CPUS * 2))
    sh = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", shingle_ids_col(cfg).alias("shingles"))
        .persist()
    )
    n = sh.count()
    print(f"rows={n} partitions={sh.rdd.getNumPartitions()}", flush=True)

    def timed(name, fn):
        t0 = time.time()
        fn()
        print(f"{name:40s} {time.time() - t0:8.3f}s", flush=True)

    for reps in (None, 32, 8):
        df = sh if reps is None else sh.repartition(reps).persist()
        if reps is not None:
            df.count()
        label = f"udf_parts_{reps or 'orig'}"
        t = df.withColumn("mh", udf("shingles"))
        timed(label + "_run1", lambda: t.select(F.sum(F.size("mh"))).collect())
        timed(label + "_run2", lambda: t.select(F.sum(F.size("mh"))).collect())

    # pure numpy bound on the driver
    pdf = sh.toPandas()
    lens = pdf["shingles"].map(len).to_numpy(dtype=np.int64)
    offsets = np.zeros(lens.shape[0], dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["shingles"]])
    a, b = minhash_params(cfg.num_perm, cfg.seed)
    t0 = time.time()
    oph_kernel(offsets, flat, cfg.num_perm, int(a[0]), int(b[0]))
    print(f"pure_numpy_oph_single_thread              {time.time() - t0:8.3f}s")
    t0 = time.time()
    flat2 = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["shingles"]])
    print(f"list_to_numpy_concat (driver, 1 thread)   {time.time() - t0:8.3f}s  elems={flat2.shape[0]}")
    spark.stop()


if __name__ == "__main__":
    main()
