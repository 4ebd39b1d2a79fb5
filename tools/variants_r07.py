"""Round-7 warm A/B microbench for dedup-chain operator variants.

Each variant runs `reps` times after one untimed warm run; median reported.
Result identity asserted per variant (count + checksum).

Usage: python tools/variants_r07.py [n_pages]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession, functions as F  # noqa: E402

from lsh_rs_spark.config import PIPELINE_CONFIG  # noqa: E402
from lsh_rs_spark.operators import dedup as DD  # noqa: E402
from lsh_rs_spark.operators import lsh as L  # noqa: E402
from lsh_rs_spark.sources.webpages import synth_webpages, with_doc_ids  # noqa: E402
from lsh_rs_spark.tuning import suggest_shuffle_partitions  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 55980
REPS = 5


def exact_dup_edges_current(docs):
    return DD.exact_dup_edges(docs)


def exact_dup_edges_onescan(docs, id_col="doc_id", text_col="text"):
    """One scan + one exchange: repartition by the text hash, then both the
    group aggregate and the member join read the SAME exchange output."""
    h = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.sha2(F.col(text_col).cast("binary"), 256).alias("_th"),
        )
        .repartition(F.col("_th"))
    )
    reps = (
        h.groupBy("_th")
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("_n"))
        .where(F.col("_n") >= 2)
        .select("_th", "rep_id")
    )
    return (
        h.join(reps, "_th")
        .where(F.col("doc_id") != F.col("rep_id"))
        .select("rep_id", "doc_id")
    )


def exact_dup_edges_window(docs, id_col="doc_id", text_col="text"):
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(text_col).cast("binary"), 256))
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.min(id_col).over(w).alias("rep_id"),
            F.count("*").over(w).alias("_n"),
        )
        .where((F.col("_n") >= 2) & (F.col("doc_id") != F.col("rep_id")))
        .select("rep_id", "doc_id")
    )


def sig_pandas(docs, cfg):
    return L.signatures(docs, cfg)


def sig_maparrow(docs, cfg):
    return L.signatures(docs, cfg, use_arrow=True)


def sig_arrow_udf(docs, cfg):
    """arrow_udf variant: same OPH kernel fed/returned as Arrow arrays."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf
    from pyspark.sql.types import ArrayType, LongType

    from lsh_rs_spark.functions.hashing import minhash_params
    from lsh_rs_spark.functions.minhash import minhash_kernel, oph_kernel
    from lsh_rs_spark.functions.shingles import word_hash_shingle_ids

    a, b = minhash_params(cfg.num_perm, cfg.seed)
    a0, b0 = int(a[0]), int(b[0])
    mode = cfg.minhash_mode
    k = cfg.num_perm

    from lsh_rs_spark.functions.arrow_batch import fixed_width_list, list_segments

    def _mh(sids):
        if isinstance(sids, pa.ChunkedArray):
            sids = sids.combine_chunks()
        starts, flat = list_segments(sids)
        if mode == "oph":
            sig = oph_kernel(starts, flat, k, a0, b0)
        else:
            sig = minhash_kernel(starts, flat, a, b)
        return fixed_width_list(sig)

    # postponed annotations (module-level future import) stringify hints and
    # break infer_eval_type — set real objects explicitly
    _mh.__annotations__ = {"sids": pa.Array, "return": pa.Array}
    mh = arrow_udf(_mh, ArrayType(LongType()))

    sh = word_hash_shingle_ids(docs, cfg)
    return sh.withColumn("minhash", mh("shingles"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("variants-r07")
        .config("spark.sql.shuffle.partitions",
                str(suggest_shuffle_partitions(N_PAGES * 10, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PIPELINE_CONFIG
    pages = with_doc_ids(synth_webpages(spark, N_PAGES, partitions=CPUS)).persist()
    pages.count()
    out = {"n_pages": N_PAGES, "loadavg": os.getloadavg()[0]}

    only = set(sys.argv[2:])

    def run(name, fn, check):
        if only and name not in only:
            return
        secs, chk = [], None
        fn().count()  # warm (JIT + workers)
        for _ in range(REPS):
            t0 = time.time()
            chk = check(fn())
            secs.append(round(time.time() - t0, 3))
        out[name] = {"median": sorted(secs)[REPS // 2], "runs": secs, "chk": chk}
        print(name, out[name], flush=True)

    def chk_edges(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("rep_id", "doc_id")).alias("x"),
        ).first()
        return [r["n"], r["x"]]

    def chk_sig(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(F.col("minhash").cast("string"))).alias("x"),
            F.bit_xor(F.xxhash64(F.col("shingles").cast("string"))).alias("y"),
        ).first()
        return [r["n"], r["x"], r["y"]]

    run("exact_current", lambda: exact_dup_edges_current(pages), chk_edges)
    run("exact_onescan", lambda: exact_dup_edges_onescan(pages), chk_edges)
    run("exact_window", lambda: exact_dup_edges_window(pages), chk_edges)
    run("sig_pandas", lambda: sig_pandas(pages, cfg), chk_sig)
    run("sig_maparrow", lambda: sig_maparrow(pages, cfg), chk_sig)
    run("sig_arrow_udf", lambda: sig_arrow_udf(pages, cfg), chk_sig)

    ok_exact = out["exact_current"]["chk"] == out["exact_onescan"]["chk"] == out["exact_window"]["chk"]
    ok_sig = out["sig_pandas"]["chk"] == out["sig_maparrow"]["chk"] == out["sig_arrow_udf"]["chk"]
    out["identical"] = {"exact": ok_exact, "sig": ok_sig}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
