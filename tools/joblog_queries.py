"""Event-log job attribution for the non-dedup headline queries.

Runs each query once untimed (JIT/worker warm), then once timed with job
descriptions set; parses the event log into per-job wall times.

Usage: python tools/joblog_queries.py [simhash|ann|substring ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from lsh_rs_spark.config import ORACLE_SRP, SimHashConfig  # noqa: E402
from lsh_rs_spark.operators import ann as ANN  # noqa: E402
from lsh_rs_spark.operators import simhash_ops as SH  # noqa: E402
from lsh_rs_spark.operators import suffix as SX  # noqa: E402
from lsh_rs_spark.tuning import suggest_shuffle_partitions  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOG_DIR = "/tmp/spark-events-queries"


def main():
    which = sys.argv[1:] or ["simhash", "ann", "substring"]
    os.makedirs(LOG_DIR, exist_ok=True)
    import shutil

    shutil.rmtree(LOG_DIR)
    os.makedirs(LOG_DIR)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("joblog-queries")
        .config("spark.sql.shuffle.partitions",
                str(suggest_shuffle_partitions(559800, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", LOG_DIR)
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    walls = {}

    def q_simhash():
        return SH.simhash_near_dup_pairs(
            docs, SimHashConfig(n_bits=48, bands=6, hamming_threshold=4)
        ).count()

    def q_ann():
        qq = emb.where(F.col("vec_id") % 100 == 0)
        return ANN.ann_topk(qq, emb, ORACLE_SRP, k=10).count()

    def q_substring():
        return SX.substring_dup_pairs(docs, min_match=48, k_gram=16).count()

    fns = {"simhash": q_simhash, "ann": q_ann, "substring": q_substring}
    for name in which:
        fn = fns[name]
        sc.setJobDescription(f"warm:{name}")
        fn()
        spark.catalog.clearCache()
        sc.setJobDescription(f"timed:{name}")
        t0 = time.time()
        n = fn()
        walls[name] = [round(time.time() - t0, 3), n]
    spark.stop()

    jobs, stages = {}, {}
    logfiles = []
    for root, _d, files in os.walk(LOG_DIR):
        logfiles += [os.path.join(root, f) for f in files if "events" in f]
    for fp in logfiles:
        for line in open(fp):
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:45],
                    "tasks": si["Number of Tasks"],
                    "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                }
    print(json.dumps({"walls": walls}))
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j or not j["desc"].startswith("timed"):
            continue
        st = " | ".join(
            f"s{sid}:{stages[sid]['tasks']}t/{stages[sid]['ms']}ms {stages[sid]['name'][:38]}"
            for sid in sorted(j["stages"]) if sid in stages
        )
        print(f"job{jid:3d} {j['desc'][:18]:18s} dur={(j['t1']-j['t0'])/1000:7.3f} {st}")


if __name__ == "__main__":
    main()
