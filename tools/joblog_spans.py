"""Event-log attribution for the span-cleaning path (bench 2a'/2c).

Usage: python tools/joblog_spans.py [n_pages]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from lsh_rs_spark.operators import suffix as SX  # noqa: E402
from lsh_rs_spark.sources.webpages import synth_webpages, with_doc_ids  # noqa: E402
from lsh_rs_spark.tuning import suggest_shuffle_partitions  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 55980
LOG_DIR = "/tmp/spark-events-spans"


def main():
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("joblog-spans")
        .config("spark.sql.shuffle.partitions",
                str(suggest_shuffle_partitions(N_PAGES * 10, CPUS)))
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
    pages = with_doc_ids(synth_webpages(spark, N_PAGES, partitions=CPUS)).persist()
    pages.count()
    t0 = time.time()
    sc.setJobDescription("spans")
    spans = SX.substring_dup_spans(
        pages, min_match=48, k_gram=16, snippet_radius=64
    ).persist()
    n_spans = spans.count()
    t1 = time.time()
    sc.setJobDescription("strip")
    SX.strip_spans(pages, spans).count()
    t2 = time.time()
    print(json.dumps({"n_pages": N_PAGES, "spans_secs": round(t1 - t0, 3),
                      "strip_secs": round(t2 - t1, 3), "n_spans": n_spans}))
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
                    "tasks": si["Number of Tasks"],
                    "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                }
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j or j["desc"] not in ("spans", "strip"):
            continue
        st = " | ".join(
            f"s{sid}:{stages[sid]['tasks']}t/{stages[sid]['ms']}ms"
            for sid in sorted(j["stages"])
            if sid in stages and stages[sid]["ms"] > 200
        )
        print(f"job{jid:3d} {j['desc']:6s} dur={(j['t1']-j['t0'])/1000:8.3f} {st}")


if __name__ == "__main__":
    main()
