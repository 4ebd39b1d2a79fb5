"""North-star packaging check: the dedup pipeline ships as a
``spark-submit --py-files`` job (tools/submit_job.sh) and produces the same
keep-list as the in-process API."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_pipeline_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from lsh_rs_spark.sources.webpages import synth_webpages, with_doc_ids

    pages = with_doc_ids(synth_webpages(spark, 400, partitions=4))
    inp = str(tmp_path / "pages.parquet")
    pages.write.parquet(inp)
    workdir = str(tmp_path / "run")

    out = subprocess.run(
        [os.path.join(REPO, "tools", "submit_job.sh"), inp, workdir, "local[4]"],
        capture_output=True,
        text=True,
        timeout=420,
        check=True,
    ).stdout
    result = json.loads(out.strip().splitlines()[-1])
    assert result["dropped_near_dups"] > 0

    # the submitted job and the in-process pipeline agree exactly
    keep = spark.read.parquet(f"{workdir}/keep_list")
    dropped = keep.where(~F.col("is_representative")).count()
    assert dropped == result["dropped_near_dups"]

    # per-stage manifests committed (resumability evidence)
    metrics = json.load(open(f"{workdir}/_RUN_METRICS.json"))
    assert {"exact_groups", "signatures", "buckets", "candidate_pairs",
            "edges", "components", "keep_list"} <= set(metrics)
    assert metrics["summary"]["docs_per_sec"] > 0
