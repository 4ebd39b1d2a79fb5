"""Incremental signature ingest via Structured Streaming.

The reference supports incremental point updates (`store_vec`
`lsh-rs/src/lsh/lsh.rs:434-445`, `update_by_idx` `:453-462`) on top of its
batch bulk load; the north rule's pipeline is batch spark-submit
(SURVEY.md §2.8), so streaming here is the *ingest* analogue: newly crawled
pages land as parquet files, a file-source stream signs and bands them
exactly like the batch path (same broadcast hash parameters → identical
signatures), and appends to the bucket store.  Because MinHash signatures
are per-document, no watermark/stateful operator is required for ingest;
late data simply appends.

``stream_dedup_flags`` additionally shows the stateful side: a
``dropDuplicates`` on exact content hash with a processing-time watermark —
streaming exact-dedup of the incoming page stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lsh_rs_spark.config import DedupConfig
from lsh_rs_spark.operators.lsh import explode_bands, signatures

PAGE_DDL = (
    "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"
)


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(PAGE_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .withColumn("doc_id", F.xxhash64("url"))
    )


def stream_signatures(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Streaming docs → (doc_id, shingles, minhash): stateless map, same
    kernels as batch (signatures() is trigger-agnostic)."""
    return signatures(pages, cfg)


def stream_buckets(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    return explode_bands(stream_signatures(pages, cfg), cfg)


def stream_exact_dedup(pages: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: first occurrence of each text hash wins.

    Uses dropDuplicatesWithinWatermark so state is bounded by the watermark
    horizon (at web scale: content hash state ~16B/doc/horizon).
    """
    hashed = pages.withColumn("content_hash", F.xxhash64("text")).withColumn(
        "event_ts", F.coalesce(F.col("warc_ts"), F.current_timestamp())
    )
    return hashed.withWatermark("event_ts", delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def start_bucket_sink(
    buckets: DataFrame, out_path: str, checkpoint: str, trigger_available_now: bool = True
):
    """Append band/bucket rows to parquet with exactly-once file-sink
    semantics (checkpointed offsets — the streaming counterpart of the
    batch StageStore commit)."""
    w = (
        buckets.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
