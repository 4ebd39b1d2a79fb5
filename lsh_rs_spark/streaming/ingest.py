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


def start_incremental_dedup(
    pages: DataFrame,
    cfg: DedupConfig,
    workdir: str,
    trigger_available_now: bool = True,
):
    """Incremental near-dup detection: the reference's `store_vec` + query
    lifecycle (`lsh-rs/src/lsh/lsh.rs:434-445`) as a streaming job.

    Per micro-batch (foreachBatch, so the batch operators are reused
    verbatim):
      1. sign + band the new docs (same broadcast params as batch),
      2. probe the ACCUMULATED bucket store with the new docs' band keys —
         candidate pairs are (new × all-so-far), never all × all,
      3. exact-verify (Jaccard) and append edges to ``{workdir}/edges``,
      4. append the new bucket rows to ``{workdir}/buckets``.

    The bucket store is the growing index (parquet here; Iceberg/Delta on a
    real deployment for snapshot isolation); each batch's shuffle is
    proportional to the batch × its collisions, so a long-running crawl
    ingest stays O(new data) per trigger.  Batch 0 bootstraps the store.
    Exactly-once: the streaming checkpoint replays an incomplete batch;
    edge/bucket appends are idempotently deduped downstream by (src, dst) /
    (band_idx, band_key, doc_id) — same contract as the batch StageStore.
    """
    import os

    from lsh_rs_spark.operators.lsh import pairs_from_buckets
    from lsh_rs_spark.operators.verify import jaccard_edges

    buckets_dir = f"{workdir}/buckets"
    edges_dir = f"{workdir}/edges"
    sig_dir = f"{workdir}/signatures"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sig = signatures(batch_df, cfg).persist()
        new_buckets = explode_bands(sig, cfg).persist()
        have_store = os.path.exists(buckets_dir)
        if have_store:
            store = spark.read.parquet(buckets_dir)
            # hot-bucket guard on the probe side too: a boilerplate bucket
            # that grew past the cap in the store would otherwise fan every
            # colliding new doc out against its whole membership.  (At real
            # scale the size table is maintained incrementally next to the
            # bucket store rather than re-aggregated per batch.)
            hot = (
                store.groupBy("band_idx", "band_key")
                .agg(F.count("*").alias("_n"))
                .where(F.col("_n") > cfg.max_bucket_size)
                .select("band_idx", "band_key")
            )
            store = store.join(hot, ["band_idx", "band_key"], "left_anti")
            # probe: new keys vs stored keys (new×old), plus new×new pairs
            probe = new_buckets.join(
                store, ["band_idx", "band_key"]
            ).select(
                F.col("band_idx"),
                F.col("band_key"),
                new_buckets["doc_id"].alias("src_new"),
                store["doc_id"].alias("dst_old"),
            ).where(F.col("src_new") != F.col("dst_old")).select(
                F.least("src_new", "dst_old").alias("src"),
                F.greatest("src_new", "dst_old").alias("dst"),
            ).distinct()
            intra = pairs_from_buckets(
                new_buckets, ["band_idx", "band_key"], cfg.max_bucket_size
            )
            pairs = probe.unionByName(intra).distinct()
            all_sig = spark.read.parquet(sig_dir).unionByName(
                sig.select("doc_id", "shingles")
            )
        else:
            pairs = pairs_from_buckets(
                new_buckets, ["band_idx", "band_key"], cfg.max_bucket_size
            )
            all_sig = sig
        edges = jaccard_edges(pairs, all_sig, cfg)
        edges.write.mode("append").parquet(edges_dir)
        new_buckets.write.mode("append").parquet(buckets_dir)
        sig.select("doc_id", "shingles").write.mode("append").parquet(sig_dir)
        sig.unpersist()
        new_buckets.unpersist()

    w = pages.writeStream.foreachBatch(process).option(
        "checkpointLocation", f"{workdir}/_checkpoint"
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


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
