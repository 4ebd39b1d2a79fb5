"""WARC source: framing, gzip members, HTTP bodies, and the input-hint
invariant — byte-identical extracted text per url across file layouts."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from lsh_rs_spark.sources import warc as W
from lsh_rs_spark.sources.webpages import synth_webpages


@pytest.fixture(scope="module")
def pages(spark):
    rows = synth_webpages(spark, 40, partitions=2).collect()
    return [
        {
            "url": r.url,
            "warc_ts": r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "html": bytes(r.html),
            "text": r.text,
        }
        for r in rows
    ]


def test_record_framing_and_http_body(pages):
    raw = W.write_warc(pages[:5])
    recs = list(W.iter_warc_records(raw))
    assert len(recs) == 5
    for p, (headers, block) in zip(pages[:5], recs):
        assert headers["warc-type"] == "response"
        assert headers["warc-target-uri"] == p["url"]
        assert block == p["html"]
    # HTTP-wrapped block: body extracted after the header separator
    http_block = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + pages[0]["html"]
    assert W.http_payload(http_block) == pages[0]["html"]


def test_gzip_members_roundtrip(pages):
    gz = W.write_warc(pages[:7], gzipped=True)
    assert gz[:2] == b"\x1f\x8b"
    recs = list(W.iter_warc_records(gz))
    assert [h["warc-target-uri"] for h, _ in recs] == [p["url"] for p in pages[:7]]


def test_read_warc_schema_and_text_invariant(spark, tmp_path, pages):
    # two different file layouts of the SAME pages: 1 big archive vs many
    # small gzipped ones — extracted text must be byte-identical per url
    d1, d2 = tmp_path / "a", tmp_path / "b"
    os.makedirs(d1), os.makedirs(d2)
    (d1 / "all.warc").write_bytes(W.write_warc(pages))
    for i in range(0, len(pages), 10):
        (d2 / f"part{i}.warc.gz").write_bytes(
            W.write_warc(pages[i : i + 10], gzipped=True)
        )

    df1 = W.read_warc(spark, str(d1)).persist()
    df2 = W.read_warc(spark, str(d2)).persist()
    assert df1.schema == W.PAGES_SCHEMA
    assert df1.count() == df2.count() == len(pages)

    t1 = {r.url: r.text for r in df1.collect()}
    t2 = {r.url: r.text for r in df2.collect()}
    assert t1 == t2  # byte-identical text per url, layout-independent

    # html payloads survive byte-exact; warc_ts parsed
    h1 = {r.url: bytes(r.html) for r in df1.collect()}
    for p in pages:
        assert h1[p["url"]] == p["html"]
    assert df1.where(F.col("warc_ts").isNull()).count() == 0


def test_extract_text_pinned_semantics():
    html = (
        b"<html><head><script>var x = '<p>no</p>';</script>"
        b"<style>p { color: red }</style></head>"
        b"<body><!-- hidden --><p>Hello &amp; goodbye</p>\n<div>  world </div>"
        b"</body></html>"
    )
    assert W.extract_text(html) == "Hello & goodbye world"
    assert W.extract_text(b"") == ""
    # idempotent + deterministic
    assert W.extract_text(html) == W.extract_text(html)


def test_warc_feeds_dedup_pipeline(spark, tmp_path, pages):
    """End-to-end: WARC → page table → MinHash dedup keep list."""
    from lsh_rs_spark.api import MinHashLSH
    from lsh_rs_spark.config import DedupConfig
    from lsh_rs_spark.sources.webpages import with_doc_ids

    d = tmp_path / "warc"
    os.makedirs(d)
    # plant an exact dup: same html under a second url
    dup = dict(pages[0], url=pages[0]["url"] + "?copy")
    (d / "c.warc").write_bytes(W.write_warc(pages + [dup]))
    docs = with_doc_ids(W.read_warc(spark, str(d)))
    cfg = DedupConfig(num_perm=16, bands=4, rows_per_band=4,
                      hash_family="xxhash64", jaccard_threshold=0.7)
    keep = MinHashLSH(cfg).dedup(docs)
    assert keep.count() == len(pages) + 1
    assert keep.where(~F.col("is_representative")).count() >= 1
