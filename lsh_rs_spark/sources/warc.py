"""WARC source: Common-Crawl-style web archives → the input-hint page table.

Reads raw ``.warc`` / ``.warc.gz`` files (the north rule's Common-Crawl
shape) into ``(url, warc_ts, html BINARY, text STRING, lang)`` — the exact
Iceberg-table schema of BASELINE.json's ``input_hint``.  The reference has
no web front end (it consumes prepared vectors); this is the ingestion edge
the 100 TB pipeline needs in front of `plans/pipeline.py`.

Design notes:
* Spark plumbing: `binaryFile` source → `mapInPandas` record parser (one
  Arrow batch of whole archives in, a stream of page rows out).  WARC files
  at CC scale are ~1 GB each and gzipped per record — a real deployment
  points the same reader at `warc.paths` file listings; parallelism comes
  from many files, exactly like Spark's text sources.
* **Determinism contract** (input_hint: "byte-identical extracted text per
  url"): `extract_text` is a pure function of the html bytes — fixed
  regexes, stdlib entity unescape, pinned whitespace collapse — so every
  run, partitioning, and cluster size extracts identical bytes.  The
  invariant is asserted in tests (same doc via different file layouts).
* gzip: `gzip` stdlib decodes concatenated members (CC's per-record
  compression) in one pass.
"""

from __future__ import annotations

import gzip
import html as _html
import io
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Pinned HTML→text: drop script/style/comments, strip tags, unescape
    entities, collapse whitespace.  Pure function of the input bytes —
    the per-url byte-identical-text invariant holds by construction."""
    if not html_bytes:
        return ""
    b = _SCRIPT_RE.sub(b" ", html_bytes)
    b = _COMMENT_RE.sub(b" ", b)
    b = _TAG_RE.sub(b" ", b)
    s = b.decode("utf-8", "ignore")
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def iter_warc_records(payload: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, block) per WARC record from a raw or gzipped archive.

    Handles WARC/1.0 and 1.1 framing: header lines to a blank line, then
    exactly Content-Length block bytes, then the \\r\\n\\r\\n record
    separator.  Gzipped archives (including CC's concatenated per-record
    members) are decompressed up front.
    """
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.GzipFile(fileobj=io.BytesIO(payload)).read()
    pos = 0
    n = len(payload)
    while pos < n:
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = payload[pos:head_end].decode("utf-8", "ignore")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        block_start = head_end + 4
        block = payload[block_start : block_start + length]
        yield headers, block
        pos = block_start + length
        # consume the record separator (tolerate a missing trailing one)
        while payload[pos : pos + 2] == b"\r\n":
            pos += 2


def http_payload(block: bytes) -> bytes:
    """WARC response blocks carry an HTTP message; return its body.
    Raw-html blocks (no HTTP status line) pass through unchanged."""
    if block[:5] in (b"HTTP/", b"http/"):
        sep = block.find(b"\r\n\r\n")
        if sep >= 0:
            return block[sep + 4 :]
    return block


def read_warc(
    spark: SparkSession, path: str, glob: str = "*.warc*", lang: str | None = None
) -> DataFrame:
    """Directory of .warc/.warc.gz files → input-hint page DataFrame.

    One task per archive file (binaryFile splits at file granularity —
    WARC is not block-splittable without an index, same as on a real
    cluster); records explode inside `mapInPandas`.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for payload in pdf["content"]:
                for headers, block in iter_warc_records(bytes(payload)):
                    if headers.get("warc-type") != "response":
                        continue
                    body = http_payload(block)
                    rows["url"].append(headers.get("warc-target-uri"))
                    ts = headers.get("warc-date")
                    rows["warc_ts"].append(pd.Timestamp(ts) if ts else None)
                    rows["html"].append(body)
                    rows["text"].append(extract_text(body))
                    rows["lang"].append(lang)
            pdf_out = pd.DataFrame(rows)
            if len(pdf_out) and pdf_out["warc_ts"].notna().any():
                # Spark TimestampType wants tz-naive; WARC-Date is UTC
                pdf_out["warc_ts"] = (
                    pd.to_datetime(pdf_out["warc_ts"], utc=True)
                    .dt.tz_convert("UTC")
                    .dt.tz_localize(None)
                )
            yield pdf_out

    return raw.mapInPandas(parse, schema=PAGES_SCHEMA)


def write_warc(pages: list[dict], gzipped: bool = False) -> bytes:
    """Serialize page dicts (url, warc_ts iso-string, html bytes) into one
    WARC archive — the test fixture generator (CC-style framing)."""
    out = io.BytesIO()
    for p in pages:
        block = p["html"]
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {p['url']}\r\n"
            f"WARC-Date: {p['warc_ts']}\r\n"
            f"Content-Length: {len(block)}\r\n"
            "\r\n"
        ).encode()
        rec = head + block + b"\r\n\r\n"
        out.write(gzip.compress(rec) if gzipped else rec)
    return out.getvalue()
