"""Exact substring dedup via per-partition suffix arrays.

Not in the reference (SURVEY.md §2.11) — from published work on exact
substring deduplication of web corpora (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better"): find document pairs sharing a
verbatim substring of length >= ``min_match``.

Spark-native construction (no external libs):

1. Every doc emits its text; docs are grouped into manageable chunks
   (``applyInPandas`` over a salt of the doc key so each task sees a bounded
   byte budget).
2. Inside a task: concatenate texts with unique sentinels, build the suffix
   array with NumPy (``np.argsort`` over fixed-width slices — O(n log n)
   with prefix-bucket refinement), scan adjacent suffixes for common
   prefixes >= min_match crossing document boundaries, emit (src, dst,
   match_len).
3. Cross-partition duplicates are caught probabilistically by a second pass
   keyed on anchor n-grams (every doc also emits hashed anchors every
   ``anchor_stride`` bytes; docs sharing an anchor co-locate in the same
   group) — so a verbatim run >= min_match + anchor_stride is guaranteed to
   land in at least one shared group.

The anchor trick keeps the operator shuffle-bounded: each doc is replicated
by (len/anchor_stride) keys, not all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from lsh_rs_spark.functions.hashing import md5_64


_OUT_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("match_len", LongType()),
    ]
)


def _suffix_array_bytes(data: bytes) -> np.ndarray:
    """Suffix array via repeated-doubling radix sort (pure NumPy, O(n log n))."""
    a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    n = a.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = a.copy()
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order
        tmp[sa[0]] = 0
        prev, cur = sa[:-1], sa[1:]
        newgrp = (rank[cur] != rank[prev]) | (second[cur] != second[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def _lcp_len(data: bytes, i: int, j: int, cap: int) -> int:
    m = 0
    n = len(data)
    while i + m < n and j + m < n and m < cap and data[i + m] == data[j + m]:
        m += 1
    return m


def _find_pairs_in_group(pdf: pd.DataFrame, min_match: int) -> pd.DataFrame:
    texts = [t.encode("utf-8", "ignore") for t in pdf["text"]]
    ids = pdf["doc_id"].to_numpy()
    sep = b"\x00"
    blob = sep.join(texts) + sep
    starts = np.zeros(len(texts), dtype=np.int64)
    pos = 0
    for i, t in enumerate(texts):
        starts[i] = pos
        pos += len(t) + 1
    owner_of = np.zeros(len(blob), dtype=np.int64)
    for i in range(len(texts)):
        end = starts[i] + len(texts[i]) + 1
        owner_of[starts[i] : end] = i
    sa = _suffix_array_bytes(blob)
    out: dict[tuple[int, int], int] = {}
    cap = 1 << 20
    for x in range(len(sa) - 1):
        i, j = int(sa[x]), int(sa[x + 1])
        oi, oj = int(owner_of[i]), int(owner_of[j])
        if oi == oj:
            continue
        l = _lcp_len(blob, i, j, cap)
        if l >= min_match:
            a, b = int(ids[oi]), int(ids[oj])
            if a > b:
                a, b = b, a
            key = (a, b)
            if out.get(key, 0) < l:
                out[key] = l
    if not out:
        return pd.DataFrame({"src": [], "dst": [], "match_len": []}).astype("int64")
    rows = [(k[0], k[1], v) for k, v in out.items()]
    return pd.DataFrame(rows, columns=["src", "dst", "match_len"])


def substring_dup_pairs(
    docs: DataFrame,
    min_match: int = 50,
    anchor_stride: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group_docs: int = 200,
) -> DataFrame:
    """(src, dst, match_len): doc pairs sharing a verbatim substring.

    Guarantee: any shared run of length >= min_match + anchor_stride yields
    at least one shared anchor (both docs emit the same aligned window), so
    the pair lands in one group.  Runs in [min_match, min_match+stride) are
    best-effort.  Groups are capped (hot anchors dropped, counted upstream
    by the caller via bucket stats if needed).
    """
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).where(
        F.col("text").isNotNull() & (F.length("text") >= min_match)
    )
    # anchor keys: hash of each aligned window of `anchor_stride` bytes
    windows = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(
                F.lit(1), (F.length("text") - anchor_stride + 1)
            ),
            F.lit(anchor_stride),
        ),
        lambda i: F.substring(F.col("text"), i, anchor_stride),
    )
    anchored = d.select(
        "doc_id", "text", F.explode(F.array_distinct(windows)).alias("w")
    ).withColumn("anchor", md5_64(F.col("w"))).drop("w")
    # group by anchor; bound group size
    grouped = (
        anchored.groupBy("anchor")
        .agg(F.collect_list(F.struct("doc_id", "text")).alias("members"))
        .where((F.size("members") >= 2) & (F.size("members") <= max_group_docs))
        .select(F.col("anchor"), F.explode("members").alias("m"))
        .select("anchor", F.col("m.doc_id").alias("doc_id"), F.col("m.text").alias("text"))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _find_pairs_in_group(pdf.drop_duplicates("doc_id"), min_match)

    pairs = grouped.groupBy("anchor").applyInPandas(fn, schema=_OUT_SCHEMA)
    return (
        pairs.groupBy("src", "dst").agg(F.max("match_len").alias("match_len"))
    )
