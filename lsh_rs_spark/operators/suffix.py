"""Exact substring dedup via winnowing anchors + per-group suffix arrays.

Not in the reference (SURVEY.md §2.11) — from published work on exact
substring deduplication of web corpora (Lee et al. 2021) and document
fingerprinting (winnowing, Schleimer/Wilkerson/Aiken SIGMOD 2003).

Finds document pairs sharing a verbatim substring of length >= ``min_match``:

1. **Winnowing anchors** (Spark Column expressions, JVM-side): hash every
   ``k_gram``-char gram; in every window of ``w = min_match - k_gram + 1``
   consecutive grams select the leftmost minimal hash.  Any shared run of
   length >= min_match contains at least one *identical, fully-inside*
   window in both documents, whose minimum gram is selected by both — a
   deterministic, alignment-free rendezvous (the winnowing guarantee).
2. Each selected anchor emits a bounded **snippet** (±``snippet_radius``
   chars) — documents are never replicated wholesale.
3. Snippets group by anchor hash; inside each group a NumPy suffix array
   over the concatenated snippets finds the longest cross-document common
   substrings (reported ``match_len`` is capped at the snippet width).
4. Pairs aggregate with max(match_len); hot anchors above
   ``max_group_docs`` are dropped (explicit skew guard, same policy as the
   MinHash bucket cap).

Shuffle volume is O(docs × len/w × snippet) — bounded and tunable, no
all-pairs term.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

_OUT_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("match_len", LongType()),
    ]
)


def _suffix_array_bytes(data: bytes) -> np.ndarray:
    """Suffix array via prefix-doubling (pure NumPy, O(n log² n))."""
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
    texts = [t.encode("utf-8", "ignore") for t in pdf["snippet"]]
    ids = pdf["doc_id"].to_numpy()
    blob = b"\x00".join(texts) + b"\x00"
    starts = np.zeros(len(texts), dtype=np.int64)
    pos = 0
    owner_of = np.zeros(len(blob), dtype=np.int64)
    for i, t in enumerate(texts):
        starts[i] = pos
        owner_of[pos : pos + len(t) + 1] = i
        pos += len(t) + 1
    sa = _suffix_array_bytes(blob)
    out: dict[tuple[int, int], int] = {}
    cap = 1 << 20

    def emit(oi: int, oj: int, l: int) -> None:
        a, b = int(ids[oi]), int(ids[oj])
        if a == b:
            return
        if a > b:
            a, b = b, a
        if out.get((a, b), 0) < l:
            out[(a, b)] = l

    # adjacent LCP array, then maximal intervals with lcp >= min_match:
    # ALL owners inside an interval pairwise share a run >= the interval
    # minimum (adjacent-only scanning misses non-adjacent pairs when a
    # third copy interleaves between them in suffix order).
    lcp = [
        _lcp_len(blob, int(sa[x]), int(sa[x + 1]), cap)
        for x in range(len(sa) - 1)
    ]
    x = 0
    n_l = len(lcp)
    while x < n_l:
        if lcp[x] < min_match:
            x += 1
            continue
        start = x
        interval_min = lcp[x]
        owners = {int(owner_of[int(sa[x])]), int(owner_of[int(sa[x + 1])])}
        while x + 1 < n_l and lcp[x + 1] >= min_match:
            x += 1
            interval_min = min(interval_min, lcp[x])
            owners.add(int(owner_of[int(sa[x + 1])]))
        # exact value for adjacent pairs, conservative interval-min for rest
        for y in range(start, x + 1):
            emit(int(owner_of[int(sa[y])]), int(owner_of[int(sa[y + 1])]), lcp[y])
        ol = sorted(owners)
        for ii in range(len(ol)):
            for jj in range(ii + 1, len(ol)):
                emit(ol[ii], ol[jj], interval_min)
        x += 1
    if not out:
        return pd.DataFrame({"src": [], "dst": [], "match_len": []}).astype("int64")
    return pd.DataFrame(
        [(k[0], k[1], v) for k, v in out.items()],
        columns=["src", "dst", "match_len"],
    )


def winnowing_anchors(
    docs: DataFrame,
    min_match: int,
    k_gram: int,
    snippet_radius: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, anchor BIGINT, snippet STRING) — winnowing-selected grams.

    All Column expressions: gram hashing via xxhash64, windowed leftmost-min
    selection, bounded substring extraction.
    """
    w = min_match - k_gram + 1
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).where(
        F.col("text").isNotNull() & (F.length("text") >= min_match)
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - (k_gram - 1)),
        lambda i: F.xxhash64(F.substring(F.col("text"), i, k_gram)),
    )
    d = d.withColumn("g", grams)
    n_windows = F.greatest(F.lit(1), F.size("g") - (w - 1))
    sel_pos = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_position(
                F.slice("g", i, w), F.array_min(F.slice("g", i, w))
            ).cast("int")
            + i.cast("int")
            - 1,
        )
    )
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(sel_pos).alias("pos"),
        )
        .select(
            "doc_id",
            F.expr("xxhash64(substring(text, pos, {k}))".format(k=k_gram)).alias("anchor"),
            F.substring(
                "text",
                F.greatest(F.lit(1), F.col("pos") - snippet_radius),
                F.lit(2 * snippet_radius),
            ).alias("snippet"),
        )
    )


def substring_dup_pairs(
    docs: DataFrame,
    min_match: int = 64,
    k_gram: int = 24,
    snippet_radius: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group_docs: int = 200,
) -> DataFrame:
    """(src, dst, match_len): pairs sharing a verbatim run >= min_match.

    Detection is deterministic for runs in [min_match, 2*snippet_radius];
    longer runs are reported with match_len capped near 2*snippet_radius.
    Hot anchors (> max_group_docs docs) are dropped — counted via
    ``hot_anchor_count`` if needed by the caller.
    """
    if k_gram >= min_match:
        raise ValueError("k_gram must be < min_match")
    anchors = winnowing_anchors(
        docs, min_match, k_gram, snippet_radius, id_col, text_col
    )
    grouped = (
        anchors.groupBy("anchor")
        .agg(F.collect_list(F.struct("doc_id", "snippet")).alias("members"))
        .where((F.size("members") >= 2) & (F.size("members") <= max_group_docs))
        .select("anchor", F.explode("members").alias("m"))
        .select("anchor", F.col("m.doc_id").alias("doc_id"), F.col("m.snippet").alias("snippet"))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _find_pairs_in_group(pdf.drop_duplicates("doc_id"), min_match)

    pairs = grouped.groupBy("anchor").applyInPandas(fn, schema=_OUT_SCHEMA)
    return pairs.groupBy("src", "dst").agg(F.max("match_len").alias("match_len"))


def hot_anchor_count(docs: DataFrame, min_match: int = 64, k_gram: int = 24,
                     snippet_radius: int = 128, max_group_docs: int = 200) -> int:
    """Skew counter: number of anchors dropped by the group cap."""
    anchors = winnowing_anchors(docs, min_match, k_gram, snippet_radius)
    return (
        anchors.groupBy("anchor")
        .agg(F.countDistinct("doc_id").alias("n"))
        .where(F.col("n") > max_group_docs)
        .count()
    )
