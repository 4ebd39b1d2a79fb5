"""Text → shingle-set front end (absent in the reference, which takes
pre-shingled indicator vectors — "length of the shingles vector",
`lsh-rs/src/lib.rs:81-92`; presence test `lsh-rs/src/hash.rs:284-302`).

We keep the sparse form — the set of shingle *ids* — which is the same
Jaccard estimator over an unbounded vocabulary (no dim-bounded permutation
array needed at web scale).

Everything here is a pure Spark Column expression (JVM-side, whole-stage
codegen; no Python in the hot path).  The `text` column is never modified:
normalization (lowercasing) happens only in the derived shingle values
(north rule: byte-identical `text` per url).

DuckDB-equivalent SQL builders live alongside each Column builder so driver
oracle queries express the exact same computation.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from lsh_rs_spark.config import DedupConfig
from lsh_rs_spark.functions.hashing import md5_64_sql, shingle_id


def _maybe_lower(c: Column, lowercase: bool) -> Column:
    return F.lower(c) if lowercase else c


#: every non-alphanumeric ASCII char (controls, whitespace, punctuation,
#: DEL), as explicit hex ranges around the 0-9 / a-z islands (input is
#: lowercased first, so A-Z needs no carve-out).  Explicit ranges instead
#: of a negated class or ``\\s`` on purpose: this exact literal parses
#: identically in Spark's Java regex and DuckDB's RE2 (negated unicode
#: classes diverge on astral-plane chars, and Java's \\s includes \\x0B
#: while RE2's does not), and non-ASCII bytes pass through untouched
#: rather than being silently folded (CJK/accented text keeps deduping
#: on content, not on its removal).
_NORM_STRIP_RE = r"[\x00-/:-@\[-\x60{-\x7f]+"


def normalize_text(c: Column) -> Column:
    """Robust dedup normalization (published webtext practice -- the
    RefinedWeb/FineWeb MinHash recipes): lowercase, collapse every run of
    ASCII punctuation/whitespace to ONE space, trim.  Case, punctuation
    and whitespace rewraps of the same prose then shingle identically."""
    return F.trim(F.regexp_replace(F.lower(c), _NORM_STRIP_RE, " "))


def normalize_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_text` (RE2 'g' = replace all)."""
    return (
        f"TRIM(REGEXP_REPLACE(LOWER({expr}), '{_NORM_STRIP_RE}', ' ', 'g'))"
    )


def _pre(c: Column, lowercase: bool, normalize: bool = False) -> Column:
    return normalize_text(c) if normalize else _maybe_lower(c, lowercase)


def word_shingles(text: Column | str, n: int, lowercase: bool = False) -> Column:
    """ARRAY<STRING> of word n-grams (space-joined), duplicates preserved.

    Documents shorter than n words contribute a single whole-text shingle,
    so every non-null document has >= 1 shingle (MinHash of the empty set is
    undefined).
    """
    t = _maybe_lower(F.col(text) if isinstance(text, str) else text, lowercase)
    w = F.split(t, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array(F.concat_ws(" ", w)))


def word_shingles_sql(text_expr: str, n: int, lowercase: bool = False) -> str:
    """DuckDB fragment producing the same ARRAY<VARCHAR> as word_shingles."""
    t = f"LOWER({text_expr})" if lowercase else text_expr
    w = f"STRING_SPLIT({t}, ' ')"
    grams = (
        f"LIST_TRANSFORM(RANGE(1, LEN({w}) - {n - 2}), "
        f"i -> ARRAY_TO_STRING(({w})[i:i+{n - 1}], ' '))"
    )
    return (
        f"CASE WHEN LEN({w}) >= {n} THEN {grams} "
        f"ELSE [ARRAY_TO_STRING({w}, ' ')] END"
    )


def char_shingles(text: Column | str, n: int, lowercase: bool = False) -> Column:
    """ARRAY<STRING> of character n-grams; short docs → whole text."""
    t = _maybe_lower(F.col(text) if isinstance(text, str) else text, lowercase)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - (n - 1)),
        lambda i: F.substring(t, i, n),
    )
    return F.when(F.length(t) >= n, grams).otherwise(F.array(t))


def char_shingles_sql(text_expr: str, n: int, lowercase: bool = False) -> str:
    t = f"LOWER({text_expr})" if lowercase else text_expr
    grams = (
        f"LIST_TRANSFORM(RANGE(1, LEN({t}) - {n - 2}), "
        f"i -> ({t})[i:i+{n - 1}])"
    )
    return f"CASE WHEN LEN({t}) >= {n} THEN {grams} ELSE [{t}] END"


def shingles_col(cfg: DedupConfig, text: Column | str = "text") -> Column:
    t = F.col(text) if isinstance(text, str) else text
    if cfg.normalize:
        # robust normalization subsumes lowercasing; applied once here so
        # every shingle mode (and the oracle twin below) shares it
        t, lower = normalize_text(t), False
    else:
        lower = cfg.lowercase
    if cfg.shingle_mode == "word":
        return word_shingles(t, cfg.shingle_size, lower)
    return char_shingles(t, cfg.shingle_size, lower)


def shingles_sql(cfg: DedupConfig, text_expr: str = "text") -> str:
    if cfg.normalize:
        text_expr, lower = normalize_text_sql(text_expr), False
    else:
        lower = cfg.lowercase
    if cfg.shingle_mode == "word":
        return word_shingles_sql(text_expr, cfg.shingle_size, lower)
    return char_shingles_sql(text_expr, cfg.shingle_size, lower)


def shingle_ids_col(cfg: DedupConfig, text: Column | str = "text") -> Column:
    """ARRAY<BIGINT> of *distinct* shingle ids — the doc's shingle set."""
    return F.transform(
        F.array_distinct(shingles_col(cfg, text)),
        lambda s: shingle_id(s, cfg.hash_family),
    )


def word_hash_shingle_ids(
    docs, cfg: DedupConfig, id_col: str = "doc_id", text_col: str = "text"
):
    """(doc_id, shingles ARRAY<BIGINT>) — fast word-n-gram ids for the
    xxhash64 production family (DataFrame-in/DataFrame-out).

    Hash each WORD once, then combine n consecutive word-hashes with one
    fixed-width ``xxhash64(h_i, …, h_{i+n-1})`` per gram — no n-gram string
    is ever materialized (the ``concat_ws(slice(...))`` of the generic
    builder allocates a 3-slice array + a joined string per gram, which is
    ~8× slower at 7M shingles/56k docs).  Distinct n-grams map to distinct
    hash tuples modulo 64-bit word collisions, so Jaccard over these ids is
    the same estimator as over the string shingles.

    Two SELECTs on purpose: the word-hash array must cross a projection
    barrier before the gram lambda indexes it — element_at against an
    unmaterialized transform() re-evaluates the whole inner transform per
    access (O(words²) per doc).
    """
    n = cfg.shingle_size
    t = _pre(F.col(text_col), cfg.lowercase, cfg.normalize)
    w = F.split(t, " ")
    step1 = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.transform(w, lambda x: F.xxhash64(x)).alias("_wh"),
        # short docs (< n words) → one whole-text shingle, same rule as
        # word_shingles(); hashed here because step 2 drops the text
        F.xxhash64(F.concat_ws(" ", w)).alias("_short"),
    )
    wh = F.col("_wh")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(wh) - (n - 1)),
        lambda i: F.xxhash64(*[F.element_at(wh, i + k) for k in range(n)]),
    )
    return step1.select(
        "doc_id",
        F.array_distinct(
            F.when(F.size(wh) >= n, grams).otherwise(F.array(F.col("_short")))
        ).alias("shingles"),
    )


def shingle_set_sql(cfg: DedupConfig, docs_rel: str = "documents") -> str:
    """DuckDB CTE body: (doc_id, sid) — one row per distinct shingle id.

    ``docs_rel`` must expose (doc_id, text).
    """
    return f"""
SELECT doc_id, {md5_64_sql('s')} AS sid
FROM (
  SELECT doc_id, UNNEST({shingles_sql(cfg)}) AS s
  FROM {docs_rel}
  WHERE text IS NOT NULL
)
GROUP BY doc_id, sid
""".strip()
