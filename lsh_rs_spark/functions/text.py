"""Text-analysis scalar layer for training-data pipelines.

Not present in the reference (it consumes pre-shingled vectors); these are
the standard large-corpus companions to dedup: language ID (stopword-marker
voting), quality scoring (length / punctuation / stopword ratios), token
counting (whitespace + a BPE-ish regex), and an order-sensitive document
fingerprint (position-weighted rolling hash).

All Spark builders are pure Column expressions (whole-stage codegen); each
has a DuckDB SQL twin computing the identical value for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from lsh_rs_spark.config import MERSENNE31
from lsh_rs_spark.functions.hashing import md5_64, md5_64_sql

P = MERSENNE31

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: Language marker stopwords (tiny, deterministic; real corpora only).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "los", "las", "es", "una", "en", "que", "por", "para", "con"),
}
#: Deterministic priority for argmax ties (and the 'no markers' fallback).
LANG_PRIORITY = ("en", "de", "fr", "es")


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda x: x != "")


def _tokens_sql(expr: str) -> str:
    return f"LIST_FILTER(STRING_SPLIT({expr}, ' '), x -> x <> '')"


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count (non-empty tokens)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(_tokens(c)).cast("long")


def token_count_ws_sql(expr: str = "text") -> str:
    return f"CAST(LEN({_tokens_sql(expr)}) AS BIGINT)"


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count via regexp_extract_all."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)).cast("long")


def token_count_bpe_sql(expr: str = "text") -> str:
    return f"CAST(LEN(REGEXP_EXTRACT_ALL({expr}, '{BPE_PATTERN}')) AS BIGINT)"


def _marker_count(tokens: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda x: F.array_contains(arr, F.lower(x))))


def lang_scores(text: Column | str) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    toks = _tokens(c)
    return {lang: _marker_count(toks, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}


def lang_id(text: Column | str) -> Column:
    """Predicted language: argmax marker count, priority-ordered ties,
    'und' when no marker hits at all."""
    scores = lang_scores(text)
    best = None
    for lang in LANG_PRIORITY:
        s = scores[lang]
        cond_others = [
            (scores[o] < s) if LANG_PRIORITY.index(o) < LANG_PRIORITY.index(lang)
            else (scores[o] <= s)
            for o in LANG_PRIORITY
            if o != lang
        ]
        cond = (s > 0)
        for x in cond_others:
            cond = cond & x
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def lang_id_sql(expr: str = "text") -> str:
    toks = _tokens_sql(expr)
    score = {
        lang: (
            f"LEN(LIST_FILTER({toks}, x -> LOWER(x) IN "
            f"({', '.join(repr(m) for m in LANG_MARKERS[lang])})))"
        )
        for lang in LANG_PRIORITY
    }
    whens = []
    for lang in LANG_PRIORITY:
        conds = [f"{score[lang]} > 0"]
        for o in LANG_PRIORITY:
            if o == lang:
                continue
            op = "<" if LANG_PRIORITY.index(o) < LANG_PRIORITY.index(lang) else "<="
            conds.append(f"{score[o]} {op} {score[lang]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, "[^A-Za-z0-9 ]", ""))).cast("long")


def punct_count_sql(expr: str = "text") -> str:
    return f"CAST(LEN({expr}) - LEN(REGEXP_REPLACE({expr}, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT)"


def stopword_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    all_markers = tuple(m for ms in LANG_MARKERS.values() for m in ms)
    return _marker_count(_tokens(c), all_markers).cast("long")


def stopword_count_sql(expr: str = "text") -> str:
    all_markers = [m for ms in LANG_MARKERS.values() for m in ms]
    return (
        f"CAST(LEN(LIST_FILTER({_tokens_sql(expr)}, x -> LOWER(x) IN "
        f"({', '.join(repr(m) for m in all_markers)}))) AS BIGINT)"
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Order-sensitive 31-bit rolling fingerprint:
    SUM_i ((md5_64(token_i) % P) * ((i % 4096) + 1) % P) % P  (i 1-based)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = _tokens(c)
    terms = F.transform(
        toks,
        lambda x, i: (md5_64(x) % P) * (((i + 1) % 4096) + 1) % P,
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x) % P


def doc_fingerprint_sql(expr: str = "text") -> str:
    toks = _tokens_sql(expr)
    return (
        f"CAST(COALESCE(LIST_SUM(LIST_TRANSFORM({toks}, "
        f"(x, i) -> (({md5_64_sql('x')} % {P}) * ((i % 4096) + 1) % {P}))), 0) % {P} AS BIGINT)"
    )
