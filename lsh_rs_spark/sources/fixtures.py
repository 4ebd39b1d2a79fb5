"""F1 fixture (FIXTURES.md): CC-style pages with *known-truth* duplicates.

Deterministic NumPy generation on the driver (seeded, no external data):
every planted relationship is recorded in sidecar truth tables, so recall
is measured against exact ground truth — the reference's oracle pattern
(`lsh-py/test/test_.py`: seeded data + scipy-exact comparison).

Planted kinds:
* ``exact``      — byte-identical text under a different url
* ``near:<J>``   — word-perturbed copy targeting Jaccard level J on
                   word-``shingle_size`` shingles (J ∈ {0.95, 0.9, 0.8, 0.7, 0.5})
* ``substring``  — doc embedding a verbatim >= 200-char span of another doc
* ``boilerplate``— shared short template (hot-bucket skew fixture)

Returns (docs_df, truth_pairs_df) where truth_pairs carries the *measured*
exact Jaccard of each planted pair (computed on the generated text, not the
target level, so assertions are against true values).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _jaccard_words(a: list[str], b: list[str], n: int) -> float:
    def sh(ws):
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def make_truth_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    seed: int = 42,
    shingle_size: int = 3,
    min_words: int = 60,
    max_words: int = 300,
    vocab_size: int = 5000,
) -> tuple[DataFrame, DataFrame]:
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i:04d}" for i in range(vocab_size)]

    def url(i: int) -> str:
        return f"https://site{i % 997:04d}.example/page/{i:06d}"

    texts: list[list[str]] = []
    for i in range(n_docs):
        n = int(rng.integers(min_words, max_words))
        texts.append([vocab[j] for j in rng.integers(0, vocab_size, n)])

    rows = []
    truth = []
    next_id = n_docs

    for i in range(n_docs):
        rows.append((url(i), i, " ".join(texts[i]), "en"))

    # exact twins: 5% of docs
    for i in rng.choice(n_docs, size=n_docs // 20, replace=False):
        j = next_id
        next_id += 1
        rows.append((url(j), int(j), " ".join(texts[i]), "en"))
        truth.append((int(i), int(j), "exact", 1.0))

    # graded near-dups: 5% split over target levels
    levels = [0.95, 0.9, 0.8, 0.7, 0.5]
    cands = rng.choice(n_docs, size=(n_docs // 20) * len(levels) // len(levels) * len(levels), replace=False)
    per = max(1, len(cands) // len(levels))
    for li, level in enumerate(levels):
        for i in cands[li * per : (li + 1) * per]:
            words = list(texts[i])
            m = len(words)
            # fraction of words to replace so shingle-Jaccard ≈ level:
            # replacing a fraction f of words kills ~n*f shingles of each
            # doc; J ≈ (1 - n*f) / (1 + n*f)  →  f = (1-J) / (n*(1+J))
            f = (1 - level) / (shingle_size * (1 + level))
            n_mut = max(1, int(round(m * f)))
            pos = rng.choice(m, size=min(n_mut, m), replace=False)
            for p in pos:
                words[int(p)] = f"mut{int(rng.integers(10**6)):06d}"
            j = next_id
            next_id += 1
            rows.append((url(j), int(j), " ".join(words), "en"))
            truth.append(
                (int(i), int(j), f"near:{level}", _jaccard_words(texts[i], words, shingle_size))
            )

    # substring embeds: 2%
    for i in rng.choice(n_docs, size=n_docs // 50, replace=False):
        span_words = texts[i][: max(30, len(texts[i]) // 2)]
        span = " ".join(span_words)
        if len(span) < 200:
            continue
        filler = [vocab[j] for j in rng.integers(0, vocab_size, 40)]
        j = next_id
        next_id += 1
        rows.append(
            (url(j), int(j), " ".join(filler[:20]) + " " + span + " " + " ".join(filler[20:]), "en")
        )
        truth.append((int(i), int(j), "substring", float(len(span))))

    # boilerplate template: 1% share one short text (hot bucket)
    template = " ".join(vocab[i] for i in range(12))
    boiler_ids = []
    for _ in range(max(4, n_docs // 100)):
        j = next_id
        next_id += 1
        rows.append((url(j), int(j), template, "en"))
        boiler_ids.append(j)

    docs = spark.createDataFrame(rows, ["url", "doc_id", "text", "lang"])
    truth_df = spark.createDataFrame(
        truth, ["src", "dst", "kind", "exact_value"]
    )
    return docs, truth_df
