"""DuckDB oracle SQL builders — the exact relational twins of the Spark
operators, used by ``__spark_entry__.oracle_sql()``.

Every builder mirrors one Spark operator *to the integer/double*: the pinned
md5_64 hash family, universal-hash MinHash, '-'-joined band keys, capped
bucket pairing, exact-Jaccard edges, recursive-CTE connected components.
The reference's own test strategy is an exact-computation oracle
(scipy cdist, `lsh-py/test/test_.py:26`); this module is that idea applied
to every stage.

The driver pre-registers parquet views named `documents` / `embeddings`.
"""

from __future__ import annotations

from lsh_rs_spark.config import (
    MERSENNE31,
    DedupConfig,
    MIPSConfig,
    SimHashConfig,
    SRPConfig,
)
from lsh_rs_spark.functions.hashing import md5_64_sql, minhash_params
from lsh_rs_spark.functions.shingles import shingles_sql
from lsh_rs_spark.functions.vectors import srp_sketch_sql

P = MERSENNE31


# ---------------------------------------------------------------------------
# shared CTE chain for the MinHash pipeline
# ---------------------------------------------------------------------------

def _hash_params_rows(cfg: DedupConfig) -> str:
    a, b = minhash_params(cfg.num_perm, cfg.seed)
    return ", ".join(f"({j}, {int(a[j])}, {int(b[j])})" for j in range(cfg.num_perm))


def dedup_ctes(cfg: DedupConfig, docs_rel: str = "documents") -> str:
    """The full CTE chain: docs → shingle_set → minhash_long → buckets →
    bucket_ok → cand_pairs → edges.  Append a final SELECT to use."""
    r = cfg.rows_per_band
    return f"""
docs AS (
  SELECT doc_id, text FROM {docs_rel} WHERE text IS NOT NULL
),
shingle_set AS (
  SELECT doc_id, {md5_64_sql('s')} AS sid
  FROM (SELECT doc_id, UNNEST({shingles_sql(cfg)}) AS s FROM docs)
  GROUP BY doc_id, sid
),
doc_sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingle_set GROUP BY doc_id
),
hp(j, a, b) AS (VALUES {_hash_params_rows(cfg)}),
minhash_long AS (
  SELECT s.doc_id, hp.j, MIN(((s.sid % {P}) * hp.a + hp.b) % {P}) AS h
  FROM shingle_set s CROSS JOIN hp
  GROUP BY s.doc_id, hp.j
),
buckets AS (
  SELECT doc_id, CAST(j // {r} AS INTEGER) AS band_idx,
         STRING_AGG(CAST(h AS VARCHAR), '-' ORDER BY j) AS band_key
  FROM minhash_long
  GROUP BY doc_id, band_idx
),
bucket_ok AS (
  SELECT band_idx, band_key FROM buckets
  GROUP BY band_idx, band_key
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {cfg.max_bucket_size}
),
cand_pairs AS (
  SELECT DISTINCT l.doc_id AS src, r.doc_id AS dst
  FROM buckets l
  JOIN buckets r USING (band_idx, band_key)
  JOIN bucket_ok USING (band_idx, band_key)
  WHERE l.doc_id < r.doc_id
),
edge_inter AS (
  SELECT p.src, p.dst, COUNT(*) AS n_common
  FROM cand_pairs p
  JOIN shingle_set sa ON sa.doc_id = p.src
  JOIN shingle_set sb ON sb.doc_id = p.dst AND sb.sid = sa.sid
  GROUP BY p.src, p.dst
),
edges AS (
  SELECT i.src, i.dst, i.n_common,
         (za.n + zb.n - i.n_common) AS n_union,
         i.n_common / (za.n + zb.n - i.n_common) AS jaccard
  FROM edge_inter i
  JOIN doc_sizes za ON za.doc_id = i.src
  JOIN doc_sizes zb ON zb.doc_id = i.dst
  WHERE i.n_common / (za.n + zb.n - i.n_common) >= {cfg.jaccard_threshold}
)
""".strip()


def q_shingle_stats(cfg: DedupConfig) -> str:
    return (
        f"WITH {dedup_ctes(cfg)} "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_shingles FROM doc_sizes"
    )


def q_minhash_signatures(cfg: DedupConfig) -> str:
    return (
        f"WITH {dedup_ctes(cfg)} "
        "SELECT doc_id, CAST(j AS INTEGER) AS j, h FROM minhash_long"
    )


def q_lsh_buckets(cfg: DedupConfig) -> str:
    return (
        f"WITH {dedup_ctes(cfg)} "
        "SELECT band_idx, band_key, doc_id FROM buckets"
    )


def q_bucket_stats(cfg: DedupConfig) -> str:
    return f"""
WITH {dedup_ctes(cfg)},
bs AS (
  SELECT band_idx, band_key, COUNT(*) AS bucket_size
  FROM buckets GROUP BY band_idx, band_key
)
SELECT band_idx,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(bucket_size) AS BIGINT) AS n_entries,
       AVG(bucket_size) AS avg_bucket_size,
       ROUND(SQRT(GREATEST(0.0, AVG(bucket_size * bucket_size)
                  - AVG(bucket_size) * AVG(bucket_size))), 9)
         AS std_bucket_size,
       CAST(MIN(bucket_size) AS BIGINT) AS min_bucket_size,
       CAST(MAX(bucket_size) AS BIGINT) AS max_bucket_size,
       CAST(SUM(CASE WHEN bucket_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_colliding_buckets
FROM bs GROUP BY band_idx
""".strip()


def q_candidate_pairs(cfg: DedupConfig) -> str:
    return f"WITH {dedup_ctes(cfg)} SELECT src, dst FROM cand_pairs"


def q_edges(cfg: DedupConfig) -> str:
    return (
        f"WITH {dedup_ctes(cfg)} "
        "SELECT src, dst, CAST(n_common AS BIGINT) AS n_common, "
        "CAST(n_union AS BIGINT) AS n_union, jaccard FROM edges"
    )


def q_containment_edges(cfg: DedupConfig, threshold: float = 0.8) -> str:
    """Twin of ``verify.containment_edges``: overlap coefficient
    |A∩B| / min(|A|,|B|) over the same capped candidate pairs."""
    return f"""
WITH {dedup_ctes(cfg)},
cont_inter AS (
  SELECT p.src, p.dst, COUNT(*) AS n_common
  FROM cand_pairs p
  JOIN shingle_set sa ON sa.doc_id = p.src
  JOIN shingle_set sb ON sb.doc_id = p.dst AND sb.sid = sa.sid
  GROUP BY p.src, p.dst
)
SELECT i.src, i.dst, CAST(i.n_common AS BIGINT) AS n_common,
       CAST(za.n AS BIGINT) AS n_src, CAST(zb.n AS BIGINT) AS n_dst,
       i.n_common / LEAST(za.n, zb.n) AS containment
FROM cont_inter i
JOIN doc_sizes za ON za.doc_id = i.src
JOIN doc_sizes zb ON zb.doc_id = i.dst
WHERE i.n_common / LEAST(za.n, zb.n) >= {threshold}
""".strip()


def _components_ctes(cfg: DedupConfig) -> str:
    return f"""
{dedup_ctes(cfg)},
sym AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT dst AS a, src AS b FROM edges
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
components AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
)
""".strip()


def q_components(cfg: DedupConfig) -> str:
    return (
        f"WITH RECURSIVE {_components_ctes(cfg)} "
        "SELECT doc_id, cluster_id FROM components"
    )


def q_dup_clusters(cfg: DedupConfig) -> str:
    return f"""
WITH RECURSIVE {_components_ctes(cfg)}
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM components GROUP BY cluster_id HAVING COUNT(*) >= 2
""".strip()


def q_dedup_keep_list(cfg: DedupConfig) -> str:
    return f"""
WITH RECURSIVE {_components_ctes(cfg)}
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       (d.doc_id = COALESCE(c.cluster_id, d.doc_id)) AS is_representative
FROM docs d LEFT JOIN components c ON c.doc_id = d.doc_id
""".strip()


def q_dedup_keep_best(cfg: DedupConfig) -> str:
    """Twin of ``components.dedup_representatives_by`` with score =
    LENGTH(text): keep the LONGEST member of each dup cluster, ties to
    the min doc id."""
    return f"""
WITH RECURSIVE {_components_ctes(cfg)},
all_labels AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         CAST(LENGTH(d.text) AS BIGINT) AS n_chars
  FROM docs d LEFT JOIN components c ON c.doc_id = d.doc_id
),
ranked AS (
  SELECT doc_id, cluster_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM all_labels
)
SELECT doc_id, cluster_id, n_chars, (rn = 1) AS is_representative
FROM ranked
""".strip()


def q_split_leakage(cfg: DedupConfig, fractions: dict | None = None,
                    seed: int = 42) -> str:
    """Twin of ``functions.sampling.split_leakage`` over the pipeline
    labels (with singletons) and the hash_split assignment."""
    from lsh_rs_spark.functions.sampling import hash_split_sql

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return f"""
WITH RECURSIVE {_components_ctes(cfg)},
all_labels AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM docs d LEFT JOIN components c ON c.doc_id = d.doc_id
),
splitted AS (
  SELECT doc_id, {hash_split_sql('doc_id', fractions, seed)} AS split
  FROM documents
),
j AS (
  SELECT a.cluster_id, a.doc_id, s.split
  FROM all_labels a JOIN splitted s USING (doc_id)
),
counts AS (SELECT cluster_id, COUNT(*) AS n_docs FROM j GROUP BY cluster_id),
dist AS (SELECT DISTINCT cluster_id, split FROM j),
sp AS (
  SELECT cluster_id, COUNT(*) AS n_splits,
         STRING_AGG(split, ',' ORDER BY split) AS splits_csv
  FROM dist GROUP BY cluster_id
)
SELECT c.cluster_id, CAST(c.n_docs AS BIGINT) AS n_docs,
       CAST(sp.n_splits AS BIGINT) AS n_splits, sp.splits_csv
FROM counts c JOIN sp USING (cluster_id)
WHERE sp.n_splits >= 2
""".strip()


def q_cluster_safe_split(cfg: DedupConfig, fractions: dict | None = None,
                         seed: int = 42) -> str:
    """Twin of ``functions.sampling.cluster_safe_split`` over the pipeline
    labels (with singletons)."""
    from lsh_rs_spark.functions.sampling import hash_split_sql

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return f"""
WITH RECURSIVE {_components_ctes(cfg)},
all_labels AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM docs d LEFT JOIN components c ON c.doc_id = d.doc_id
)
SELECT doc_id, cluster_id,
       {hash_split_sql('cluster_id', fractions, seed)} AS split
FROM all_labels
""".strip()


def q_knn_text_topk(cfg: DedupConfig, query_mod: int = 50, k: int = 5) -> str:
    return f"""
WITH {dedup_ctes(cfg)},
qb AS (SELECT * FROM buckets WHERE doc_id % {query_mod} = 0),
hits AS (
  SELECT q.doc_id AS query_id, c.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_collisions
  FROM qb q JOIN buckets c USING (band_idx, band_key)
  WHERE c.doc_id <> q.doc_id
  GROUP BY q.doc_id, c.doc_id
),
kn_inter AS (
  SELECT h.query_id, h.doc_id, COUNT(*) AS n_common
  FROM hits h
  JOIN shingle_set sa ON sa.doc_id = h.query_id
  JOIN shingle_set sb ON sb.doc_id = h.doc_id AND sb.sid = sa.sid
  GROUP BY h.query_id, h.doc_id
),
scored AS (
  SELECT h.query_id, h.doc_id, h.n_collisions,
         COALESCE(i.n_common, 0) / (zq.n + zd.n - COALESCE(i.n_common, 0)) AS jaccard
  FROM hits h
  LEFT JOIN kn_inter i ON i.query_id = h.query_id AND i.doc_id = h.doc_id
  JOIN doc_sizes zq ON zq.doc_id = h.query_id
  JOIN doc_sizes zd ON zd.doc_id = h.doc_id
)
SELECT query_id, doc_id, n_collisions, jaccard, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY jaccard DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_ctes(cfg: SimHashConfig, docs_rel: str = "documents") -> str:
    return f"""
docs AS (
  SELECT doc_id, text FROM {docs_rel}
  WHERE text IS NOT NULL
    AND LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) > 0
),
toks AS (
  SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS tok
  FROM docs
),
th AS (SELECT doc_id, {md5_64_sql('tok')} AS h FROM toks),
votes AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT UNNEST(RANGE(0, {cfg.n_bits})) AS j)
  GROUP BY doc_id, j
),
sketches AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM votes GROUP BY doc_id
)
""".strip()


def q_simhash_signatures(cfg: SimHashConfig) -> str:
    return f"WITH {simhash_ctes(cfg)} SELECT doc_id, simhash FROM sketches"


def q_simhash_pairs(cfg: SimHashConfig) -> str:
    bpb = cfg.bits_per_band
    mask = (1 << bpb) - 1
    return f"""
WITH {simhash_ctes(cfg)},
bands AS (
  SELECT doc_id, simhash, bi AS band_idx,
         (simhash >> (bi * {bpb})) & {mask} AS band_key
  FROM sketches CROSS JOIN (SELECT UNNEST(RANGE(0, {cfg.bands})) AS bi)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS src, r.doc_id AS dst,
         l.simhash AS h_src, r.simhash AS h_dst
  FROM bands l JOIN bands r USING (band_idx, band_key)
  WHERE l.doc_id < r.doc_id
)
SELECT src, dst, CAST(BIT_COUNT(xor(h_src, h_dst)) AS INTEGER) AS hamming
FROM pairs
WHERE BIT_COUNT(xor(h_src, h_dst)) <= {cfg.hamming_threshold}
""".strip()


def q_simhash_multiprobe_pairs(cfg: SimHashConfig, budget: int) -> str:
    """Twin of simhash_ops.simhash_multiprobe_pairs_from_sketches: pairs
    whose band keys are Hamming <= 1 apart in some band (original×original
    or original×single-bit-probe within the step-wise budget), exact-
    Hamming filtered.  Pure integer arithmetic — bit-exact."""
    bpb = cfg.bits_per_band
    mask = (1 << bpb) - 1
    return f"""
WITH {simhash_ctes(cfg)},
bands AS (
  SELECT doc_id, simhash, bi AS band_idx,
         (simhash >> (bi * {bpb})) & {mask} AS band_key
  FROM sketches CROSS JOIN (SELECT UNNEST(RANGE(0, {cfg.bands})) AS bi)
),
expanded AS (
  SELECT doc_id, simhash, band_idx, band_key, 0 AS is_probe FROM bands
  UNION ALL
  SELECT doc_id, simhash, band_idx, xor(band_key, 1 << b), 1
  FROM bands CROSS JOIN (SELECT UNNEST(RANGE(0, {budget})) AS b)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS src, r.doc_id AS dst,
         l.simhash AS h_src, r.simhash AS h_dst
  FROM expanded l JOIN expanded r USING (band_idx, band_key)
  WHERE l.doc_id < r.doc_id AND l.is_probe + r.is_probe <= 1
)
SELECT src, dst, CAST(BIT_COUNT(xor(h_src, h_dst)) AS INTEGER) AS hamming
FROM pairs
WHERE BIT_COUNT(xor(h_src, h_dst)) <= {cfg.hamming_threshold}
""".strip()


# ---------------------------------------------------------------------------
# text analysis (builders imported from functions.text)
# ---------------------------------------------------------------------------

def q_exact_dup_groups() -> str:
    return """
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY text) AS rep_id,
       CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS group_size
FROM documents WHERE text IS NOT NULL
""".strip()


def q_exact_dup_edges() -> str:
    """Twin of dedup.exact_dup_edges (the pipeline's scale form): one row
    (rep_id, doc_id) per non-representative member of an identical-text
    group.  DuckDB groups on raw text; Spark's sha256 shuffle key yields the
    same groups (256-bit collisions are ~n²/2²⁵⁷)."""
    return """
WITH h AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE text IS NOT NULL
),
reps AS (
  SELECT text, MIN(doc_id) AS rep_id, COUNT(*) AS n
  FROM h GROUP BY text HAVING COUNT(*) >= 2
)
SELECT r.rep_id, h.doc_id
FROM h JOIN reps r USING (text)
WHERE h.doc_id <> r.rep_id
""".strip()


def q_knn_text_topk_bounded(
    cfg: DedupConfig, query_mod: int = 50, k: int = 5, bound: int = 3
) -> str:
    """Twin of the candidate-bound query path: per query, keep only the
    `bound` most-promising candidates (n_collisions desc, doc_id asc — the
    reference's QUERY_L_FACT_UPPER_BOUND take, `query.rs:54-59`) before the
    exact re-rank."""
    return f"""
WITH {dedup_ctes(cfg)},
qb AS (SELECT * FROM buckets WHERE doc_id % {query_mod} = 0),
hits AS (
  SELECT q.doc_id AS query_id, c.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_collisions
  FROM qb q JOIN buckets c USING (band_idx, band_key)
  WHERE c.doc_id <> q.doc_id
  GROUP BY q.doc_id, c.doc_id
),
bounded AS (
  SELECT query_id, doc_id, n_collisions FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY n_collisions DESC, doc_id ASC) AS cr
    FROM hits
  ) WHERE cr <= {bound}
),
kn_inter AS (
  SELECT h.query_id, h.doc_id, COUNT(*) AS n_common
  FROM bounded h
  JOIN shingle_set sa ON sa.doc_id = h.query_id
  JOIN shingle_set sb ON sb.doc_id = h.doc_id AND sb.sid = sa.sid
  GROUP BY h.query_id, h.doc_id
),
scored AS (
  SELECT h.query_id, h.doc_id, h.n_collisions,
         COALESCE(i.n_common, 0) / (zq.n + zd.n - COALESCE(i.n_common, 0)) AS jaccard
  FROM bounded h
  LEFT JOIN kn_inter i ON i.query_id = h.query_id AND i.doc_id = h.doc_id
  JOIN doc_sizes zq ON zq.doc_id = h.query_id
  JOIN doc_sizes zd ON zd.doc_id = h.doc_id
)
SELECT query_id, doc_id, n_collisions, jaccard, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY jaccard DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()


def q_token_counts() -> str:
    from lsh_rs_spark.functions.text import token_count_bpe_sql, token_count_ws_sql

    return (
        "SELECT doc_id, "
        f"{token_count_ws_sql('text')} AS n_ws_tokens, "
        f"{token_count_bpe_sql('text')} AS n_bpe_tokens "
        "FROM documents WHERE text IS NOT NULL"
    )


def q_hash_split(fractions: dict | None = None, seed: int = 42) -> str:
    """Twin of ``functions.sampling.hash_split`` over the documents table."""
    from lsh_rs_spark.functions.sampling import hash_split_sql

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return (
        "SELECT doc_id, "
        f"{hash_split_sql('doc_id', fractions, seed)} AS split "
        "FROM documents"
    )


def q_quality_scores() -> str:
    from lsh_rs_spark.functions.text import (
        punct_count_sql,
        stopword_count_sql,
        token_count_ws_sql,
    )

    return f"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars,
       {token_count_ws_sql('text')} AS n_tokens,
       {punct_count_sql('text')} AS n_punct,
       {stopword_count_sql('text')} AS n_stopwords,
       {punct_count_sql('text')} / GREATEST(LENGTH(text), 1) AS punct_ratio,
       {stopword_count_sql('text')} / GREATEST({token_count_ws_sql('text')}, 1)
         AS stopword_ratio
FROM documents WHERE text IS NOT NULL
""".strip()


def q_lang_id() -> str:
    from lsh_rs_spark.functions.text import lang_id_sql

    return (
        "SELECT doc_id, lang, "
        f"{lang_id_sql('text')} AS pred_lang "
        "FROM documents WHERE text IS NOT NULL"
    )


def q_doc_fingerprints() -> str:
    from lsh_rs_spark.functions.text import doc_fingerprint_sql

    return (
        "SELECT doc_id, "
        f"{doc_fingerprint_sql('text')} AS fingerprint "
        "FROM documents WHERE text IS NOT NULL"
    )


# ---------------------------------------------------------------------------
# embeddings: brute-force cosine, near-dup pairs, SRP
# ---------------------------------------------------------------------------

_DOT = (
    "LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN({a}) + 1), "
    "i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)))"
)


def _cos(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (SQRT({na}) * SQRT({nb}))"


def q_ann_cosine_topk(query_mod: int = 100, k: int = 5) -> str:
    cos = _cos("q.embedding", "c.embedding")
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % {query_mod} = 0
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {cos} AS cos
  FROM q JOIN embeddings c ON c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()


def q_ivf_topk_seeded(
    mod: int = 40, nprobe: int = 4, k: int = 5, query_mod: int = 100
) -> str:
    """Twin of ivf.ivf_topk_seeded: IVF-flat with the data-defined seeded
    codebook (centroids = embeddings at vec_id % mod == 0, list_id = id).

    The codebook is rows of the registered table, so no centroid literals
    cross engines; assignment/probing/re-rank all use the same
    sequential-fold cosine as the other gated embedding twins.  Tie
    assumptions (measure-zero on continuous embeddings): no cosine ties at
    the assignment/probe rank boundaries or the top-k cutoff (both engines
    tie-break by list_id / neighbor_id ascending)."""
    sim = _cos("e.embedding", "c.cvec")
    cos = _cos("q.embedding", "n.embedding")
    return f"""
WITH cents AS (
  SELECT vec_id AS list_id, embedding AS cvec FROM embeddings
  WHERE vec_id % {mod} = 0
),
ranked AS (
  SELECT e.vec_id, c.list_id,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {sim} DESC, c.list_id ASC) AS rn
  FROM embeddings e CROSS JOIN cents c
),
idx AS (
  SELECT vec_id AS neighbor_id, list_id FROM ranked WHERE rn <= 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM ranked
  WHERE rn <= {nprobe} AND vec_id % {query_mod} = 0
),
cand AS (
  SELECT DISTINCT p.query_id, i.neighbor_id
  FROM probes p JOIN idx i USING (list_id)
  WHERE i.neighbor_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS cos
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings n ON n.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()


def q_embedding_near_dup(threshold: float = 0.45) -> str:
    cos = _cos("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS src, b.vec_id AS dst, {cos} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
""".strip()


def q_embedding_near_dup_lsh(cfg: SRPConfig, threshold: float = 0.45) -> str:
    """Twin of dedup.embedding_near_dup_lsh: SRP banding → bucketed pairs →
    exact cosine filter (no cartesian term)."""
    bpb = cfg.bits_per_band
    mask = (1 << bpb) - 1
    srp = srp_sketch_sql("embedding", cfg.seed, cfg.n_bits, cfg.dim)
    cos = _cos("a.embedding", "b.embedding")
    return f"""
WITH sk AS (SELECT vec_id, {srp} AS srp FROM embeddings),
bands AS (
  SELECT vec_id, bi AS band_idx, (srp >> (bi * {bpb})) & {mask} AS band_key
  FROM sk CROSS JOIN (SELECT UNNEST(RANGE(0, {cfg.bands})) AS bi)
),
pairs AS (
  SELECT DISTINCT l.vec_id AS src, r.vec_id AS dst
  FROM bands l JOIN bands r USING (band_idx, band_key)
  WHERE l.vec_id < r.vec_id
)
SELECT p.src, p.dst, {cos} AS cos
FROM pairs p
JOIN embeddings a ON a.vec_id = p.src
JOIN embeddings b ON b.vec_id = p.dst
WHERE {cos} >= {threshold}
""".strip()


def q_ann_srp_topk(cfg: SRPConfig, query_mod: int = 100, k: int = 5) -> str:
    """Twin of ann.ann_topk (the SRP-bucketed production ANN path): band the
    query and corpus sketches identically, candidates = band-key equijoin
    (never a cartesian), exact cosine re-rank of candidates only.  Same
    banding SQL as q_srp_pairs (gate-green), same scoring/tie order as
    q_ann_cosine_topk_exact (gate-green)."""
    bpb = cfg.bits_per_band
    mask = (1 << bpb) - 1
    srp = srp_sketch_sql("embedding", cfg.seed, cfg.n_bits, cfg.dim)
    cos = _cos("a.embedding", "b.embedding")
    return f"""
WITH sk AS (SELECT vec_id, {srp} AS srp FROM embeddings),
bands AS (
  SELECT vec_id, bi AS band_idx, (srp >> (bi * {bpb})) & {mask} AS band_key
  FROM sk CROSS JOIN (SELECT UNNEST(RANGE(0, {cfg.bands})) AS bi)
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bands q JOIN bands c USING (band_idx, band_key)
  WHERE q.vec_id % {query_mod} = 0 AND c.vec_id <> q.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS cos
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()


def q_srp_sketches(cfg: SRPConfig) -> str:
    return (
        "SELECT vec_id, "
        f"{srp_sketch_sql('embedding', cfg.seed, cfg.n_bits, cfg.dim)} AS srp "
        "FROM embeddings"
    )


def q_srp_pairs(cfg: SRPConfig, max_hamming: int = 2) -> str:
    bpb = cfg.bits_per_band
    mask = (1 << bpb) - 1
    srp = srp_sketch_sql("embedding", cfg.seed, cfg.n_bits, cfg.dim)
    return f"""
WITH sk AS (SELECT vec_id, {srp} AS srp FROM embeddings),
bands AS (
  SELECT vec_id, srp, bi AS band_idx, (srp >> (bi * {bpb})) & {mask} AS band_key
  FROM sk CROSS JOIN (SELECT UNNEST(RANGE(0, {cfg.bands})) AS bi)
),
pairs AS (
  SELECT DISTINCT l.vec_id AS src, r.vec_id AS dst, l.srp AS h_src, r.srp AS h_dst
  FROM bands l JOIN bands r USING (band_idx, band_key)
  WHERE l.vec_id < r.vec_id
)
SELECT src, dst, CAST(BIT_COUNT(xor(h_src, h_dst)) AS INTEGER) AS hamming
FROM pairs
WHERE BIT_COUNT(xor(h_src, h_dst)) <= {max_hamming}
""".strip()


def q_l2_buckets(n_tables: int = 2, k: int = 4, dim: int = 64,
                 r: float = 4.0, seed: int = 42) -> str:
    from lsh_rs_spark.functions.l2 import l2_hash_sql

    frags = l2_hash_sql("embedding", n_tables, k, dim, r, seed)
    selects = " UNION ALL ".join(
        f"SELECT vec_id, {frag} AS band_key FROM embeddings" for frag in frags
    )
    return f"SELECT vec_id, band_key FROM ({selects})"


def q_l2_xi_distances(n_tables: int = 2, k: int = 4, dim: int = 64,
                      r: float = 4.0, seed: int = 42, query_mod: int = 100) -> str:
    """Twin of functions/l2.l2_xi_col — the query-directed multi-probe
    boundary distances (M2)."""
    from lsh_rs_spark.functions.l2 import l2_xi_sql

    # ROUND(…, 9) on both sides — see the Spark-side comment in
    # __spark_entry__.q_l2_xi_distances (ulp-level fold-order differences)
    selects = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS table_idx, {kk} AS k_idx, "
        f"ROUND({xi_min}, 9) AS xi_min, ROUND({xi_plus}, 9) AS xi_plus "
        f"FROM embeddings WHERE vec_id % {query_mod} = 0"
        for t, kk, xi_min, xi_plus in l2_xi_sql("embedding", n_tables, k, dim, r, seed)
    )
    return f"SELECT vec_id, CAST(table_idx AS INTEGER) AS table_idx, CAST(k_idx AS INTEGER) AS k_idx, xi_min, xi_plus FROM ({selects})"


def q_url_dedup_groups() -> str:
    """Twin of the URL-canonicalization dedup gate: noisy URL variants are
    synthesized deterministically from doc_id (case, default port, tracking
    params, fragment, trailing slash), canonicalized, and grouped — every
    group of variants must collapse to one canonical key."""
    from lsh_rs_spark.functions.urls import url_canonicalize_sql

    url = """
CASE doc_id % 4
  WHEN 0 THEN CONCAT('https://Example.COM/p/', CAST(doc_id % 40 AS VARCHAR))
  WHEN 1 THEN CONCAT('HTTPS://example.com:443/p/', CAST(doc_id % 40 AS VARCHAR), '/')
  WHEN 2 THEN CONCAT('https://EXAMPLE.com/p/', CAST(doc_id % 40 AS VARCHAR), '?utm_source=x&id=7')
  ELSE CONCAT('https://example.COM:443/p/', CAST(doc_id % 40 AS VARCHAR), '/?utm_campaign=y#frag')
END
""".strip().replace("\n", " ")
    canon = url_canonicalize_sql("url")
    return f"""
WITH d AS (SELECT doc_id, {url} AS url FROM documents),
c AS (SELECT doc_id, url, {canon} AS canon_url FROM d)
SELECT doc_id, url, canon_url,
       MIN(doc_id) OVER (PARTITION BY canon_url) AS rep_id,
       CAST(COUNT(*) OVER (PARTITION BY canon_url) AS BIGINT) AS group_size
FROM c
""".strip()


def q_l2_multiprobe_candidates(
    n_tables: int = 2, k: int = 4, dim: int = 64, r: float = 4.0,
    seed: int = 42, query_mod: int = 100, budget: int = 4,
) -> str:
    """Twin of multiprobe.l2_multiprobe_candidates (M2 end-to-end:
    query-directed probe enumeration → bucket union,
    `multi_probe.rs:301-378,387-418`).

    The production path enumerates perturbation sets with Lv et al.'s
    shift/expand min-heap, which pops subsets in nondecreasing total-xi²
    order and keeps the first ``budget`` valid ones (at most one
    perturbation per coordinate).  This twin enumerates ALL 3^k − 1 valid
    delta vectors (each coordinate −1/0/+1, not all zero), scores them with
    the identical xi² sum, and ranks per (query, table) — the top-``budget``
    prefix is the same set the heap emits, because every valid subset
    appears in both enumerations and both order by the same score.

    Measure-zero assumptions behind this gate (documented so a future
    flake is diagnosable, ADVICE r3): (1) NumPy/BLAS batch projections
    (``l2_hash_batch``, pairwise summation) and DuckDB's sequential
    LIST_SUM fold agree to the last ulp at every floor(f/r) boundary —
    a boundary-straddling ulp difference would flip one hash key; (2) no
    xi²-score ties at the budget cutoff (the twin tie-breaks by delta
    ordinal, the heap by insertion order); (3) no xxhash64 collision
    between distinct band-key strings (production compact BIGINT keys,
    functions/l2.compact_band_keys).  All three have probability ~0 on
    continuous synthetic embeddings; on a flake, rerun with a different
    seed before suspecting the operators.
    """
    from itertools import product

    from lsh_rs_spark.functions.l2 import l2_f_sql, l2_hash_sql

    rr = repr(float(r))
    fs = l2_f_sql("embedding", n_tables, k, dim, r, seed)
    # per-query raw projections, then h / xi derived from the SAME f
    qf_cols = ", ".join(
        f"{fs[t][kk]} AS f_{t}_{kk}" for t in range(n_tables) for kk in range(k)
    )
    qx_cols = []
    for t in range(n_tables):
        for kk in range(k):
            f = f"f_{t}_{kk}"
            xim = f"({f} - FLOOR({f} / {rr}) * {rr})"
            qx_cols += [
                f"CAST(FLOOR({f} / {rr}) AS BIGINT) AS h_{t}_{kk}",
                f"{xim} AS xim_{t}_{kk}",
                f"({rr} - {xim}) AS xip_{t}_{kk}",
            ]
    combos = [c for c in product((-1, 0, 1), repeat=k) if any(c)]
    d_cols = ", ".join(f"d{i}" for i in range(k))
    values = ", ".join(
        f"({i}, {', '.join(str(d) for d in c)})" for i, c in enumerate(combos)
    )
    # per-table scored perturbations: score = sum of xi² over perturbed ks
    per_table = []
    for t in range(n_tables):
        score = " + ".join(
            f"(CASE WHEN d{kk} = -1 THEN xim_{t}_{kk} * xim_{t}_{kk} "
            f"WHEN d{kk} = 1 THEN xip_{t}_{kk} * xip_{t}_{kk} "
            f"ELSE 0.0 END)"
            for kk in range(k)
        )
        key = ", ".join(
            f"CAST(h_{t}_{kk} + d{kk} AS VARCHAR)" for kk in range(k)
        )
        per_table.append(
            f"SELECT vec_id, {t} AS tbl, did, {score} AS score, "
            f"CONCAT_WS('-', '{t}', {key}) AS band_key "
            f"FROM qx CROSS JOIN deltas"
        )
    scored = " UNION ALL ".join(per_table)
    base_keys = " UNION ALL ".join(
        "SELECT vec_id, CONCAT_WS('-', '{t}', {key}) AS band_key FROM qx".format(
            t=t,
            key=", ".join(f"CAST(h_{t}_{kk} AS VARCHAR)" for kk in range(k)),
        )
        for t in range(n_tables)
    )
    corpus_frags = l2_hash_sql("embedding", n_tables, k, dim, r, seed)
    corpus_keys = " UNION ALL ".join(
        f"SELECT vec_id, {frag} AS band_key FROM embeddings"
        for frag in corpus_frags
    )
    return f"""
WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {query_mod} = 0
),
qf AS (SELECT vec_id, {qf_cols} FROM q),
qx AS (SELECT vec_id, {", ".join(qx_cols)} FROM qf),
deltas(did, {d_cols}) AS (VALUES {values}),
sc AS ({scored}),
probe_keys AS (
  SELECT vec_id, band_key FROM (
    SELECT vec_id, band_key, ROW_NUMBER() OVER (
      PARTITION BY vec_id, tbl ORDER BY score ASC, did ASC) AS rnk
    FROM sc
  ) WHERE rnk <= {budget}
  UNION ALL
  {base_keys}
),
ck AS ({corpus_keys})
SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS doc_id
FROM probe_keys p JOIN ck c ON c.band_key = p.band_key
WHERE c.vec_id <> p.vec_id
""".strip()


def q_l2_store_multiprobe_candidates(
    n_tables: int = 2, k: int = 4, dim: int = 64, r: float = 4.0,
    seed: int = 42, query_mod: int = 100, budget: int = 4,
) -> str:
    """Twin of multiprobe.l2_store_multiprobe_candidates — the mirror of
    ``q_l2_multiprobe_candidates`` with the probing moved to the CORPUS
    side: every stored vector contributes its base key plus the
    top-``budget`` xi²-ranked perturbation keys (ranked over ALL 3^k − 1
    delta vectors — same equivalence-to-the-heap argument and the same
    three measure-zero assumptions as the query-side twin), while queries
    probe with base keys only."""
    from itertools import product

    from lsh_rs_spark.functions.l2 import l2_f_sql, l2_hash_sql

    rr = repr(float(r))
    fs = l2_f_sql("embedding", n_tables, k, dim, r, seed)
    cf_cols = ", ".join(
        f"{fs[t][kk]} AS f_{t}_{kk}" for t in range(n_tables) for kk in range(k)
    )
    cx_cols = []
    for t in range(n_tables):
        for kk in range(k):
            f = f"f_{t}_{kk}"
            xim = f"({f} - FLOOR({f} / {rr}) * {rr})"
            cx_cols += [
                f"CAST(FLOOR({f} / {rr}) AS BIGINT) AS h_{t}_{kk}",
                f"{xim} AS xim_{t}_{kk}",
                f"({rr} - {xim}) AS xip_{t}_{kk}",
            ]
    combos = [c for c in product((-1, 0, 1), repeat=k) if any(c)]
    d_cols = ", ".join(f"d{i}" for i in range(k))
    values = ", ".join(
        f"({i}, {', '.join(str(d) for d in c)})" for i, c in enumerate(combos)
    )
    per_table = []
    for t in range(n_tables):
        score = " + ".join(
            f"(CASE WHEN d{kk} = -1 THEN xim_{t}_{kk} * xim_{t}_{kk} "
            f"WHEN d{kk} = 1 THEN xip_{t}_{kk} * xip_{t}_{kk} "
            f"ELSE 0.0 END)"
            for kk in range(k)
        )
        key = ", ".join(
            f"CAST(h_{t}_{kk} + d{kk} AS VARCHAR)" for kk in range(k)
        )
        per_table.append(
            f"SELECT vec_id, {t} AS tbl, did, {score} AS score, "
            f"CONCAT_WS('-', '{t}', {key}) AS band_key "
            f"FROM cx CROSS JOIN deltas"
        )
    scored = " UNION ALL ".join(per_table)
    base_keys = " UNION ALL ".join(
        "SELECT vec_id, CONCAT_WS('-', '{t}', {key}) AS band_key FROM cx".format(
            t=t,
            key=", ".join(f"CAST(h_{t}_{kk} AS VARCHAR)" for kk in range(k)),
        )
        for t in range(n_tables)
    )
    query_frags = l2_hash_sql("embedding", n_tables, k, dim, r, seed)
    query_keys = " UNION ALL ".join(
        f"SELECT vec_id, {frag} AS band_key FROM q"
        for frag in query_frags
    )
    return f"""
WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % {query_mod} = 0
),
cf AS (SELECT vec_id, {cf_cols} FROM embeddings),
cx AS (SELECT vec_id, {", ".join(cx_cols)} FROM cf),
deltas(did, {d_cols}) AS (VALUES {values}),
sc AS ({scored}),
store_keys AS (
  SELECT vec_id, band_key FROM (
    SELECT vec_id, band_key, ROW_NUMBER() OVER (
      PARTITION BY vec_id, tbl ORDER BY score ASC, did ASC) AS rnk
    FROM sc
  ) WHERE rnk <= {budget}
  UNION ALL
  {base_keys}
),
qk AS ({query_keys})
SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS doc_id
FROM qk p JOIN store_keys c ON c.band_key = p.band_key
WHERE c.vec_id <> p.vec_id
""".strip()


def q_l2_knn(n_tables: int = 2, k: int = 4, dim: int = 64, r: float = 4.0,
             seed: int = 42, query_mod: int = 100, top_k: int = 5) -> str:
    """Twin of operators/l2_lsh.l2_knn: band probe → n_collisions →
    exact L2 distance re-rank (sequential squared-diff fold, same order
    as functions/vectors.l2_dist)."""
    from lsh_rs_spark.functions.l2 import l2_hash_sql

    frags = l2_hash_sql("embedding", n_tables, k, dim, r, seed)
    bands = " UNION ALL ".join(
        f"SELECT vec_id, {frag} AS band_key FROM embeddings" for frag in frags
    )
    dist = (
        f"SQRT(LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
        "i -> (CAST((q.embedding)[i] AS DOUBLE) - CAST((c.embedding)[i] AS DOUBLE)) "
        "* (CAST((q.embedding)[i] AS DOUBLE) - CAST((c.embedding)[i] AS DOUBLE)))))"
    )
    return f"""
WITH bands AS ({bands}),
cand AS (
  SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_collisions
  FROM bands qb JOIN bands cb USING (band_key)
  WHERE qb.vec_id % {query_mod} = 0 AND cb.vec_id <> qb.vec_id
  GROUP BY qb.vec_id, cb.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, cand.n_collisions, {dist} AS dist
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, n_collisions, dist, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {top_k}
""".strip()


# ---------------------------------------------------------------------------
# MIPS (asymmetric transform + L2 family) — twins of operators/mips_ops.py
# ---------------------------------------------------------------------------

def _mips_ctes(cfg: MIPSConfig, query_mod: int) -> str:
    """fit (max norm) → transformed put/query vectors → band tables."""
    from lsh_rs_spark.functions.l2 import l2_hash_sql
    from lsh_rs_spark.functions.mips import (
        max_norm_sql,
        mips_transform_put_sql,
        mips_transform_query_sql,
    )

    put_vec = mips_transform_put_sql("e.embedding", "f.M", cfg.U, cfg.m, cfg.dim)
    qry_vec = mips_transform_query_sql("e.embedding", cfg.m, cfg.dim)
    put_frags = l2_hash_sql("tv", cfg.n_tables, cfg.k_hash, cfg.hash_dim, cfg.r, cfg.seed)
    put_bands = " UNION ALL ".join(
        f"SELECT vec_id, {frag} AS band_key FROM put_t" for frag in put_frags
    )
    qry_bands = " UNION ALL ".join(
        f"SELECT vec_id, {frag} AS band_key FROM query_t" for frag in put_frags
    )
    return f"""
fitted AS ({max_norm_sql('embeddings', 'embedding', cfg.dim)}),
put_t AS (
  SELECT e.vec_id, {put_vec} AS tv FROM embeddings e CROSS JOIN fitted f
),
query_t AS (
  SELECT e.vec_id, {qry_vec} AS tv FROM embeddings e
  WHERE e.vec_id % {query_mod} = 0
),
put_bands AS ({put_bands}),
query_bands AS ({qry_bands})
""".strip()


def q_multiprobe_candidates(
    cfg: SimHashConfig, query_mod: int = 7, budget: int = 4
) -> str:
    """Exact twin of operators/multiprobe.multiprobe_candidates: per query
    band, probe the base key plus ``budget`` step-wise bit-flip
    perturbations (`lsh-rs/src/multi_probe.rs:108-179` order) and union the
    bucket hits."""
    from lsh_rs_spark.operators.multiprobe import flip_masks

    bpb = cfg.bits_per_band
    mask = (1 << bpb) - 1
    masks = ", ".join(f"({m})" for m in flip_masks(bpb, budget))
    return f"""
WITH {simhash_ctes(cfg)},
bands AS (
  SELECT doc_id, bi AS band_idx, (simhash >> (bi * {bpb})) & {mask} AS band_key
  FROM sketches CROSS JOIN (SELECT UNNEST(RANGE(0, {cfg.bands})) AS bi)
),
probes AS (
  SELECT b.doc_id AS query_id, b.band_idx,
         xor(b.band_key, CAST(m.mask AS BIGINT)) AS band_key
  FROM bands b CROSS JOIN (VALUES {masks}) m(mask)
  WHERE b.doc_id % {query_mod} = 0
)
SELECT DISTINCT p.query_id, c.doc_id
FROM probes p JOIN bands c ON c.band_idx = p.band_idx AND c.band_key = p.band_key
WHERE c.doc_id <> p.query_id
""".strip()


def q_minhash_multiprobe_candidates(
    cfg: DedupConfig, query_mod: int = 25, budget: int = 6
) -> str:
    """Exact twin of multiprobe.minhash_multiprobe_candidates
    (second-minimum substitution probing, kperm family).

    Per (doc, j) the two smallest universal-hash values (ties broken by
    shingle id) give h1 (the signature) and h2 (the runner-up); probe keys
    substitute h2 at one position of one band, and the top-``budget``
    substitutions per query — ranked by the integer gap h2−h1 ascending,
    position index as tie-break — are unioned with the base keys before
    the bucket join.  Arithmetic is pure int64 → no FP-tie caveats; the
    rank order is identical in both engines by construction."""
    r = cfg.rows_per_band
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
),
shingle_set AS (
  SELECT doc_id, {md5_64_sql('s')} AS sid
  FROM (SELECT doc_id, UNNEST({shingles_sql(cfg)}) AS s FROM docs)
  GROUP BY doc_id, sid
),
hp(j, a, b) AS (VALUES {_hash_params_rows(cfg)}),
hfull AS (
  SELECT s.doc_id, hp.j, ((s.sid % {P}) * hp.a + hp.b) % {P} AS h, s.sid
  FROM shingle_set s CROSS JOIN hp
),
r2 AS (
  SELECT doc_id, j, h,
         ROW_NUMBER() OVER (PARTITION BY doc_id, j ORDER BY h, sid) AS rn
  FROM hfull
),
piv AS (
  SELECT doc_id, j,
         MIN(CASE WHEN rn = 1 THEN h END) AS h1,
         MIN(CASE WHEN rn = 2 THEN h END) AS h2
  FROM r2 WHERE rn <= 2 GROUP BY doc_id, j
),
buckets AS (
  SELECT doc_id, CAST(j // {r} AS INTEGER) AS band_idx,
         STRING_AGG(CAST(h1 AS VARCHAR), '-' ORDER BY j) AS band_key
  FROM piv GROUP BY doc_id, band_idx
),
qbase AS (
  SELECT doc_id, band_idx, band_key FROM buckets WHERE doc_id % {query_mod} = 0
),
qsubs AS (
  SELECT p.doc_id, CAST(p.j // {r} AS INTEGER) AS band_idx,
         CAST(p.j AS INTEGER) AS sub_j, p.h2 - p.h1 AS score,
         STRING_AGG(
           CAST(CASE WHEN q.j = p.j THEN q.h2 ELSE q.h1 END AS VARCHAR),
           '-' ORDER BY q.j) AS band_key
  FROM piv p
  JOIN piv q ON q.doc_id = p.doc_id AND (q.j // {r}) = (p.j // {r})
  WHERE p.h2 IS NOT NULL AND p.doc_id % {query_mod} = 0
  GROUP BY p.doc_id, p.j, p.h1, p.h2
),
picked AS (
  SELECT doc_id, band_idx, band_key
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score, sub_j) AS rnk
    FROM qsubs
  ) WHERE rnk <= {budget}
),
probes AS (
  SELECT * FROM qbase UNION SELECT * FROM picked
)
SELECT DISTINCT pr.doc_id AS query_id, c.doc_id
FROM probes pr
JOIN buckets c ON c.band_idx = pr.band_idx AND c.band_key = pr.band_key
WHERE c.doc_id <> pr.doc_id
""".strip()


def q_substring_dups(min_match: int = 48, k_gram: int = 16) -> str:
    """Ground truth for suffix-array substring dedup: two docs pair iff they
    share a verbatim run >= min_match.

    Relational form: enumerate all k-grams with positions, join on gram
    equality, then gaps-and-islands per (pair, diagonal pa-pb) — a run of
    ``cnt`` consecutive shared k-grams on one diagonal is a shared run of
    ``cnt + k_gram - 1`` characters.  Exact for ASCII text (byte == char).
    The Spark operator computes the same pair set via winnowing anchors +
    per-group suffix arrays (operators/suffix.py) — different algorithm,
    identical answer, which is the point of the gate.
    """
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
grams AS (
  SELECT doc_id, i AS pos, substr(text, i, {k_gram}) AS g
  FROM docs, UNNEST(RANGE(1, LENGTH(text) - {k_gram} + 2)) AS t(i)
),
hits AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, a.pos AS pa, b.pos AS pb
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
),
runs AS (
  SELECT src, dst, pa,
         pa - ROW_NUMBER() OVER (PARTITION BY src, dst, pa - pb ORDER BY pa) AS grp,
         pa - pb AS diag
  FROM hits
),
isl AS (
  SELECT src, dst, diag, grp, COUNT(*) AS cnt FROM runs GROUP BY src, dst, diag, grp
)
SELECT src, dst FROM isl
GROUP BY src, dst HAVING MAX(cnt + {k_gram} - 1) >= {min_match}
""".strip()


def _ivf_lloyd_ctes(
    init_mod: int, iters: int, sample_mod: int = 1, dim: int = 64,
    scale: int = 1 << 22,
) -> tuple[str, str]:
    """Unrolled integer-exact Lloyd iterations (twin of
    ivf.train_centroids_exact).  Everything is BIGINT: fixed-point
    floor(x*scale) vectors, integer squared-L2 argmin (ties by list_id),
    integer sums + pmod floor-division centroid updates — bit-identical to
    the Spark path by construction, no float summation-order hazard."""
    samp_where = f" WHERE vec_id % {sample_mod} = 0" if sample_mod > 1 else ""
    parts = [
        f"""fp AS (
  SELECT vec_id, LIST_TRANSFORM(embedding,
    x -> CAST(FLOOR(CAST(x AS DOUBLE) * {scale}.0) AS BIGINT)) AS q
  FROM embeddings
)""",
        f"samp AS (SELECT * FROM fp{samp_where})",
        f"c0 AS (SELECT vec_id AS list_id, q AS c FROM fp WHERE vec_id % {init_mod} = 0)",
    ]

    def sq(a: str, b: str) -> str:
        return (
            f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
            f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])))"
        )

    for t in range(1, iters + 1):
        p = f"c{t - 1}"
        sv = "SUM(s.q[t.i])"
        parts += [
            f"""a{t} AS (
  SELECT vec_id, list_id FROM (
    SELECT s.vec_id, c.list_id,
      ROW_NUMBER() OVER (PARTITION BY s.vec_id
                         ORDER BY {sq('s.q', 'c.c')} ASC, c.list_id ASC) AS rn
    FROM samp s CROSS JOIN {p} c
  ) WHERE rn = 1
)""",
            f"""u{t} AS (
  SELECT a.list_id, t.i,
         CAST(({sv} - (({sv} % COUNT(*)) + COUNT(*)) % COUNT(*)) // COUNT(*)
              AS BIGINT) AS cd
  FROM a{t} a JOIN samp s USING (vec_id), UNNEST(RANGE(1, {dim} + 1)) AS t(i)
  GROUP BY a.list_id, t.i
)""",
            f"""g{t} AS (
  SELECT c.list_id, t.i, c.c[t.i] AS c_prev
  FROM {p} c, UNNEST(RANGE(1, {dim} + 1)) AS t(i)
)""",
            f"""c{t} AS (
  SELECT g.list_id, LIST(COALESCE(u.cd, g.c_prev) ORDER BY g.i) AS c
  FROM g{t} g LEFT JOIN u{t} u ON u.list_id = g.list_id AND u.i = g.i
  GROUP BY g.list_id
)""",
        ]
    return ",\n".join(parts), f"c{iters}"


def q_ivf_kmeans_centroids(
    init_mod: int = 40, iters: int = 2, dim: int = 64
) -> str:
    """Twin of ivf.train_centroids_exact: long-form (list_id, d, c)
    trained centroids after ``iters`` exact Lloyd updates."""
    ctes, last = _ivf_lloyd_ctes(init_mod, iters, dim=dim)
    return f"""
WITH {ctes}
SELECT list_id, t.i - 1 AS d, c[t.i] AS c
FROM {last}, UNNEST(RANGE(1, {dim} + 1)) AS t(i)
""".strip()


def q_ivf_topk_trained(
    init_mod: int = 40, iters: int = 2, nprobe: int = 4, k: int = 5,
    query_mod: int = 100, dim: int = 64,
) -> str:
    """Twin of ivf.ivf_topk_trained: the full train→assign→probe→re-rank
    chain over the integer-exact Lloyd codebook.  Assignment/probing rank
    by exact BIGINT squared-L2 (no float ties possible); the final re-rank
    uses the same sequential-fold double cosine as every other gated
    embedding twin (no-tie assumption at the top-k cutoff only)."""
    ctes, last = _ivf_lloyd_ctes(init_mod, iters, dim=dim)
    sq = (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
        "i -> ((e.q)[i] - (c.c)[i]) * ((e.q)[i] - (c.c)[i])))"
    )
    cos = _cos("q.embedding", "n.embedding")
    return f"""
WITH {ctes},
ranked AS (
  SELECT e.vec_id, c.list_id,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {sq} ASC, c.list_id ASC) AS rn
  FROM fp e CROSS JOIN {last} c
),
idx AS (
  SELECT vec_id AS neighbor_id, list_id FROM ranked WHERE rn <= 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM ranked
  WHERE rn <= {nprobe} AND vec_id % {query_mod} = 0
),
cand AS (
  SELECT DISTINCT p.query_id, i.neighbor_id
  FROM probes p JOIN idx i USING (list_id)
  WHERE i.neighbor_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS cos
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings n ON n.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()


def q_substring_spans(min_match: int = 48, k_gram: int = 16) -> str:
    """Ground truth for duplicated-span extraction (Lee et al. 2021 §4):
    (doc_id, span_start, span_end) — merged 0-based [start, end) char
    ranges covered by some cross-document verbatim run >= min_match.

    Same k-gram diagonal islands as ``q_substring_dups``, but each island
    also yields its start offsets (MIN(pa)/MIN(pb) per diagonal run); both
    sides emit a span, then overlapping-or-touching spans merge per doc
    (gaps-and-islands over a running MAX(end)).  The Spark operator
    recovers the identical ranges from winnowing-anchored snippet tiles +
    per-group suffix arrays (operators/suffix.py:substring_dup_spans)."""
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
grams AS (
  SELECT doc_id, i AS pos, substr(text, i, {k_gram}) AS g
  FROM docs, UNNEST(RANGE(1, LENGTH(text) - {k_gram} + 2)) AS t(i)
),
hits AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, a.pos AS pa, b.pos AS pb
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
),
runs AS (
  SELECT src, dst, pa, pb,
         pa - ROW_NUMBER() OVER (PARTITION BY src, dst, pa - pb ORDER BY pa) AS grp,
         pa - pb AS diag
  FROM hits
),
isl AS (
  SELECT src, dst, diag, grp,
         MIN(pa) AS pa0, MIN(pb) AS pb0, COUNT(*) AS cnt
  FROM runs GROUP BY src, dst, diag, grp
),
good AS (SELECT * FROM isl WHERE cnt + {k_gram} - 1 >= {min_match}),
spans0 AS (
  SELECT src AS doc_id, pa0 - 1 AS s, pa0 - 1 + cnt + {k_gram} - 1 AS e FROM good
  UNION ALL
  SELECT dst, pb0 - 1, pb0 - 1 + cnt + {k_gram} - 1 FROM good
),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
           PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         THEN 1 ELSE 0 END AS new_i
  FROM spans0
),
islands AS (
  SELECT doc_id, s, e, SUM(new_i) OVER (
    PARTITION BY doc_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
FROM islands GROUP BY doc_id, island
""".strip()


def q_span_cleaned_docs(min_match: int = 48, k_gram: int = 16) -> str:
    """Ground truth for END-TO-END span cleaning: (doc_id, clean_text)
    with every duplicated span (as defined by ``q_substring_spans``)
    removed — the full Lee et al. 2021 §4 "remove the duplicated bytes,
    keep the rest" output, value-exact.

    Reuses the span CTE verbatim, then reconstructs the kept text per doc
    from the inter-span segments: each span contributes the segment
    [previous span's end, own start) via a LAG window, plus one tail
    segment [last span's end, len); docs with no spans pass through
    unchanged.  Spans are disjoint and sorted (the gaps-and-islands merge
    guarantees it), so segment boundaries never overlap.  Char==byte
    equivalence with Spark's byte-true ``strip_spans`` fold relies on
    ASCII text — the same documented caveat as every substring gate."""
    return f"""
WITH spans AS ({q_substring_spans(min_match, k_gram)}),
doc_src AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
segs AS (
  SELECT doc_id,
         COALESCE(LAG(span_end) OVER (
           PARTITION BY doc_id ORDER BY span_start), 0) AS seg_start,
         span_start AS seg_end
  FROM spans
  UNION ALL
  SELECT s.doc_id, MAX(s.span_end) AS seg_start,
         MAX(LENGTH(d.text)) AS seg_end
  FROM spans s JOIN doc_src d USING (doc_id)
  GROUP BY s.doc_id
),
cleaned AS (
  SELECT s.doc_id,
         STRING_AGG(SUBSTR(d.text, s.seg_start + 1, s.seg_end - s.seg_start),
                    '' ORDER BY s.seg_start) AS clean_text
  FROM segs s JOIN doc_src d USING (doc_id)
  GROUP BY s.doc_id
)
SELECT doc_id, clean_text FROM cleaned
UNION ALL
SELECT d.doc_id, d.text AS clean_text
FROM doc_src d
WHERE d.doc_id NOT IN (SELECT doc_id FROM spans)
""".strip()


def q_mips_buckets(cfg: MIPSConfig) -> str:
    return (
        f"WITH {_mips_ctes(cfg, query_mod=1 << 62)} "
        "SELECT vec_id, band_key FROM put_bands"
    )


def q_mips_multiprobe_candidates(
    cfg: MIPSConfig, query_mod: int = 100, budget: int = 4
) -> str:
    """Twin of mips_ops.mips_multiprobe_candidates — query-directed (M2)
    probing applied to the MIPS (P3) family: the xi²-ranked perturbation
    enumeration of ``q_l2_multiprobe_candidates`` evaluated on the
    asymmetrically TRANSFORMED query vector (``query_t.tv``: unit head +
    0.5 tail) against the transform_put corpus band table.

    Enumeration equivalence and measure-zero FP assumptions are identical
    to ``q_l2_multiprobe_candidates`` (all 3^k−1 deltas ranked by the same
    xi² sum = the heap's first-``budget`` prefix; sequential LIST_SUM folds
    match Spark's Column folds to the last ulp away from floor
    boundaries); the transform parity (M fit, scaled head, norm-power
    tail) is the same pair already gated by ``mips_buckets``/``mips_topk``.
    """
    from itertools import product

    from lsh_rs_spark.functions.l2 import l2_f_sql

    n_tables, k = cfg.n_tables, cfg.k_hash
    rr = repr(float(cfg.r))
    fs = l2_f_sql("tv", n_tables, k, cfg.hash_dim, cfg.r, cfg.seed)
    qf_cols = ", ".join(
        f"{fs[t][kk]} AS f_{t}_{kk}" for t in range(n_tables) for kk in range(k)
    )
    qx_cols = []
    for t in range(n_tables):
        for kk in range(k):
            f = f"f_{t}_{kk}"
            xim = f"({f} - FLOOR({f} / {rr}) * {rr})"
            qx_cols += [
                f"CAST(FLOOR({f} / {rr}) AS BIGINT) AS h_{t}_{kk}",
                f"{xim} AS xim_{t}_{kk}",
                f"({rr} - {xim}) AS xip_{t}_{kk}",
            ]
    combos = [c for c in product((-1, 0, 1), repeat=k) if any(c)]
    d_cols = ", ".join(f"d{i}" for i in range(k))
    values = ", ".join(
        f"({i}, {', '.join(str(d) for d in c)})" for i, c in enumerate(combos)
    )
    per_table = []
    for t in range(n_tables):
        score = " + ".join(
            f"(CASE WHEN d{kk} = -1 THEN xim_{t}_{kk} * xim_{t}_{kk} "
            f"WHEN d{kk} = 1 THEN xip_{t}_{kk} * xip_{t}_{kk} "
            f"ELSE 0.0 END)"
            for kk in range(k)
        )
        key = ", ".join(
            f"CAST(h_{t}_{kk} + d{kk} AS VARCHAR)" for kk in range(k)
        )
        per_table.append(
            f"SELECT vec_id, {t} AS tbl, did, {score} AS score, "
            f"CONCAT_WS('-', '{t}', {key}) AS band_key "
            f"FROM qx CROSS JOIN deltas"
        )
    scored = " UNION ALL ".join(per_table)
    return f"""
WITH {_mips_ctes(cfg, query_mod)},
qf AS (SELECT vec_id, {qf_cols} FROM query_t),
qx AS (SELECT vec_id, {", ".join(qx_cols)} FROM qf),
deltas(did, {d_cols}) AS (VALUES {values}),
sc AS ({scored}),
probe_keys AS (
  SELECT vec_id, band_key FROM (
    SELECT vec_id, band_key, ROW_NUMBER() OVER (
      PARTITION BY vec_id, tbl ORDER BY score ASC, did ASC) AS rnk
    FROM sc
  ) WHERE rnk <= {budget}
  UNION ALL
  SELECT vec_id, band_key FROM query_bands
)
SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS doc_id
FROM probe_keys p JOIN put_bands c ON c.band_key = p.band_key
WHERE c.vec_id <> p.vec_id
""".strip()


def q_mips_store_multiprobe_candidates(
    cfg: MIPSConfig, query_mod: int = 100, budget: int = 4
) -> str:
    """Twin of mips_ops.mips_store_multiprobe_candidates — the mirror of
    ``q_mips_multiprobe_candidates`` with the probing moved to the CORPUS
    side: every stored vector contributes its base key plus the
    top-``budget`` xi²-ranked perturbation keys of the PUT-transformed
    vector (ranked over ALL 3^k−1 delta vectors — same
    equivalence-to-the-heap argument), while queries probe with their
    base (query-transform) keys only.  Same measure-zero FP assumptions
    as the query-side twin."""
    from itertools import product

    from lsh_rs_spark.functions.l2 import l2_f_sql

    n_tables, k = cfg.n_tables, cfg.k_hash
    rr = repr(float(cfg.r))
    fs = l2_f_sql("tv", n_tables, k, cfg.hash_dim, cfg.r, cfg.seed)
    cf_cols = ", ".join(
        f"{fs[t][kk]} AS f_{t}_{kk}" for t in range(n_tables) for kk in range(k)
    )
    cx_cols = []
    for t in range(n_tables):
        for kk in range(k):
            f = f"f_{t}_{kk}"
            xim = f"({f} - FLOOR({f} / {rr}) * {rr})"
            cx_cols += [
                f"CAST(FLOOR({f} / {rr}) AS BIGINT) AS h_{t}_{kk}",
                f"{xim} AS xim_{t}_{kk}",
                f"({rr} - {xim}) AS xip_{t}_{kk}",
            ]
    combos = [c for c in product((-1, 0, 1), repeat=k) if any(c)]
    d_cols = ", ".join(f"d{i}" for i in range(k))
    values = ", ".join(
        f"({i}, {', '.join(str(d) for d in c)})" for i, c in enumerate(combos)
    )
    per_table = []
    for t in range(n_tables):
        score = " + ".join(
            f"(CASE WHEN d{kk} = -1 THEN xim_{t}_{kk} * xim_{t}_{kk} "
            f"WHEN d{kk} = 1 THEN xip_{t}_{kk} * xip_{t}_{kk} "
            f"ELSE 0.0 END)"
            for kk in range(k)
        )
        key = ", ".join(
            f"CAST(h_{t}_{kk} + d{kk} AS VARCHAR)" for kk in range(k)
        )
        per_table.append(
            f"SELECT vec_id, {t} AS tbl, did, {score} AS score, "
            f"CONCAT_WS('-', '{t}', {key}) AS band_key "
            f"FROM cx CROSS JOIN deltas"
        )
    scored = " UNION ALL ".join(per_table)
    return f"""
WITH {_mips_ctes(cfg, query_mod)},
cf AS (SELECT vec_id, {cf_cols} FROM put_t),
cx AS (SELECT vec_id, {", ".join(cx_cols)} FROM cf),
deltas(did, {d_cols}) AS (VALUES {values}),
sc AS ({scored}),
store_keys AS (
  SELECT vec_id, band_key FROM (
    SELECT vec_id, band_key, ROW_NUMBER() OVER (
      PARTITION BY vec_id, tbl ORDER BY score ASC, did ASC) AS rnk
    FROM sc
  ) WHERE rnk <= {budget}
  UNION ALL
  SELECT vec_id, band_key FROM put_bands
)
SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS doc_id
FROM query_bands p JOIN store_keys c ON c.band_key = p.band_key
WHERE c.vec_id <> p.vec_id
""".strip()


def q_mips_topk(cfg: MIPSConfig, query_mod: int = 100, k: int = 5) -> str:
    from lsh_rs_spark.functions.mips import inner_product_sql

    dot = inner_product_sql("q.embedding", "c.embedding", cfg.dim)
    return f"""
WITH {_mips_ctes(cfg, query_mod)},
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, pb.vec_id AS neighbor_id
  FROM query_bands qb JOIN put_bands pb USING (band_key)
  WHERE qb.vec_id <> pb.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {dot} AS dot
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, dot, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()
