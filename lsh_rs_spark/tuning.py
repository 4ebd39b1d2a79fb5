"""Parameter grid search — the reference's optimize_* helpers, Spark-shaped.

Reference: `optimize_srp_params` / `optimize_l2_params`
(`lsh-rs/src/stats.rs:104-163`) grid-search K with L derived from
``estimate_l(delta, p1, k)``, build an LSH per combo on sample vectors and
report bucket-length stats + timings (`OptRes`, `stats.rs:47-57`).

Here each combo signs a *sample DataFrame* and aggregates the bucket-size
distribution (the `describe` analogue) — the same signal the reference's
cost model uses (`examples/reverse-img-search/src/prepare.rs:67-89`:
total = hash_time + search_time * N_total/n_sample), plus the collision
stats that feed hot-bucket salting decisions.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from lsh_rs_spark.functions.l2 import l2_band_table
from lsh_rs_spark.functions.simhash import sketch_bands
from lsh_rs_spark.operators.ann import srp_sketches
from lsh_rs_spark.stats import collision_prob_cosine, collision_prob_l2, estimate_l
from lsh_rs_spark.config import SRPConfig


@dataclass
class OptResult:
    """≙ reference OptRes (`lsh-rs/src/stats.rs:47-57`)."""

    k: int
    l: int
    hash_seconds: float
    n_buckets: int
    min_len: int
    max_len: int
    avg_len: float
    std_len: float = 0.0
    extras: dict = field(default_factory=dict)

    def cost_estimate(self, n_total: int, n_sample: int) -> float:
        """hash_time + expected probe work scaled to the full corpus.

        Probe work is the SIZE-BIASED mean bucket length — a random probe
        lands in a bucket with probability proportional to its size, so the
        expected candidates scanned per query is E[s²]/E[s] =
        avg + var/avg, not the plain average.  That is exactly where the
        bucket-size std-dev (reference `describe`, mem.rs:156-197) enters
        the cost model: a skewed distribution at the same average costs
        more per probe.
        """
        probe = self.avg_len + (self.std_len**2) / max(self.avg_len, 1e-12)
        return self.hash_seconds * (n_total / max(1, n_sample)) + probe


def _bucket_stats(bands: DataFrame) -> tuple[int, int, int, float, float]:
    c = F.col("count")
    row = (
        bands.groupBy("band_key").count()
        .agg(
            F.count("*").alias("n"),
            F.min("count").alias("mn"),
            F.max("count").alias("mx"),
            F.avg("count").alias("av"),
            # population std-dev via the reference's avg(c²)−avg(c)² form;
            # clamped at 0: FP rounding can make the difference slightly
            # negative, and sqrt(neg)=NaN would poison cost_estimate ranking
            F.sqrt(F.greatest(F.lit(0.0), F.avg(c * c) - F.avg(c) * F.avg(c))).alias("sd"),
        )
        .first()
    )
    return (
        int(row["n"] or 0),
        int(row["mn"] or 0),
        int(row["mx"] or 0),
        float(row["av"] or 0.0),
        float(row["sd"] or 0.0),
    )


def optimize_l2_params(
    sample: DataFrame,
    dim: int,
    ks: list[int],
    delta: float = 0.1,
    r: float = 4.0,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[OptResult]:
    p1 = collision_prob_l2(r, 1.0)
    out = []
    for k in ks:
        l = max(1, estimate_l(delta, p1, k))
        t0 = time.time()
        bands = l2_band_table(sample, l, k, dim, r, seed, id_col, vec_col).persist()
        n, mn, mx, av, sd = _bucket_stats(bands)
        bands.unpersist()
        out.append(OptResult(k, l, round(time.time() - t0, 3), n, mn, mx, av, sd,
                             extras={"p1": p1, "r": r}))
    return out


def optimize_srp_params(
    sample: DataFrame,
    dim: int,
    ks: list[int],
    cosine_sim: float = 0.8,
    delta: float = 0.1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[OptResult]:
    p1 = collision_prob_cosine(cosine_sim)
    out = []
    for k in ks:
        l = max(1, estimate_l(delta, p1, k))
        n_bits = k * l
        if n_bits > 63:
            # sketch width bound: split across several 63-bit sketches
            # would be needed; cap to the largest feasible L for this k
            l = max(1, 63 // k)
            n_bits = k * l
        t0 = time.time()
        cfg = SRPConfig(n_bits=n_bits, bands=l, dim=dim, seed=seed)
        sk = srp_sketches(sample, cfg, id_col, vec_col, use_udf=True)
        bands = sketch_bands(sk, "srp", "vec_id", cfg.bands, cfg.bits_per_band, "vec_id")
        bands = bands.withColumn(
            "band_key", F.concat_ws(":", "band_idx", "band_key")
        ).persist()
        n, mn, mx, av, sd = _bucket_stats(bands)
        bands.unpersist()
        out.append(OptResult(k, l, round(time.time() - t0, 3), n, mn, mx, av, sd,
                             extras={"p1": p1, "requested_l": max(1, estimate_l(delta, p1, k))}))
    return out


def best_params(results: list[OptResult], n_total: int, n_sample: int) -> OptResult:
    """argmin of the reference's cost model over the grid."""
    return min(results, key=lambda x: x.cost_estimate(n_total, n_sample))


#: Measured shuffle volume per input document for the dedup pipeline's two
#: heavy exchanges (tools/stage_bytes.py on the 5.6M-doc synthetic web
#: corpus, round 6): candidate-pair emission ~310 B/doc (folded band keys
#: x bands, map-side-distinct pairs), exact-verify join-backs ~1.7 kB/doc
#: (pruned shingle arrays crossing two joins).  Used for partition sizing;
#: corpora with much longer documents should scale these by
#: avg_doc_bytes/750.
PAIRS_SHUFFLE_BYTES_PER_DOC = 310
EDGES_SHUFFLE_BYTES_PER_DOC = 1690


def suggest_shuffle_partitions(
    n_docs: int,
    cores: int,
    target_partition_bytes: int = 64 << 20,
    avg_doc_bytes: int = 750,
    pairs_bytes_per_doc: int | None = None,
    edges_bytes_per_doc: int | None = None,
) -> int:
    """``spark.sql.shuffle.partitions`` for a dedup run of ``n_docs``.

    Two constraints, take the max:

    * **size** — the heaviest exchange (the verify join-backs) divided by
      the ~64 MB post-shuffle partition target that keeps a task's sort
      comfortably inside its execution-memory share.  Setting partitions =
      cores exactly (one task wave) pushed the decoded partition beyond
      the per-task memory share on the 5.6M-doc corpus and triggered
      external-sort spill on BOTH heavy stages (pairs 2.0 GB, edges
      4.7 GB spilled at 8 cores); at 4x cores the spill disappeared and
      the 8-core leg ran 18% faster end to end (tools/stage_bytes.py
      A/B, round 6).
    * **waves** — at least 2 tasks per core so a straggler costs a
      fraction of a wave, the standard sizing guidance.

    AQE (adaptive coalescing) merges partitions that come out smaller
    than the advisory size, so overshooting is cheap; undershooting
    (spill) is not.  At 100 TB the size constraint dominates and the
    result is ~tens of thousands of partitions — exactly how a real
    cluster should be sized, while the waves floor keeps tiny corpora
    from underusing a big executor fleet.
    """
    if pairs_bytes_per_doc is not None or edges_bytes_per_doc is not None:
        # calibrated constants (calibrate_shuffle_constants) already embed
        # the corpus's document lengths — no avg_doc_bytes rescaling
        heavy_bytes = max(
            pairs_bytes_per_doc or PAIRS_SHUFFLE_BYTES_PER_DOC,
            edges_bytes_per_doc or EDGES_SHUFFLE_BYTES_PER_DOC,
        ) * n_docs
    else:
        heavy_bytes = max(
            PAIRS_SHUFFLE_BYTES_PER_DOC, EDGES_SHUFFLE_BYTES_PER_DOC
        ) * n_docs * (avg_doc_bytes / 750.0)
    by_size = -(-int(heavy_bytes) // target_partition_bytes)
    return max(2 * cores, by_size)


def _shuffle_write_by_stage(spark) -> dict:
    """{stageId: shuffle-write bytes} over the stages the app status store
    retains — the numbers the UI's stage table shows, read headless.
    Per-stage (not a grand total) so callers can attribute bytes to the
    stages that appeared between two snapshots even while the store evicts
    old stages (spark.ui.retainedStages).  Uses the same py4j surface the
    UI backend reads; if a Spark upgrade moves it, callers get a clear
    RuntimeError (calibration is an offline tuning step, never on a query
    path)."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        jvm = sc._jvm
        # Spark 4 signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — empty filters mean "all stages"
        stages = store.stageList(
            jvm.java.util.ArrayList(), False, False,
            sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList())
        it = stages.iterator()
        out = {}
        while it.hasNext():
            s = it.next()
            out[(s.stageId(), s.attemptId())] = s.shuffleWriteBytes()
        return out
    except Exception as exc:  # pragma: no cover - depends on Spark internals
        raise RuntimeError(
            "cannot read shuffle metrics from the Spark status store; "
            "fall back to the module constants PAIRS/EDGES_SHUFFLE_BYTES_PER_DOC"
        ) from exc


def _new_stage_bytes(after: dict, before: dict) -> int:
    return sum(v for k, v in after.items() if k not in before)


def calibrate_shuffle_constants(spark, docs: DataFrame) -> dict:
    """Measure the dedup pipeline's per-document shuffle volume on THIS
    corpus (sampled or full) and return calibrated constants for
    :func:`suggest_shuffle_partitions`.

    The module defaults (310 / 1690 B/doc) were measured on the synthetic
    web corpus (tools/stage_bytes.py, round 6); corpora with different
    document lengths, dup rates or shingle densities shift them.  Both
    heavy exchanges are O(n_docs), so constants measured on a ~100k-doc
    sample extrapolate linearly — run this once per new corpus family and
    pass the results to ``suggest_shuffle_partitions(...,
    pairs_bytes_per_doc=..., edges_bytes_per_doc=...)``.

    Runs signatures → candidate pairs → exact-verify edges with the
    production config and attributes shuffle-WRITE bytes by differencing
    the app-status-store total around each stage (valid because the stages
    are materialized sequentially; concurrent foreign jobs on the same
    session would pollute the diff — calibrate on a quiet session).
    """
    from lsh_rs_spark.config import PIPELINE_CONFIG
    from lsh_rs_spark.operators import lsh as _L, verify as _V

    cfg = PIPELINE_CONFIG
    docs = docs.persist()
    n = docs.count()
    sig = _L.signatures(docs, cfg).persist()
    sig.count()
    try:
        base = _shuffle_write_by_stage(spark)
        pairs = _L.candidate_pairs(
            _L.explode_bands(sig, cfg), cfg
        ).localCheckpoint(eager=True)
        after_pairs = _shuffle_write_by_stage(spark)
        _V.jaccard_edges(pairs, sig, cfg).count()
        after_edges = _shuffle_write_by_stage(spark)
    finally:
        sig.unpersist()
        docs.unpersist()
    return {
        "n_docs": n,
        "pairs_bytes_per_doc": max(
            1, -(-_new_stage_bytes(after_pairs, base) // n)),
        "edges_bytes_per_doc": max(
            1, -(-_new_stage_bytes(after_edges, after_pairs) // n)),
    }
