"""p-stable L2 LSH (E2LSH) family: h(v) = floor((A·v + b) / r).

Reference: `L2::hash_vec` `lsh-rs/src/hash.rs:73-135` (A ~ N(0,1) (K,dim),
b ~ U(0, r), one hasher per table seeded from a root seed) and the
query-directed multi-probe machinery `lsh-rs/src/multi_probe.rs:301-378`
(Lv et al., VLDB'07: perturb the query's hash by ±1 in the coordinates
whose boundary distance xi is smallest).

Spark shape: one pandas UDF signs a batch against ALL L tables in a single
(n, dim) @ (dim, L*K) BLAS matmul; the output is a long-format band table
(table_idx, hash_key, id) — the same `(band_idx, band_key)` bucket contract
as the MinHash path, so pairing/probing reuse pairs_from_buckets and the
bucket equi-join.

Multi-probe (M2): `distance_to_bound` gives xi(-1) = f - h*r (distance back
to the lower bucket wall) and xi(+1) = r - xi(-1); probes enumerate
perturbation sets in increasing total xi² score with the paper's min-heap
(shift/expand), all inside the UDF per query batch (pure NumPy/heapq).
Invariant (reference golden `multi_probe.rs:447-452`): xi(-1)+xi(+1) == r.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from lsh_rs_spark.config import SRPConfig  # noqa: F401 (kept for parity docs)


def l2_params(n_tables: int, k: int, dim: int, r: float, seed: int):
    """(A, b): A (L, K, dim) standard normal, b (L, K) uniform[0, r)."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n_tables, k, dim))
    b = rng.uniform(0.0, r, size=(n_tables, k))
    return A, b


def l2_hash_batch(X: np.ndarray, A: np.ndarray, b: np.ndarray, r: float) -> np.ndarray:
    """(n, dim) → (n, L, K) int64 hashes: floor((A·v + b)/r)."""
    L, K, dim = A.shape
    proj = X @ A.reshape(L * K, dim).T  # (n, L*K)
    h = np.floor((proj + b.reshape(1, L * K)) / r)
    return h.astype(np.int64).reshape(-1, L, K)


def xi_distances(X: np.ndarray, A: np.ndarray, b: np.ndarray, r: float):
    """Boundary distances per (row, table, k): xi_min = f - h*r, xi_plus = r - xi_min."""
    L, K, dim = A.shape
    f = X @ A.reshape(L * K, dim).T + b.reshape(1, L * K)  # (n, L*K)
    h = np.floor(f / r)
    xi_min = f - h * r
    return xi_min.reshape(-1, L, K), (r - xi_min).reshape(-1, L, K)


def query_directed_probes(
    xi_min_row: np.ndarray, xi_plus_row: np.ndarray, budget: int
) -> list[list[tuple[int, int]]]:
    """Lv et al. Algorithm 1 for ONE (table) row: enumerate perturbation
    sets [(k_idx, ±1), ...] in increasing sum-of-xi² score.

    Mirrors `PerturbState` (score/shift/expand, `multi_probe.rs:181-299`):
    sort the 2K boundary distances, heap-expand subsets with the shift
    (replace last element by next) and expand (append next) moves.
    """
    K = xi_min_row.shape[0]
    # candidate list: (xi, k_idx, delta) sorted ascending
    cands = sorted(
        [(float(xi_min_row[i]) ** 2, i, -1) for i in range(K)]
        + [(float(xi_plus_row[i]) ** 2, i, +1) for i in range(K)]
    )
    n = len(cands)
    out: list[list[tuple[int, int]]] = []
    # heap entries: (score, last_index, selection tuple of cand indices)
    start = (cands[0][0], 0, (0,))
    heap = [start]
    seen = set()
    while heap and len(out) < budget:
        score, last, sel = heapq.heappop(heap)
        if sel in seen:
            continue
        seen.add(sel)
        # a valid probe must not perturb the same k twice
        ks = [cands[i][1] for i in sel]
        if len(set(ks)) == len(ks):
            out.append([(cands[i][1], cands[i][2]) for i in sel])
        if last + 1 < n:
            shift = sel[:-1] + (last + 1,)
            heapq.heappush(
                heap,
                (score - cands[last][0] + cands[last + 1][0], last + 1, shift),
            )
            expand = sel + (last + 1,)
            heapq.heappush(
                heap, (score + cands[last + 1][0], last + 1, expand)
            )
    return out


def _key(h_row: np.ndarray) -> str:
    return "-".join(str(int(x)) for x in h_row)


def compact_band_keys(df: DataFrame, key_col: str = "band_key") -> DataFrame:
    """Replace a STRING band key by its xxhash64 — one 8-byte BIGINT.

    The L2/MIPS families key buckets by 'table:h1-h2-…' strings (~20-40
    bytes); every bucket shuffle/join pays that per row.  Hashing the
    string to one int64 in the SAME stage that produced it keeps the
    exchange at 8 bytes/key — the MinHash family's round-3 trick
    (operators/lsh.py band_key) applied to the dense families.

    Equivalence classes are preserved by construction (equal strings ⇒
    equal hashes); a 64-bit collision could only MERGE two buckets, adding
    candidates that the exact re-rank then scores — at ~n²/2⁶⁴ for n
    distinct keys this is the same measure-zero class as FP-tie notes on
    the oracle gates.  Production consumers (l2_knn, mips_topk,
    l2_candidate_pairs, l2_multiprobe_candidates) apply this; the oracle
    twins keep the string form so DuckDB can reproduce the keys."""
    return df.withColumn(key_col, F.xxhash64(key_col))


def make_l2_bands_udf(
    n_tables: int, k: int, dim: int, r: float, seed: int, probes: int = 0
):
    """pandas UDF: embedding → ARRAY<STRING> of L*(1+probes) 'table:hash' keys.

    probes=0 → store path (one key per table, `hash_vec_put` semantics);
    probes>0 → query path with query-directed probing (M2).
    """
    A, b = l2_params(n_tables, k, dim, r, seed)

    @F.pandas_udf(ArrayType(StringType()))
    def l2_bands(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        H = l2_hash_batch(X, A, b, r)  # (n, L, K)
        out = []
        if probes == 0:
            for row in H:
                out.append([f"{t}:{_key(row[t])}" for t in range(n_tables)])
        else:
            xi_min, xi_plus = xi_distances(X, A, b, r)
            for i in range(X.shape[0]):
                keys = []
                for t in range(n_tables):
                    keys.append(f"{t}:{_key(H[i, t])}")
                    for pert in query_directed_probes(
                        xi_min[i, t], xi_plus[i, t], probes
                    ):
                        hh = H[i, t].copy()
                        for k_idx, delta in pert:
                            hh[k_idx] += delta
                        keys.append(f"{t}:{_key(hh)}")
                out.append(list(dict.fromkeys(keys)))
        return pd.Series(out)

    return l2_bands


def l2_band_table(
    emb: DataFrame,
    n_tables: int,
    k: int,
    dim: int,
    r: float,
    seed: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 0,
    id_alias: str = "vec_id",
) -> DataFrame:
    """(band_key STRING, <id_alias>) long bucket table for the L2 family."""
    udf = make_l2_bands_udf(n_tables, k, dim, r, seed, probes)
    return (
        emb.select(F.col(id_col).alias(id_alias), udf(vec_col).alias("keys"))
        .select(id_alias, F.explode("keys").alias("band_key"))
    )


# ---------------------------------------------------------------------------
# Oracle-parity Column/SQL variants (sequential double folds, like the SRP
# path in functions/vectors.py — bit-identical between Spark and DuckDB)
# ---------------------------------------------------------------------------

def l2_hash_col(vec, n_tables: int, k: int, dim: int, r: float, seed: int):
    """ARRAY<STRING> of 'table:hash-key' strings via Column expressions.

    Construction notes (100× interpreted-eval win, same doubles):
    * coefficients are one folded ``F.lit(list)`` ArrayType literal — an
      ``F.array(*lits)`` CreateArray node would be re-materialized (67 boxed
      doubles) on EVERY lambda invocation;
    * ``zip_with`` multiplies the two arrays directly — a
      ``transform(sequence(...))`` with per-index ``element_at`` pays two
      O(1)-but-interpreted array probes per term.
    The fold order (sequential, left-to-right) is unchanged, so the keys are
    bit-identical to the previous construction and to the DuckDB LIST_SUM
    twin (``l2_hash_sql``)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    A, b = l2_params(n_tables, k, dim, r, seed)
    keys = []
    for t in range(n_tables):
        parts = []
        for kk in range(k):
            coeffs = F.lit([float(c) for c in A[t, kk]])
            terms = F.zip_with(coeffs, v, lambda ca, x: ca * x.cast("double"))
            proj = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
            parts.append(
                F.floor((proj + F.lit(float(b[t, kk]))) / F.lit(r)).cast("long").cast("string")
            )
        keys.append(F.concat_ws("-", F.lit(str(t)), *parts))
    return F.array(*keys)


def l2_xi_col(vec, n_tables: int, k: int, dim: int, r: float, seed: int):
    """ARRAY<STRUCT<table,k,xi_min,xi_plus>> — the query-directed-probe
    boundary distances (M2, `multi_probe.rs:312-321`): for projection
    f = A·v + b, xi_min = f - floor(f/r)·r is the distance back to the
    lower bucket wall and xi_plus = r - xi_min the distance forward.
    Same fold arithmetic as ``l2_hash_col`` → DuckDB-parity doubles;
    golden invariant xi_min + xi_plus == r (`multi_probe.rs:447-452`)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    A, b = l2_params(n_tables, k, dim, r, seed)
    entries = []
    for t in range(n_tables):
        for kk in range(k):
            coeffs = F.lit([float(c) for c in A[t, kk]])
            terms = F.zip_with(coeffs, v, lambda ca, x: ca * x.cast("double"))
            f = (
                F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
                + F.lit(float(b[t, kk]))
            )
            xi_min = f - F.floor(f / F.lit(r)) * F.lit(r)
            entries.append(
                F.struct(
                    F.lit(t).cast("int").alias("table_idx"),
                    F.lit(kk).cast("int").alias("k_idx"),
                    xi_min.alias("xi_min"),
                    (F.lit(r) - xi_min).alias("xi_plus"),
                )
            )
    return F.array(*entries)


def l2_xi_sql(vec_expr: str, n_tables: int, k: int, dim: int, r: float, seed: int) -> list[str]:
    """DuckDB twins of ``l2_xi_col``: one (table, k, xi_min, xi_plus)
    4-tuple of SQL fragments per projection."""
    A, b = l2_params(n_tables, k, dim, r, seed)
    out = []
    for t in range(n_tables):
        for kk in range(k):
            coeffs = ", ".join(repr(float(c)) for c in A[t, kk])
            f = (
                f"(LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
                f"i -> ([{coeffs}])[i] * CAST(({vec_expr})[i] AS DOUBLE))) "
                f"+ {float(b[t, kk])!r})"
            )
            xi_min = f"({f} - FLOOR({f} / {float(r)!r}) * {float(r)!r})"
            out.append((t, kk, xi_min, f"({float(r)!r} - {xi_min})"))
    return out


def l2_f_sql(vec_expr: str, n_tables: int, k: int, dim: int, r: float, seed: int) -> list[list[str]]:
    """DuckDB fragments of the raw projection f = A·v + b, indexed [t][kk].

    Shared base of hash (floor(f/r)) and xi (f - floor(f/r)·r) — used by the
    M2 end-to-end oracle, which needs h and xi of the SAME f per (t, k)."""
    A, b = l2_params(n_tables, k, dim, r, seed)
    out = []
    for t in range(n_tables):
        row = []
        for kk in range(k):
            coeffs = ", ".join(repr(float(c)) for c in A[t, kk])
            row.append(
                f"(LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
                f"i -> ([{coeffs}])[i] * CAST(({vec_expr})[i] AS DOUBLE))) "
                f"+ {float(b[t, kk])!r})"
            )
        out.append(row)
    return out


def l2_hash_sql(vec_expr: str, n_tables: int, k: int, dim: int, r: float, seed: int) -> list[str]:
    """DuckDB twins: one SQL fragment per table producing the same key."""
    A, b = l2_params(n_tables, k, dim, r, seed)
    out = []
    for t in range(n_tables):
        parts = []
        for kk in range(k):
            coeffs = ", ".join(repr(float(c)) for c in A[t, kk])
            proj = (
                f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
                f"i -> ([{coeffs}])[i] * CAST(({vec_expr})[i] AS DOUBLE)))"
            )
            parts.append(
                f"CAST(CAST(FLOOR(({proj} + {float(b[t, kk])!r}) / {float(r)!r}) AS BIGINT) AS VARCHAR)"
            )
        out.append(f"CONCAT_WS('-', '{t}', " + ", ".join(parts) + ")")
    return out
