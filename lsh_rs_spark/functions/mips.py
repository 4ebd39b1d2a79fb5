"""Maximum Inner Product Search: asymmetric LSH transform (ALSH).

Reference: `MIPS` in `/root/reference/lsh-rs/src/hash.rs:137-237` —
Shrivastava & Li (NIPS'14) asymmetric transform feeding the L2 p-stable
family:

* ``fit`` (`hash.rs:163-173`): M = max L2 norm over the stored vectors.
* ``tranform_put`` (`hash.rs:175-192`): scale x' = x·U/M (so ‖x'‖ < U < 1),
  then append m components ‖x'‖², ‖x'‖⁴·…  — reference appends
  ``norm_sq^i`` for i in 1..m.
* ``transform_query`` (`hash.rs:194-208`): normalize q' = q/‖q‖, append m
  components of 0.5.
* hashing (`hash.rs:211-224`): the L2 hasher over dim+m.

With this construction ‖q'−x'‖² = 1 + Σ norm² ᶦ − 2·(U/(M‖q‖))·(q·x) + c, so
near-L2 neighbors of the transformed query are near-max-inner-product
vectors of the original space; an exact inner-product re-rank of the
candidates restores exactness.

Everything here is Column-expression arithmetic (double), with DuckDB SQL
twins built the same way (sequential fold == LIST_SUM; powers by repeated
multiplication, never libm ``pow`` — pow(x, n) may differ between JVM and
DuckDB's C library at the ulp level, repeated multiplication cannot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _vec(v) -> Column:
    return F.col(v) if isinstance(v, str) else v


def norm_sq_col(vec, dim: int) -> Column:
    """Σ v_i² as a sequential double fold (matches DuckDB LIST_SUM order).

    zip_with(v, v) instead of transform(sequence)+element_at: same terms in
    the same order, none of the interpreted per-index array probes."""
    v = _vec(vec)
    terms = F.zip_with(v, v, lambda a, b: a.cast("double") * b.cast("double"))
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq_sql(vec_expr: str, dim: int) -> str:
    return (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
        f"i -> CAST(({vec_expr})[i] AS DOUBLE) * CAST(({vec_expr})[i] AS DOUBLE)))"
    )


def mips_fit(emb: DataFrame, vec_col: str = "embedding", dim: int = 64) -> float:
    """A5 ``fit``: the max L2 norm over the corpus (`hash.rs:163-173`).

    One Spark agg → one driver scalar (the model parameter the reference
    stores as ``self.M``); broadcast back as a literal.
    """
    row = emb.select(
        F.max(F.sqrt(norm_sq_col(vec_col, dim))).alias("m")
    ).collect()[0]
    return float(row["m"])


def max_norm_sql(rel: str, vec_expr: str, dim: int) -> str:
    """DuckDB twin of ``mips_fit`` as a scalar CTE body."""
    return f"SELECT MAX(SQRT({norm_sq_sql(vec_expr, dim)})) AS M FROM {rel}"


def _powers_col(ns: Column, m: int) -> list[Column]:
    """[ns¹, ns², …, nsᵐ] by repeated multiplication (deterministic FP)."""
    out: list[Column] = []
    cur = ns
    for _ in range(m):
        out.append(cur)
        cur = cur * ns
    return out


def mips_transform_put_col(vec, M: float, U: float, m: int, dim: int) -> Column:
    """x → ARRAY<DOUBLE>(dim+m): scaled components then norm_sq powers
    (`hash.rs:175-192`)."""
    v = _vec(vec)
    scaled = F.transform(v, lambda x: x.cast("double") / F.lit(M) * F.lit(U))
    # reference computes norm_sq from the *scaled* vector
    ns_terms = F.zip_with(
        v,
        v,
        lambda a, b: (a.cast("double") / F.lit(M) * F.lit(U))
        * (b.cast("double") / F.lit(M) * F.lit(U)),
    )
    ns = F.aggregate(ns_terms, F.lit(0.0), lambda acc, x: acc + x)
    return F.concat(scaled, F.array(*_powers_col(ns, m)))


def mips_transform_query_col(vec, m: int, dim: int) -> Column:
    """q → ARRAY<DOUBLE>(dim+m): L2-normalized components then m × 0.5
    (`hash.rs:194-208`)."""
    v = _vec(vec)
    norm = F.sqrt(norm_sq_col(v, dim))
    scaled = F.transform(v, lambda x: x.cast("double") / norm)
    return F.concat(scaled, F.array(*[F.lit(0.5) for _ in range(m)]))


def mips_transform_put_sql(vec_expr: str, m_expr: str, U: float, m: int, dim: int) -> str:
    """DuckDB twin of ``mips_transform_put_col``; ``m_expr`` references the
    fitted max norm (e.g. a CTE column)."""
    scaled = (
        f"LIST_TRANSFORM(RANGE(1, {dim} + 1), "
        f"i -> CAST(({vec_expr})[i] AS DOUBLE) / {m_expr} * {U!r})"
    )
    ns = (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
        f"i -> (CAST(({vec_expr})[i] AS DOUBLE) / {m_expr} * {U!r}) "
        f"* (CAST(({vec_expr})[i] AS DOUBLE) / {m_expr} * {U!r})))"
    )
    powers = []
    cur = f"({ns})"
    prod = cur
    for _ in range(m):
        powers.append(prod)
        prod = f"({prod} * {cur})"
    return f"LIST_CONCAT({scaled}, [{', '.join(powers)}])"


def mips_transform_query_sql(vec_expr: str, m: int, dim: int) -> str:
    norm = f"SQRT({norm_sq_sql(vec_expr, dim)})"
    scaled = (
        f"LIST_TRANSFORM(RANGE(1, {dim} + 1), "
        f"i -> CAST(({vec_expr})[i] AS DOUBLE) / {norm})"
    )
    halves = ", ".join(["0.5"] * m)
    return f"LIST_CONCAT({scaled}, [{halves}])"


def inner_product_col(a, b, dim: int) -> Column:
    """Sequential-fold dot product (DuckDB LIST_SUM parity)."""
    va, vb = _vec(a), _vec(b)
    terms = F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def inner_product_sql(a_expr: str, b_expr: str, dim: int) -> str:
    return (
        f"LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim} + 1), "
        f"i -> CAST(({a_expr})[i] AS DOUBLE) * CAST(({b_expr})[i] AS DOUBLE)))"
    )
