"""Stable hash functions usable identically from Spark SQL, DuckDB and NumPy.

The reference assigns ids chronologically from an in-process counter
(`lsh-rs/src/table/mem.rs:98-112`) — not reproducible under distributed
execution, so our document key is a *content hash of the url* (or the given
``doc_id``), never ``monotonically_increasing_id``.

Two shingle-id families (see config.HASH_FAMILIES):

* ``md5_64``: first 15 hex chars (60 bits) of MD5 → BIGINT, always >= 0.
  - Spark SQL : CAST(CONV(SUBSTR(MD5(s), 1, 15), 16, 10) AS BIGINT)
  - DuckDB    : CAST(('0x' || SUBSTR(MD5(s), 1, 15)) AS BIGINT)
  - Python    : int(hashlib.md5(s).hexdigest()[:15], 16)
  Verified bit-identical across all three (tests/test_kernels.py).
* ``xxhash64``: Spark's built-in, JVM-side, fastest — production path.

Universal hashing for MinHash: h_j(x) = (a_j * (x mod P) + b_j) mod P with
P = 2^31-1; a_j in [1, P), b_j in [0, P) drawn once from a seeded NumPy
generator on the driver (reference seeds per-table RNGs from a root seed the
same way, `lsh-rs/src/lsh/lsh.rs:108-118`).  All operands < 2^31 so products
stay < 2^62: exact in int64 everywhere (incl. DuckDB, which errors on
BIGINT overflow rather than wrapping).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, functions as F

from lsh_rs_spark.config import MERSENNE31

P = MERSENNE31


def md5_64(col: Column | str) -> Column:
    """Spark column: 60-bit nonnegative BIGINT from MD5 (oracle-parity family)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_64_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same value as :func:`md5_64`."""
    return f"CAST(('0x' || SUBSTR(MD5({expr}), 1, 15)) AS BIGINT)"


def md5_64_py(s: str) -> int:
    """Python/NumPy-side equivalent (used inside pandas-UDF kernels)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def shingle_id(col: Column | str, family: str) -> Column:
    """Shingle string → stable BIGINT id under the configured family."""
    c = F.col(col) if isinstance(col, str) else col
    if family == "md5_64":
        return md5_64(c)
    if family == "xxhash64":
        # keep the top 63 bits, nonnegative: `% P` then matches NumPy, and
        # shiftrightunsigned avoids ANSI abs()'s overflow-checked branch
        # (measured 2x faster inside transform())
        return F.shiftrightunsigned(F.xxhash64(c), 1)
    raise ValueError(f"unknown hash family {family!r}")


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) universal-hash coefficients, int64, driver-generated once."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, P, size=num_perm, dtype=np.int64)
    b = rng.integers(0, P, size=num_perm, dtype=np.int64)
    return a, b


def universal_hash_np(ids: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,) ids × (k,) coeffs → (n, k) hashed matrix, exact int64 arithmetic."""
    ids = np.asarray(ids, dtype=np.int64) % P
    return (ids[:, None] * a[None, :] + b[None, :]) % P


def universal_hash_sql(id_expr: str, a: int, b: int) -> str:
    """SQL fragment for one universal hash — identical in Spark SQL & DuckDB."""
    return f"((({id_expr}) % {P}) * {a} + {b}) % {P}"
