"""Stable hashing utilities.

The reference keys its query cache by FNV-1a-64 over the raw query bytes
combined with top_k (reference src/cache/query_cache.cc:51-56,76-87).
Only key *equality* matters — the exact hash fn is an implementation
detail — so we use:

- ``query_digest``: ``xxhash64`` (JVM-side, fast) for the in-engine
  cache key.
- ``portable_hash64``: md5-prefix-as-int64, reproducible identically in
  DuckDB as ``('0x' || substr(md5(x),1,15))::BIGINT`` — used wherever a
  hash value itself must match the correctness oracle (MinHash, SimHash,
  fingerprints).  15 hex chars < 2^60 so it fits signed int64 in both
  engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col, seed: int | str | None = None) -> Column:
    """64-bit-ish (60-bit) stable hash of a string column, oracle-portable.

    Spark:  conv(substr(md5(concat(seed,':',x)),1,15),16,10)::bigint
    DuckDB: ('0x' || substr(md5(seed||':'||x),1,15))::BIGINT
    """
    s = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        s = F.concat(F.lit(str(seed)), F.lit(":"), s)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str, seed: int | str | None = None) -> str:
    """The DuckDB-side rendering of :func:`portable_hash64` for oracles."""
    inner = f"'{seed}' || ':' || ({expr})" if seed is not None else f"({expr})"
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"


def query_digest(vector_col, top_k_col) -> Column:
    """Fast in-engine cache key: digest of the query vector bytes + k.

    Reference analog: QueryCache::BuildKey (FNV-1a over query bytes, k
    mixed in) — src/cache/query_cache.cc:51-56.  xxhash64 is JVM-side and
    vectorized; the float→string canonicalization makes the key stable
    across runs of the same session/data.
    """
    v = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    k = F.col(top_k_col) if isinstance(top_k_col, str) else top_k_col
    return F.xxhash64(F.to_json(F.struct(v.alias("v"))), k)
