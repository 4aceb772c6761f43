"""Driver-contract query registry.

Aggregates every implemented operator's ``(spark, sf_dir) -> DataFrame``
builder plus (where SQL-expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` re-exports these for the correctness harness.

Conventions (FIXTURES.md):
- squared L2, un-rooted, computed in double in BOTH engines;
- distances rounded to 6 decimals in BOTH engines (kills last-ulp
  summation-order noise while keeping 1e-6 discrimination);
- deterministic tie-break ``(distance, id)``;
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import llm, relational, vector

_MODULES = (vector, relational, llm)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
