"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``distributed_vector_search_system_spark``;
this module is the thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_vector_search_system_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact batch kNN (squared-L2, top-10, deterministic
    (distance, id) tie-break) over /root/testdata/sf0.001."""
    return registry.queries()["knn_batch"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
