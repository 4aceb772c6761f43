"""Fixture-table loaders (parquet sources with known schemas).

Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning available; at 100 TB the
same call reads a partitioned directory tree and prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Memoize per session: spark.read.parquet re-reads the file footer on
    # every call to resolve the schema — a repeated catalog/metadata
    # round-trip that serializes on the driver.  The cached object is a
    # lazy DataFrame (no data pinned); at 100 TB this is exactly the
    # "resolve the table once, reuse the relation" behavior a metastore
    # catalog provides.
    cache: dict[tuple[str, str], DataFrame] = spark.__dict__.setdefault(
        "_dvss_table_cache", {}
    )
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    if name == "events":
        _ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read
        # natively; with spark.sql.legacy.parquet.nanosAsLong it arrives as
        # int64 nanos — truncate to micros (exactly what DuckDB does when
        # it narrows ns → its µs-precision TIMESTAMP).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    cache[key] = df
    return df


def _ensure_nanos_conf(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use.

    Idempotent per (session, sf_dir): every ``_sql``-backed registry query
    calls this, and re-registering 10 views (each a parquet footer read
    without the load_table memo) costs ~0.3-0.5 s of driver time per
    query for no change in results.
    """
    if spark.__dict__.get("_dvss_views_dir") == sf_dir:
        return
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    spark.__dict__["_dvss_views_dir"] = sf_dir
