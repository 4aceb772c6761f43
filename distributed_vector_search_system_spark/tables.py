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
    """Resolve every fixture table, reading the parquet footers in
    PARALLEL: each uncached ``spark.read.parquet`` is a ~0.2 s
    driver-side metadata round-trip, and ten of them back to back cost
    ~2 s of pure driver latency on a cold session (measured; the first
    ``_sql`` registry query paid it all).  A small thread pool overlaps
    the py4j/Hadoop round-trips — same DataFrames, same memo, ~4-5×
    less wall-clock.  The events nanos conf is set once BEFORE the pool
    so the threads only read."""
    missing = [
        name
        for name in FIXTURE_TABLES
        if (sf_dir, name) not in spark.__dict__.get("_dvss_table_cache", {})
    ]
    if len(missing) > 1:
        from concurrent.futures import ThreadPoolExecutor

        if "events" in missing:
            _ensure_nanos_conf(spark)
        with ThreadPoolExecutor(max_workers=min(8, len(missing))) as pool:
            list(pool.map(lambda n: load_table(spark, sf_dir, n), missing))
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
