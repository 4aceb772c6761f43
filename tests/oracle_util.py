"""Local re-implementation of the driver's DuckDB-oracle comparison:
row count + schema (column names) + order-insensitive value compare."""

from __future__ import annotations

import datetime
import math

import duckdb

from distributed_vector_search_system_spark.schemas import FIXTURE_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill last-ulp noise; queries already round displayed floats
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duck_connection(sf_dir)
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(duck_cols) != sorted(spark_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(duck_rows) != len(spark_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_set = sorted((tuple(_norm(r[i]) for i in s_order) for r in spark_rows), key=repr)
    d_set = sorted((tuple(_norm(r[i]) for i in d_order) for r in duck_rows), key=repr)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        return False, f"value mismatch, first diffs (spark, duck): {diffs}"
    return True, "ok"
