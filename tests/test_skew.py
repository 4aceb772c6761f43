"""Skew-handling operators: salted join / salted aggregation must be
result-identical to their unsalted forms while spreading a hot key over
many reducers (the explicit fallback when AQE's skew splitting can't
see or fix the skew)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.skew import (
    SALT_COL,
    salted_agg,
    salted_join,
)


def _skewed_fact(spark, n=2000, hot_share=0.9):
    """90% of rows carry key 0 — the pathological hot key."""
    hot = int(n * hot_share)
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise((F.col("id") % 7) + 1)
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def _dim(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}") for i in range(8)], "k long, k_name string"
    )


def test_salted_join_equals_plain_inner(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, "k").select("row_id", "k", "v", "k_name")
    salted = salted_join(fact, dim, "k", buckets=8).select("row_id", "k", "v", "k_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_equals_plain_left(spark):
    fact = _skewed_fact(spark)
    dim = _dim(spark).filter(F.col("k") < 3)  # some fact keys unmatched
    plain = fact.join(dim, "k", "left").select("row_id", "k", "v", "k_name")
    salted = salted_join(fact, dim, "k", buckets=4, how="left").select(
        "row_id", "k", "v", "k_name"
    )
    assert sorted(map(tuple, plain.collect(), )) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 salt bucket (the whole point)."""
    fact = _skewed_fact(spark)
    from distributed_vector_search_system_spark.operators.skew import _salt

    buckets = (
        fact.filter(F.col("k") == 0)
        .select(_salt(fact.columns, 8).alias(SALT_COL))
        .distinct()
        .count()
    )
    assert buckets > 1


def test_salted_join_is_deterministic(spark):
    """No rand() in the plan: two runs produce identical salts (retry /
    recompute safety on a real cluster)."""
    fact, dim = _skewed_fact(spark), _dim(spark)
    a = sorted(map(tuple, salted_join(fact, dim, "k").collect()))
    b = sorted(map(tuple, salted_join(fact, dim, "k").collect()))
    assert a == b


def test_salted_agg_matches_plain(spark):
    fact = _skewed_fact(spark)
    plain = fact.groupBy("k").agg(
        F.sum("v").alias("sv"),
        F.count("*").alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    salted = salted_agg(
        fact, "k",
        {"sv": "sum:v", "n": "count:*", "mn": "min:v", "mx": "max:v"},
        buckets=16,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select("k", "sv", "n", "mn", "mx").collect())
    )


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    fact, dim = _skewed_fact(spark), _dim(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")
