"""Bucketed co-located compaction: the 100 TB mutation-merge story.

Asserts the PHYSICAL claim (zero Exchange in the log-vs-base merge when
both sides are bucketed on vec_id) and value-equality with the
unbucketed path on the same inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.mutations import (
    apply_mutations,
)
from distributed_vector_search_system_spark.schemas import MUTATIONS_SCHEMA
from distributed_vector_search_system_spark.sources.bucketed import (
    compact_bucketed,
    write_bucketed,
)
from distributed_vector_search_system_spark.tables import load_table

BUCKETS = 8  # == the test session's spark.sql.shuffle.partitions, so a
# shuffled side stays compatible with a bucketed side


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    base = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    log_rows = [
        (1, "upsert", 3, None, [0.5] * 64, 999),
        (2, "delete", 7, None, None, None),
        (3, "upsert", 100001, None, [0.25] * 64, 7),   # new id
        (4, "upsert", 3, None, [0.75] * 64, 1000),     # LWW over seq 1
        (5, "delete", 999999, None, None, None),       # absent → no-op
    ]
    log = spark.createDataFrame(log_rows, schema=MUTATIONS_SCHEMA)
    write_bucketed(base, "bkt_base", buckets=BUCKETS)
    write_bucketed(log, "bkt_log", buckets=BUCKETS)
    yield base, log
    spark.sql("DROP TABLE IF EXISTS bkt_base")
    spark.sql("DROP TABLE IF EXISTS bkt_log")


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange ")


def test_bucketed_compaction_no_exchange(spark, bucketed_tables):
    """Co-bucketed base+log: the LWW window, the anti-join, and the
    insert union must all reuse the storage partitioning — zero
    exchanges.  The unbucketed twin of the same plan needs ≥2."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = compact_bucketed(spark, "bkt_base", "bkt_log")
        base, log = bucketed_tables
        plain = apply_mutations(base, log)
        assert _n_exchanges(bucketed) == 0, (
            bucketed._jdf.queryExecution().executedPlan().toString()
        )
        assert _n_exchanges(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_compaction_matches_unbucketed(spark, bucketed_tables):
    base, log = bucketed_tables
    want = {
        r["vec_id"]: (r["label"], tuple(round(x, 6) for x in r["embedding"]))
        for r in apply_mutations(base, log).collect()
    }
    got = {
        r["vec_id"]: (r["label"], tuple(round(x, 6) for x in r["embedding"]))
        for r in compact_bucketed(spark, "bkt_base", "bkt_log").collect()
    }
    assert got == want
    assert got[3][0] == 1000 and 7 not in got and got[100001][0] == 7


def test_registry_bucketed_compaction_row_never_shuffles(spark, sf_smoke):
    """The registered mutations_compact_bucketed query — not just the raw
    mechanism — must never hash-repartition the base: no shuffle
    Exchange under default conf (a BroadcastExchange of the tiny log is
    the right small-input plan), and zero Exchanges of ANY kind in the
    100 TB shape where the log side can't broadcast."""
    from distributed_vector_search_system_spark import registry

    q = registry.extra_queries()["mutations_compact_bucketed"]
    plan = (
        q(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = q(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange ") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
