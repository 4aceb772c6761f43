"""Scale-path mechanics: bucketed co-partitioned joins (the 100 TB layout
for the mutation merge) and watermark late-data semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.streaming.windows import (
    tumbling_window_agg,
)
from distributed_vector_search_system_spark.tables import load_table


def test_bucketed_join_needs_no_exchange(spark, sf_smoke):
    """Two tables bucketed on the join key must sort-merge join with ZERO
    Exchange nodes — the layout that lets compact() fold a 100 TB base
    without shuffling it."""
    emb = load_table(spark, sf_smoke, "embeddings")
    spark.sql("DROP TABLE IF EXISTS vec_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS vec_bucketed_b")
    (emb.write.bucketBy(8, "vec_id").sortBy("vec_id")
        .mode("overwrite").saveAsTable("vec_bucketed_a"))
    (emb.select("vec_id", "label").write.bucketBy(8, "vec_id").sortBy("vec_id")
        .mode("overwrite").saveAsTable("vec_bucketed_b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("vec_bucketed_a").join(
            spark.table("vec_bucketed_b").withColumnRenamed("label", "label2"),
            "vec_id",
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == emb.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS vec_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS vec_bucketed_b")


def test_watermark_drops_late_events(spark, tmp_path):
    """An event older than the watermark must be excluded from its
    (already-finalized) window under append mode."""
    def ev(eid, hh, mm):
        return (eid, datetime.datetime(2024, 1, 1, hh, mm), 1, "click", 1.0)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "late")
    ckpt = str(tmp_path / "ckpt")

    emitted: list = []

    def run_once() -> None:
        stream = (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .parquet(f"{src}/*.parquet")
        )
        out = tumbling_window_agg(stream, window_duration="5 minutes", watermark="1 minute")
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, bid: emitted.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: two on-time rows in [10:00, 10:05) + one at 10:30 that pushes
    # the committed watermark past the window end
    spark.createDataFrame([ev(1, 10, 0), ev(2, 10, 1), ev(3, 10, 30)], schema) \
        .coalesce(1).write.parquet(f"{src}/a.parquet")
    run_once()

    # run 2 (same checkpoint → watermark 10:29 restored): a late row for
    # the finalized window (must be dropped) + a fresh row
    spark.createDataFrame([ev(4, 10, 2), ev(5, 10, 31)], schema) \
        .coalesce(1).write.parquet(f"{src}/b.parquet")
    run_once()

    rows = {
        r["window_start"].strftime("%H:%M"): r["n_events"] for r in emitted
    }
    # the 10:00 window finalized with ONLY the two on-time rows; event 4
    # (10:02, arriving after the watermark passed 10:05) was dropped
    assert rows.get("10:00") == 2, rows


def test_shard_partition_pruning(spark, sf_smoke, tmp_path):
    """M3 shard routing at rest: on a shard-partitioned snapshot, a
    shard-routed search must prune to that shard's files (PartitionFilters
    in the scan; only one shard's rows read)."""
    from distributed_vector_search_system_spark.sources.parquet import (
        read_vectors,
        write_vectors,
    )

    emb = load_table(spark, sf_smoke, "embeddings").withColumn(
        "shard_id", (F.col("vec_id") % 6).cast("string")
    )
    path = str(tmp_path / "sharded")
    write_vectors(emb, path)

    routed = read_vectors(spark, path).filter(F.col("shard_id") == "2")
    plan = routed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("shard_id" in l for l in pf), plan
    assert routed.count() == emb.filter(F.col("shard_id") == "2").count()
