"""Streaming semantics: ordered mutation replay via foreachBatch (R11),
idempotent redelivery, and window builders agreeing between batch and
streaming execution."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.schemas import (
    MUTATIONS_SCHEMA,
    VECTORS_SCHEMA,
)
from distributed_vector_search_system_spark.streaming.mutation_stream import (
    SnapshotStore,
    apply_mutation_stream,
)
from distributed_vector_search_system_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from distributed_vector_search_system_spark.tables import load_table


def _base(spark):
    return spark.createDataFrame(
        [(1, [1.0, 1.0], 10), (2, [2.0, 2.0], 20)], schema=VECTORS_SCHEMA
    )


def test_mutation_stream_ordered_apply(spark, tmp_path):
    """Stream a mutation log from parquet files; the folded snapshot must
    equal the batch compaction of the same log (R11 parity)."""
    log_rows = [
        (1, "upsert", 3, None, [3.0, 3.0], 30),
        (2, "upsert", 1, None, [9.0, 9.0], 90),
        (3, "delete", 2, None, None, None),
        (4, "delete", 999, None, None, None),  # absent → no-op
        (5, "upsert", 1, None, [7.0, 7.0], 70),  # LWW over seq 2
    ]
    src = str(tmp_path / "mlog")
    spark.createDataFrame(log_rows, schema=MUTATIONS_SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(MUTATIONS_SCHEMA).parquet(src)
    store = SnapshotStore(_base(spark))
    batches = []
    q = apply_mutation_stream(
        stream,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_batch=lambda bid, ver: batches.append((bid, ver)),
    )
    q.awaitTermination(120)
    got = {r["vec_id"]: (tuple(r["embedding"]), r["label"]) for r in store.current.collect()}
    assert got == {1: ((7.0, 7.0), 70), 3: ((3.0, 3.0), 30)}
    assert store.version >= 1
    assert batches


def test_mutation_replay_idempotent_redelivery(spark):
    """Applying the same micro-batch twice must not change the snapshot
    (foreachBatch retry safety)."""
    log = spark.createDataFrame(
        [(1, "upsert", 5, None, [5.0, 5.0], 50), (2, "delete", 1, None, None, None)],
        schema=MUTATIONS_SCHEMA,
    )
    store = SnapshotStore(_base(spark))
    store.apply(log)
    once = sorted((r["vec_id"], r["label"]) for r in store.current.collect())
    store.apply(log)  # redelivery
    twice = sorted((r["vec_id"], r["label"]) for r in store.current.collect())
    assert once == twice == [(2, 20), (5, 50)]


def test_mutation_stream_crash_recovery_exactly_once(spark, tmp_path):
    """R11 under failure (VERDICT r03 item 7): the stream dies MID-BATCH —
    after the batch's side effects (snapshot fold + persist) ran but
    before foreachBatch returned, so the checkpoint's commit log never
    records the batch.  A restarted query must redeliver exactly that
    batch, and because ``apply_mutations`` is seq-keyed LWW the reapply
    over the already-folded persisted snapshot must be a no-op — the
    effective result is exactly-once, verified against the one-shot
    batch compaction of the full log."""
    import os

    from pyspark.errors import StreamingQueryException

    from distributed_vector_search_system_spark.operators.mutations import (
        apply_mutations,
    )

    src = str(tmp_path / "mlog")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    # three files → three micro-batches under maxFilesPerTrigger=1, with
    # LWW chains crossing batch boundaries (seq 4 overwrites seq 1,
    # seq 5 overwrites seq 2) so replay order genuinely matters
    batches = [
        [(1, "upsert", 3, None, [3.0, 3.0], 30), (2, "upsert", 1, None, [9.0, 9.0], 90)],
        [(3, "delete", 2, None, None, None), (4, "upsert", 3, None, [8.0, 8.0], 80)],
        [(5, "upsert", 1, None, [7.0, 7.0], 70), (6, "delete", 999, None, None, None)],
    ]
    for i, rows in enumerate(batches):
        d = f"{src}/b{i}.parquet"
        spark.createDataFrame(rows, schema=MUTATIONS_SCHEMA).coalesce(1).write.parquet(d)
        # pin distinct mtimes so the file source's oldest-first ordering
        # is deterministic regardless of write speed
        for root, _, files in os.walk(d):
            for f_ in files:
                os.utime(os.path.join(root, f_), (1_000_000 + 100 * i,) * 2)

    _base(spark).write.parquet(snap)

    def run(crash_at: int | None) -> None:
        store = SnapshotStore(spark.read.parquet(snap))

        def persist_then_maybe_crash(bid: int, ver: int) -> None:
            store.current.write.mode("overwrite").parquet(snap)
            if bid == crash_at:
                raise RuntimeError("injected crash after side effects")

        stream = (
            spark.readStream.schema(MUTATIONS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*.parquet")
        )
        q = apply_mutation_stream(
            stream, store, checkpoint_dir=ckpt, on_batch=persist_then_maybe_crash
        )
        q.awaitTermination(120)

    try:
        run(crash_at=1)
        raise AssertionError("injected crash did not propagate")
    except StreamingQueryException:
        pass
    run(crash_at=None)  # restart: batch 1 is redelivered, then batch 2 runs

    full_log = spark.createDataFrame(
        [r for b in batches for r in b], schema=MUTATIONS_SCHEMA
    )
    want = {
        r["vec_id"]: (tuple(r["embedding"]), r["label"])
        for r in apply_mutations(_base(spark), full_log).collect()
    }
    got = {
        r["vec_id"]: (tuple(r["embedding"]), r["label"])
        for r in spark.read.parquet(snap).collect()
    }
    assert got == want == {1: ((7.0, 7.0), 70), 3: ((8.0, 8.0), 80)}


def test_tumbling_window_batch_vs_stream(spark, sf_smoke, tmp_path):
    """The same window plan over the events table must produce identical
    results in batch mode and via readStream."""
    events = load_table(spark, sf_smoke, "events")
    batch = tumbling_window_agg(events).collect()

    # materialize with µs timestamps so readStream sees a supported type
    src = str(tmp_path / "events_us")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = tumbling_window_agg(stream, watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM tumbling_test").collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, streamed))


def test_sliding_window_counts(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    total = events.count()
    rows = sliding_window_agg(
        events, window_duration="2 hours", slide_duration="1 hour"
    ).collect()
    # every event lands in exactly 2 sliding windows
    assert sum(r["n_events"] for r in rows) == 2 * total


def test_session_window_matches_sql_sessionization(spark, sf_smoke):
    """Native session_window must find the same session count per user as
    the lag/cumsum SQL formulation (rel_events_sessions oracle)."""
    events = load_table(spark, sf_smoke, "events")
    native = (
        session_window_agg(events, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    events.createOrReplaceTempView("events")
    sql = spark.sql(
        """
        WITH g AS (
          SELECT user_id,
            CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions FROM g GROUP BY user_id
        """
    )
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, sql.collect()))


def test_stateful_fold_matches_batch(spark, sf_smoke, tmp_path):
    """applyInPandasWithState running fold across two micro-batches must
    equal the batch last-event-per-user fold (R11 generalized)."""
    from distributed_vector_search_system_spark.streaming.stateful import (
        running_user_fold,
    )

    events = (
        load_table(spark, sf_smoke, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz").cast("timestamp"))
    )
    # two files → two micro-batches under maxFilesPerTrigger=1
    src = str(tmp_path / "ev")
    half = events.approxQuantile("event_id", [0.5], 0.0)[0]
    events.filter(F.col("event_id") <= half).coalesce(1).write.parquet(f"{src}/a.parquet")
    events.filter(F.col("event_id") > half).coalesce(1).write.parquet(f"{src}/b.parquet")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*.parquet")
    )
    q = (
        running_user_fold(stream)
        .writeStream.format("memory")
        .queryName("user_fold")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # final state per user = the emitted row with the highest n_events
    from pyspark.sql import Window

    emitted = spark.table("user_fold")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_events", "last_event_id", "last_type")
    )

    batch_w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expected = (
        events.withColumn("rn", F.row_number().over(batch_w))
        .withColumn("n_events", F.count("*").over(Window.partitionBy("user_id")))
        .filter("rn = 1")
        .select(
            "user_id",
            "n_events",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["last_event_id"], r["last_type"]) for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], r["last_event_id"], r["last_type"]) for r in expected.collect()}
    assert got == want


def test_transform_with_state_fold_matches_batch(spark, sf_smoke, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) must
    produce the same final per-user fold as the batch computation and as
    the applyInPandasWithState formulation.

    Skipped where google.protobuf is unavailable: Spark's TWS Python
    driver worker needs it for the state-server RPC, and faking the
    operator would prove nothing."""
    import pytest

    from distributed_vector_search_system_spark.streaming.stateful import (
        running_user_fold_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf not installed; transformWithState "
                    "driver worker cannot start in this container")

    events = (
        load_table(spark, sf_smoke, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz").cast("timestamp"))
    )
    src = str(tmp_path / "ev")
    half = events.approxQuantile("event_id", [0.5], 0.0)[0]
    events.filter(F.col("event_id") <= half).coalesce(1).write.parquet(f"{src}/a.parquet")
    events.filter(F.col("event_id") > half).coalesce(1).write.parquet(f"{src}/b.parquet")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*.parquet")
    )
    q = (
        running_user_fold_tws(stream)
        .writeStream.format("memory")
        .queryName("user_fold_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from pyspark.sql import Window

    emitted = spark.table("user_fold_tws")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_events", "last_event_id", "last_type")
    )
    batch_w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expected = (
        events.withColumn("rn", F.row_number().over(batch_w))
        .withColumn("n_events", F.count("*").over(Window.partitionBy("user_id")))
        .filter("rn = 1")
        .select(
            "user_id",
            "n_events",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["last_event_id"], r["last_type"])
           for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], r["last_event_id"], r["last_type"])
            for r in expected.collect()}
    assert got == want


def test_transform_with_state_plan_builds(spark, sf_smoke):
    """Even without the protobuf runtime, the transformWithState plan must
    construct and carry the same output schema as the
    applyInPandasWithState twin (wiring check, no execution)."""
    from distributed_vector_search_system_spark.streaming.stateful import (
        running_user_fold,
        running_user_fold_tws,
    )

    events = (
        load_table(spark, sf_smoke, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    tws = running_user_fold_tws(events)
    aips = running_user_fold(events)
    assert tws.schema == aips.schema
