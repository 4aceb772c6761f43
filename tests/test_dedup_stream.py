"""Streaming dedup gate (streaming/dedup_stream.py): watermark-bounded
first-occurrence-per-key over a file-source stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.streaming.dedup_stream import (
    content_key,
    dedup_stream_exact,
    dedup_stream_fingerprint,
)

_SCHEMA = "doc_id long, text string, ts timestamp"


def _rows(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_exact_dedup_suppresses_duplicates_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1); a batch-2 duplicate of a
    batch-1 document must be suppressed by the cross-batch state."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    batch1 = [
        (1, "the quick brown fox", t0),
        (2, "a different document", t0),
        (3, "the quick brown fox", t0),  # in-batch duplicate of 1
    ]
    batch2 = [
        (4, "the quick brown fox", t0 + dt.timedelta(minutes=1)),  # dup of 1
        (5, "a brand new document", t0 + dt.timedelta(minutes=1)),
    ]
    src = str(tmp_path / "docs")
    _rows(spark, batch1).coalesce(1).write.mode("append").parquet(src)
    _rows(spark, batch2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_stream_exact(stream, delay="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM dedup_out").collect()
    # 3 distinct contents; exactly one row per content hash survived
    keys = [r.content_key for r in got]
    assert len(keys) == 3 and len(set(keys)) == 3
    texts = {r.text for r in got}
    assert texts == {
        "the quick brown fox",
        "a different document",
        "a brand new document",
    }


def test_stream_dedup_agrees_with_batch_distinct(spark, tmp_path):
    """Single horizon covering all data: the streaming gate must keep
    exactly one row per content key — same cardinality as a batch
    dropDuplicates on the key."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, f"doc {i % 7}", t0 + dt.timedelta(seconds=i)) for i in range(40)
    ]
    src = str(tmp_path / "docs2")
    _rows(spark, rows).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        dedup_stream_exact(stream, delay="1 day")
        .writeStream.format("memory")
        .queryName("dedup_card")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_stream = spark.sql("SELECT COUNT(*) AS n FROM dedup_card").first().n
    n_batch = (
        _rows(spark, rows)
        .withColumn("k", content_key())
        .dropDuplicates(["k"])
        .count()
    )
    assert n_stream == n_batch == 7


def test_fingerprint_gate_collapses_near_dups(spark, tmp_path):
    """Keying on a map-side fingerprint (here: normalized token prefix)
    collapses near-duplicates that differ in whitespace/case."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "The Quick  Brown Fox", t0),
        (2, "the quick brown fox", t0),  # same normalized form
        (3, "something else entirely", t0),
    ]
    src = str(tmp_path / "docs3")
    _rows(spark, rows).coalesce(1).write.parquet(src)

    fp = F.sha2(
        F.concat_ws(" ", F.split(F.lower(F.trim(F.col("text"))), r"\s+")), 256
    )
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        dedup_stream_fingerprint(stream, fp, delay="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_fp")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM dedup_fp").collect()
    assert len(got) == 2
    assert {r.doc_id for r in got} <= {1, 2, 3}
