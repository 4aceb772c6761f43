"""Bucketed snapshot storage — shuffle-free log-vs-base compaction.

The mutation path's scale cost is the compaction shuffle of the BASE
table (operators/mutations.py: "at 100 TB the base table would be
bucketed by ``vec_id`` so the log-vs-base merge co-partitions and only
the (small) log shuffles").  This module makes that claim a tested
mechanism rather than a comment: Spark bucketing (``CLUSTERED BY
(vec_id) INTO n BUCKETS`` parquet tables) persists the hash
partitioning in the table layout, so every downstream operator that
needs ``hashpartitioning(vec_id)`` — the LWW window over the log, the
anti-join against the base, a co-bucketed base⋈log merge — reads the
bucket files directly instead of exchanging 100 TB across the cluster.
``tests/test_bucketed.py`` plan-asserts ZERO Exchange nodes in the
compaction over co-bucketed tables (vs ≥2 unbucketed) and value-equality
with the unbucketed path.

Reference analog: the C++ engine shards vectors by id range and
compacts each shard's log locally (src/index/shard_manager.cc:80-103,
src/index/vector_shard.cc:46-70) — co-located, shuffle-free merge is
the same physical idea expressed in Spark's storage layer.

Bucket count guidance at scale: pick ``buckets`` ≈ cluster cores × 2-4
and keep it EQUAL to ``spark.sql.shuffle.partitions`` where the other
join side arrives from a shuffle — Spark only elides the exchange when
the partitionings are compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.mutations import apply_mutations


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by
    ``bucket_col``.  Bucketing requires the table catalog (saveAsTable);
    plain ``.parquet(path)`` writes cannot record bucket metadata."""
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def compact_bucketed(
    spark: SparkSession, base_table: str, log_table: str, **kwargs
) -> DataFrame:
    """LWW compaction over co-bucketed base + log tables — identical
    semantics to ``apply_mutations`` on any input (it IS apply_mutations);
    with both sides bucketed on the id column the plan needs no exchange."""
    return apply_mutations(spark.table(base_table), spark.table(log_table), **kwargs)
