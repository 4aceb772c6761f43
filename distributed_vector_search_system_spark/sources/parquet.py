"""Vector snapshot persistence (reference S1/S2: FAISS index load/persist,
src/index/vector_shard.cc:30-44,101-106).

The reference rewrites the whole index file after every mutation (O(index)
write amplification).  Here the snapshot is parquet partitioned by
``shard_id``: loads prune to the shards a query touches, writes happen
only at compaction, and at 100 TB the same layout is a bucketed table so
the mutation merge co-partitions without shuffling the base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import assert_vector_dimension


def read_vectors(
    spark: SparkSession,
    path: str,
    *,
    dim: int | None = None,
    validate: bool = False,
    schema=None,
) -> DataFrame:
    """Load a persisted vector snapshot; optionally assert the dimension
    invariant (the reference validates on load, vector_shard.cc:36-38).

    Pass ``schema`` (the writer's StructType) to bypass partition-column
    type inference entirely: inference parses partition VALUES from the
    directory names, so a string shard id '01' becomes int 1 and no
    after-the-fact cast can recover it ('1' ≠ '01', and '0' collides
    with '00').  With an explicit schema the raw directory string is
    interpreted as the declared type directly (ADVICE r03)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if validate and dim is not None:
        assert_vector_dimension(df, dim)
    return df


def write_vectors(
    df: DataFrame,
    path: str,
    *,
    shard_col: str | None = "shard_id",
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if shard_col is not None and shard_col in df.columns:
        w = w.partitionBy(shard_col)
    w.parquet(path)
