"""Mutation-log semantics parity (reference M1/M2/R11, SURVEY.md §5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.mutations import (
    MutationLog,
    apply_mutations,
)
from distributed_vector_search_system_spark.schemas import (
    MUTATIONS_SCHEMA,
    VECTORS_SCHEMA,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, [1.0, 1.0], 10), (2, [2.0, 2.0], 20), (3, [3.0, 3.0], 30)],
        schema=VECTORS_SCHEMA,
    )


def _log(spark, entries):
    return spark.createDataFrame(entries, schema=MUTATIONS_SCHEMA)


def _snap(df):
    return {r["vec_id"]: (tuple(r["embedding"]), r["label"]) for r in df.collect()}


def test_upsert_overwrites_base(spark):
    """Upsert = delete-then-insert (vector_shard.cc:46-57)."""
    log = _log(spark, [(1, "upsert", 2, None, [9.0, 9.0], 99)])
    got = _snap(apply_mutations(_base(spark), log))
    assert got[2] == ((9.0, 9.0), 99)
    assert set(got) == {1, 2, 3}


def test_delete_removes_and_absent_is_noop(spark):
    """Delete of absent id returns false/no-op (vector_shard.cc:59-70)."""
    log = _log(
        spark,
        [(1, "delete", 3, None, None, None), (2, "delete", 777, None, None, None)],
    )
    got = _snap(apply_mutations(_base(spark), log))
    assert set(got) == {1, 2}


def test_last_writer_wins_within_log(spark):
    """Replay applies entries in seq order (raft_state.cc:416-459)."""
    log = _log(
        spark,
        [
            (1, "upsert", 5, None, [1.0, 0.0], 1),
            (2, "upsert", 5, None, [2.0, 0.0], 2),
            (3, "delete", 5, None, None, None),
            (4, "upsert", 5, None, [4.0, 0.0], 4),
        ],
    )
    got = _snap(apply_mutations(_base(spark), log))
    assert got[5] == ((4.0, 0.0), 4)


def test_delete_after_upsert_wins(spark):
    log = _log(
        spark,
        [(1, "upsert", 1, None, [8.0, 8.0], 8), (2, "delete", 1, None, None, None)],
    )
    got = _snap(apply_mutations(_base(spark), log))
    assert 1 not in got


def test_replay_idempotent(spark):
    """Applying the same log twice == once (safe foreachBatch retries)."""
    log = _log(
        spark,
        [(1, "upsert", 2, None, [9.0, 9.0], 99), (2, "delete", 3, None, None, None)],
    )
    once = apply_mutations(_base(spark), log)
    twice = apply_mutations(once, log)
    assert _snap(once) == _snap(twice)


def test_mutation_log_class(spark):
    ml = MutationLog(spark, dim=2)
    ml.upsert(7, [7.0, 7.0], label=7)
    ml.delete(1)
    v0 = ml.version
    got = _snap(ml.compact_into(_base(spark)))
    assert set(got) == {2, 3, 7}
    ml.upsert(8, [8.0, 8.0])
    assert ml.version == v0 + 1  # version bump = cache invalidation signal


def test_dimension_validation(spark):
    """M3 dimension check (shard_manager.cc:86-88)."""
    ml = MutationLog(spark, dim=2)
    with pytest.raises(ValueError):
        ml.upsert(1, [1.0, 2.0, 3.0])


def test_compaction_partition_count_sane(spark):
    """Compaction output should not explode partitions (scale hygiene)."""
    base = _base(spark).repartition(4)
    log = _log(spark, [(1, "upsert", 9, None, [1.0, 1.0], 1)])
    out = apply_mutations(base, log)
    assert out.rdd.getNumPartitions() <= 2 * max(
        4, int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
