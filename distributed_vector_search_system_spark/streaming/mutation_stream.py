"""Streaming mutation-log replay (reference R11 under Structured Streaming).

The reference applies committed Raft log entries in index order on every
node (src/raft/raft_state.cc:416-459).  The streaming analog: a mutation
stream consumed with ``foreachBatch``, each micro-batch folded into the
base snapshot **in seq order** via the same last-writer-wins compaction
used in batch (operators/mutations.py) — one code path for both.

Retry safety: foreachBatch may redeliver a batch after failure; because
``apply_mutations`` is idempotent (seq-keyed LWW — replaying the same
entries yields the same snapshot), redelivery is harmless, matching the
reference's at-least-once apply loop.

At scale the snapshot would live in a transactional table format; here we
swap an in-memory/parquet snapshot per batch — the mechanism under test
is ordering + idempotency, not the sink.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators.mutations import apply_mutations


class SnapshotStore:
    """Holds the current compacted snapshot + a monotonically increasing
    version (the version bump doubles as cache invalidation, reference
    M4 shard_manager.cc:90,100-101)."""

    def __init__(self, base: DataFrame):
        self.current = base
        self.version = 0
        self.applied_seqs: int = 0

    def apply(self, log_batch: DataFrame) -> None:
        n = log_batch.count()
        if n == 0:
            return
        self.current = apply_mutations(self.current, log_batch)
        # Materialize: keeps the lineage from growing unboundedly across
        # micro-batches (at scale: write to a table / checkpoint).
        self.current = self.current.localCheckpoint(eager=True)
        self.version += 1
        self.applied_seqs += n


def apply_mutation_stream(
    mutation_stream: DataFrame,
    store: SnapshotStore,
    *,
    checkpoint_dir: str,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Wire a streaming mutations DataFrame into ``store`` via
    foreachBatch, applying entries in seq order within each batch.

    Returns the StreamingQuery (caller manages lifecycle).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ordered = batch_df.orderBy("seq")
        store.apply(ordered)
        if on_batch is not None:
            on_batch(batch_id, store.version)

    return (
        mutation_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
