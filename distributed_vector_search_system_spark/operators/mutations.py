"""Mutation log + last-writer-wins compaction.

Reference operators covered (SURVEY.md §2.3, §2.6):

- M1 Upsert (delete-then-insert, LWW by id) — src/index/vector_shard.cc:46-57
- M2 Delete (no-op if absent)               — src/index/vector_shard.cc:59-70
- M3 Shard routing / validation            — src/index/shard_manager.cc:80-103
- R11 ordered state-machine replay          — src/raft/raft_state.cc:416-459

The reference reaches consistency by Raft-replicating a totally-ordered
command log and replaying it deterministically on every node.  Spark has a
single logical writer (the driver), so the total order is simply a
driver-assigned dense ``seq`` column on an append-only mutations
DataFrame; replay is a deterministic fold = last-writer-wins window
compaction.  This is strictly cheaper than the reference's full index
file rewrite per mutation (src/index/vector_shard.cc:101-106) — an
append-only log + periodic compaction.

Scale notes: compaction shuffles by ``vec_id`` once (the window); at
100 TB the base table would be bucketed by ``vec_id`` so the
log-vs-base merge co-partitions and only the (small) log shuffles.
Replays are idempotent — applying the same log twice yields the same
snapshot (seq dedup) — which is what makes streaming foreachBatch
retries safe.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UPSERT = "upsert"
DELETE = "delete"


def apply_mutations(
    base: DataFrame,
    log: DataFrame,
    *,
    id_col: str = "vec_id",
    payload_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Fold an ordered mutation log into a base snapshot (R11 + M1 + M2).

    Semantics (matching the reference exactly):
      - upsert = delete-then-insert: the highest-``seq`` upsert for an id
        wins over the base row and all earlier log entries
        (src/index/vector_shard.cc:46-57 remove_ids + add_with_ids);
      - delete = tombstone: the id disappears if the highest-``seq``
        entry for it is a delete; deleting an absent id is a no-op
        (src/index/vector_shard.cc:59-70);
      - entries apply in ``seq`` order (src/raft/raft_state.cc:416-459
        replays committed entries in index order).

    Implemented as one LWW window over the log + one left anti/union —
    no driver-side iteration, so a 100 TB base with a 1 TB log is two
    shuffles (one of which disappears under bucketing).

    ``payload_cols`` defaults to every non-id base column, so the full
    base schema (including any shard/routing column, reference M3)
    survives compaction; the log must carry the same columns (the
    MUTATIONS_SCHEMA does for shard_id/embedding/label).
    """
    if payload_cols is None:
        payload_cols = tuple(c for c in base.columns if c != id_col)
    missing = [c for c in payload_cols if c not in log.columns]
    if missing:
        raise ValueError(f"mutation log lacks base payload columns: {missing}")
    last = Window.partitionBy(id_col).orderBy(F.col("seq").desc())
    latest = (
        log.withColumn("_rn", F.row_number().over(last))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # Any id with a log entry (upsert or delete) no longer takes its
    # base row — and an anti join is duplicate-insensitive, so the
    # touched-id side reads the RAW log (one column-pruned pass, no LWW
    # window).  Deriving it from ``latest`` instead (rounds ≤13) made
    # the windowed log feed two plan branches, which either re-evaluated
    # the whole log scan + window per branch or forced an eager
    # localCheckpoint job at DataFrame-construction time; with the raw
    # log here, ``latest`` has exactly one consumer (the inserts union)
    # and the plan needs no materialization at all.
    touched = log.select(id_col)
    survivors = base.join(touched, on=id_col, how="left_anti")
    inserts = latest.filter(F.col("op") == UPSERT).select(
        id_col, *[c for c in payload_cols]
    )
    return survivors.select(id_col, *payload_cols).unionByName(inserts)


class MutationLog:
    """Driver-side append-only mutation log with dense ``seq`` assignment.

    The Raft total order (reference RaftLog, include/raft/raft_log.h:11-15,
    contiguity-checked append src/raft/raft_log.cc:36-47) becomes a
    monotonically increasing ``seq`` handed out by the single writer; log
    contiguity holds by construction.
    """

    def __init__(self, spark, *, dim: int | None = None):
        self._spark = spark
        self._seq = itertools.count(1)
        self._entries: list[tuple] = []  # (seq, op, vec_id, shard_id, embedding, label)
        self._dim = dim
        self._version = 0  # snapshot version; bump = cache invalidation (M4)

    @property
    def version(self) -> int:
        return self._version

    @property
    def max_seq(self) -> int:
        """Highest assigned seq (0 if empty) — driver-known, used by the
        engine to remap pushed log seqs onto a store-global monotone
        range (seqs restart at 1 per log instance)."""
        return self._entries[-1][0] if self._entries else 0

    def upsert(self, vec_id: int, embedding: list[float], *, shard_id: str | None = None,
               label: int | None = None) -> None:
        if self._dim is not None and len(embedding) != self._dim:
            # M3 dimension validation (src/index/shard_manager.cc:86-88)
            raise ValueError(f"dimension mismatch: got {len(embedding)}, want {self._dim}")
        self._entries.append(
            (next(self._seq), UPSERT, vec_id, shard_id, [float(x) for x in embedding], label)
        )
        self._version += 1

    def delete(self, vec_id: int, *, shard_id: str | None = None) -> None:
        self._entries.append((next(self._seq), DELETE, vec_id, shard_id, None, None))
        self._version += 1

    def to_df(self) -> DataFrame:
        from ..schemas import MUTATIONS_SCHEMA

        return self._spark.createDataFrame(self._entries, schema=MUTATIONS_SCHEMA)

    def compact_into(self, base: DataFrame) -> DataFrame:
        return apply_mutations(base, self.to_df())
