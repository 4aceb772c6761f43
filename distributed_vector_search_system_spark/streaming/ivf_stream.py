"""Streaming maintenance of the persisted IVF index (merge-on-read).

The reference's write path rewrites the whole index file per mutation
batch (src/index/vector_shard.cc:101-106 save() after every apply) —
O(index) per write.  At 100 TB the index must absorb a mutation stream
in O(Δ): this module keeps the cell-partitioned base index
(sources/ivf_index.py) IMMUTABLE and folds mutations in as deltas,
compacting lazily — the LSM discipline every scale-out vector store
uses, built from three pieces:

- ``base/``   — the cell-partitioned snapshot (write_ivf_index output);
- ``delta/``  — upserts appended per micro-batch, ALSO partitioned by
  ``cell_id`` (the new vector's cell, assigned map-side), so probes
  partition-prune the delta exactly like the base;
- ``muts/``   — one tiny (id, seq, op) row per mutation.  This is the
  read-side LWW arbiter: a base/delta row is alive iff its seq is the
  id's highest mutation seq.  It is small by construction (one row per
  *mutation*, not per vector — at 100 TB it broadcast-joins).

Why the arbiter table: an upsert can MOVE a vector to a different cell
(its embedding changed), and the stale copy lives in a cell the new
version's append never touches.  Pruned searches cannot see that cell's
delta, so the supersede information must travel separately — the same
reason Iceberg/Delta carry equality deletes out-of-band instead of
rewriting data files.

Retry safety: ``foreachBatch`` may redeliver a batch after a crash;
every append is content-keyed by ``(vec_id, seq)`` and the read path
deduplicates on it, so duplicate appends change nothing (same
idempotency contract as streaming/mutation_stream.py — at-least-once
delivery, exactly-once effect).

``compact()`` folds delta+muts into a fresh base (dropping superseded
rows and tombstones) and truncates the logs — amortized O(index),
identical net state by construction (pytest-verified against the batch
``apply_mutations`` oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.distance import squared_l2
from ..operators.clustering import nearest_centroid_expr
from ..operators.knn import merge_topk
from ..operators.mutations import UPSERT


class IvfIndexStore:
    """Paths + centroids of one persisted merge-on-read IVF index."""

    def __init__(self, root: str, centroids: list[list[float]]):
        self.root = root
        self.centroids = centroids
        self.base = os.path.join(root, "base")
        self.delta = os.path.join(root, "delta")
        self.muts = os.path.join(root, "muts")

    # -- write path ---------------------------------------------------------

    def init_base(self, vectors: DataFrame, *, vector_col: str = "embedding") -> None:
        """One-time base build: cell-partitioned snapshot at seq 0."""
        from ..sources.ivf_index import write_ivf_index

        write_ivf_index(
            vectors.withColumn("seq", F.lit(0).cast("long")),
            self.base,
            self.centroids,
            vector_col=vector_col,
        )

    def append_batch(self, batch: DataFrame, *, vector_col: str = "embedding") -> None:
        """Fold one mutation micro-batch in: O(batch), never O(index).

        Upserts land in ``delta/`` under their (possibly new) cell;
        every mutation lands in ``muts/`` as an (id, seq, op) arbiter
        row.  Both writes are appends of batch-sized data."""
        ups = batch.filter(F.col("op") == UPSERT)
        if ups.limit(1).count() > 0:
            assigned = ups.withColumn(
                "cell_id", nearest_centroid_expr(F.col(vector_col), self.centroids)
            )
            (
                assigned.select("vec_id", vector_col, "label", "seq", "cell_id")
                .write.mode("append")
                .partitionBy("cell_id")
                .parquet(self.delta)
            )
        (
            batch.select("vec_id", "seq", "op")
            .write.mode("append")
            .parquet(self.muts)
        )

    def streaming_sink(self, stream: DataFrame, *, checkpoint: str):
        """Attach the appender to a mutation stream via foreachBatch."""

        def _apply(batch: DataFrame, _batch_id: int) -> None:
            self.append_batch(batch)

        return (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- read path ----------------------------------------------------------

    def _mutation_arbiter(self, spark: SparkSession) -> DataFrame | None:
        """(vec_id, max seq) over all mutations, or None if no mutations
        yet.  One row per mutated id — broadcastable at any corpus size
        where mutations ≪ corpus."""
        from pyspark.errors import AnalysisException

        try:
            muts = spark.read.parquet(self.muts)
        except AnalysisException:  # no mutations appended yet
            return None
        return muts.groupBy("vec_id").agg(F.max("seq").alias("_max_seq"))

    def live_rows(
        self, spark: SparkSession, *, cells: list[int] | None = None
    ) -> DataFrame:
        """The current (id, embedding, label, cell_id) state, optionally
        restricted to ``cells`` — both base and delta scans partition-
        prune on ``cell_id IN (...)``, and LWW arbitration joins against
        the (small, broadcast) mutation arbiter."""
        base = spark.read.parquet(self.base)
        if cells is not None:
            base = base.filter(F.col("cell_id").isin(cells))
        from pyspark.errors import AnalysisException

        try:
            delta = spark.read.parquet(self.delta)
            if cells is not None:
                delta = delta.filter(F.col("cell_id").isin(cells))
            rows = base.select("vec_id", "embedding", "label", "seq", "cell_id").unionByName(
                delta.select("vec_id", "embedding", "label", "seq", "cell_id")
            )
        except AnalysisException:  # no delta appended yet
            rows = base.select("vec_id", "embedding", "label", "seq", "cell_id")
        # duplicate appends from redelivered batches collapse here
        rows = rows.dropDuplicates(["vec_id", "seq"])
        arb = self._mutation_arbiter(spark)
        if arb is None:
            return rows.drop("seq")
        # alive iff this physical row carries the id's newest seq (a
        # delete's seq beats every stored row for that id, so deleted ids
        # simply have no surviving physical row)
        return (
            rows.join(F.broadcast(arb), on="vec_id", how="left")
            .filter((F.col("_max_seq").isNull()) | (F.col("seq") == F.col("_max_seq")))
            .drop("seq", "_max_seq")
        )

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int,
        *,
        n_probe: int = 4,
        query_id_col: str = "query_id",
        query_vector_col: str = "qvec",
    ) -> DataFrame:
        """Partition-pruned IVF probe over base+delta with LWW merge —
        the same probe shape as sources.ivf_index.search_ivf_index, but
        correct under un-compacted streaming mutations."""
        from ..sources.ivf_index import _probe_cells_expr

        probes = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vector_col).alias("_qv"),
            F.explode(
                _probe_cells_expr(query_vector_col, self.centroids, n_probe)
            ).alias("_probe"),
        )
        cells = sorted({r["_probe"] for r in probes.select("_probe").distinct().collect()})
        live = self.live_rows(spark, cells=cells)
        scored = live.join(
            F.broadcast(probes), live["cell_id"] == probes["_probe"]
        ).select(
            "query_id",
            F.col("vec_id").alias("id"),
            squared_l2(F.col("embedding"), F.col("_qv")).alias("distance"),
        )
        return merge_topk(scored, k)

    # -- maintenance --------------------------------------------------------

    def compact(self, spark: SparkSession) -> None:
        """Fold delta+muts into a fresh base and truncate the logs.
        Net state is unchanged (live_rows before == base rows after);
        amortized cost, run off the write path."""
        import shutil

        live = self.live_rows(spark).withColumn("seq", F.lit(0).cast("long"))
        # stage next to base (same filesystem) — the write is the action
        # that drains reads from the dirs being replaced
        staged = os.path.join(self.root, "_compact_base")
        (
            live.select("vec_id", "embedding", "label", "seq", "cell_id")
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(staged)
        )
        for p in (self.base, self.delta, self.muts):
            shutil.rmtree(p, ignore_errors=True)
        os.replace(staged, self.base)
