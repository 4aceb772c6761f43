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

Reader/crash safety: all three directories live under a numbered
*generation* dir (``gen-000000/…``) named by a one-line ``MANIFEST``
pointer file at the store root.  ``compact()`` writes the folded base
into the NEXT generation and only then atomically swaps the manifest
(`os.replace` of a file — atomic on POSIX), so a reader that resolved
the manifest before the swap keeps scanning the old generation's
intact files, a reader after it sees the compacted snapshot, and a
crash mid-compact leaves the manifest — and therefore every reader —
on the old, complete generation.  Old generations are GC'd lazily
(the previous one is kept one cycle for in-flight readers).  This is
the same manifest-pointer commit protocol Iceberg/Delta use for
table snapshots.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.distance import squared_l2
from ..operators.clustering import nearest_centroid_expr
from ..operators.knn import merge_topk
from ..operators.mutations import DELETE, UPSERT


class IvfIndexStore:
    """Paths + centroids of one persisted merge-on-read IVF index.

    ``max_cell_rows`` (optional) arms automatic skew maintenance: every
    ``compact()`` consults the folded base's per-cell counts and splits
    any cell above the bound (see :meth:`compact`).  Because auto-splits
    evolve the centroid list, each generation persists its own
    ``centroids.json`` alongside the data; reopen a store with
    :meth:`open` to pick up the committed list."""

    def __init__(
        self,
        root: str,
        centroids: list[list[float]],
        *,
        max_cell_rows: int | None = None,
    ):
        self.root = root
        self.centroids = centroids
        self.max_cell_rows = max_cell_rows

    @classmethod
    def open(cls, root: str, *, max_cell_rows: int | None = None):
        """Reattach to an existing store: resolve the manifest and load
        the committed generation's persisted centroid list (required —
        a store that auto-splits cannot be correctly reopened with a
        stale constructor-supplied list: probes would prune away the
        appended sub-cells)."""
        store = cls(root, [], max_cell_rows=max_cell_rows)
        cents = store._read_centroids(store._current_gen())
        if cents is None:
            raise FileNotFoundError(
                f"no centroids.json under {root}/{store._current_gen()}; "
                "stores created before centroid persistence must be "
                "constructed with the explicit centroid list"
            )
        store.centroids = cents
        return store

    # -- per-generation centroid persistence ---------------------------------

    def _centroids_file(self, gen: str) -> str:
        return os.path.join(self.root, gen, "centroids.json")

    def _write_centroids(self, gen: str, cents: list[list[float]]) -> None:
        import json

        os.makedirs(os.path.join(self.root, gen), exist_ok=True)
        tmp = self._centroids_file(gen) + ".tmp"
        with open(tmp, "w", encoding="ascii") as f:
            json.dump(cents, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._centroids_file(gen))

    def _read_centroids(self, gen: str) -> list[list[float]] | None:
        import json

        try:
            with open(self._centroids_file(gen), encoding="ascii") as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # -- generation manifest ------------------------------------------------

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST")

    def _current_gen(self) -> str:
        """Resolve the committed generation; absent manifest = gen 0
        (pre-init or legacy store)."""
        try:
            with open(self._manifest, encoding="ascii") as f:
                return f.read().strip()
        except FileNotFoundError:
            return "gen-000000"

    def _commit_gen(self, gen: str) -> None:
        """Atomically point the manifest at ``gen`` (write-temp + rename:
        readers see either the old pointer or the new one, never a
        partial file)."""
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest + ".tmp"
        with open(tmp, "w", encoding="ascii") as f:
            f.write(gen + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest)

    def _snapshot_paths(self) -> tuple[str, str, str]:
        """(base, delta, muts) of the CURRENT generation, resolved ONCE —
        callers use one snapshot for a whole read/append so a concurrent
        manifest swap can't mix generations mid-operation."""
        d = os.path.join(self.root, self._current_gen())
        return (
            os.path.join(d, "base"),
            os.path.join(d, "delta"),
            os.path.join(d, "muts"),
        )

    def generations(self) -> list[str]:
        """On-disk generation names, oldest first (current + the
        just-superseded one kept a cycle for in-flight readers)."""
        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(n for n in names if n.startswith("gen-"))

    def at(self, generation: str):
        """READ-ONLY view pinned to ``generation`` — the manifest-swap
        reader-safety contract surfaced as time travel (same contract
        as ``PostingIndexStore.at``): reads resolve through the pin,
        writes raise, and GC is unaffected (a pin older than one
        compaction cycle may vanish like any in-flight reader)."""
        import copy

        if generation not in self.generations():
            raise ValueError(
                f"unknown generation {generation!r}; on disk: "
                f"{self.generations()}"
            )
        view = copy.copy(self)
        view._current_gen = lambda: generation  # shadows the method
        # a pinned reader must probe with the PINNED generation's
        # centroid list (auto-splits may have evolved the live one)
        pinned_cents = self._read_centroids(generation)
        if pinned_cents is not None:
            view.centroids = pinned_cents

        def _read_only(*_a, **_kw):
            raise ValueError("generation-pinned view is read-only")

        for name in ("init_base", "append_batch", "compact", "_commit_gen",
                     "streaming_sink"):
            if hasattr(view, name):
                setattr(view, name, _read_only)
        return view

    # Path views of the current generation (resolved per access) — handy
    # for tests/tooling; read paths internally use _snapshot_paths().
    @property
    def base(self) -> str:
        return self._snapshot_paths()[0]

    @property
    def delta(self) -> str:
        return self._snapshot_paths()[1]

    @property
    def muts(self) -> str:
        return self._snapshot_paths()[2]

    # -- write path ---------------------------------------------------------

    def init_base(self, vectors: DataFrame, *, vector_col: str = "embedding") -> None:
        """One-time base build: cell-partitioned snapshot at seq 0."""
        from ..sources.ivf_index import write_ivf_index

        gen = "gen-000000"
        write_ivf_index(
            vectors.withColumn("seq", F.lit(0).cast("long")),
            os.path.join(self.root, gen, "base"),
            self.centroids,
            vector_col=vector_col,
        )
        self._write_centroids(gen, [list(map(float, c)) for c in self.centroids])
        self._commit_gen(gen)

    def append_batch(self, batch: DataFrame, *, vector_col: str = "embedding") -> None:
        """Fold one mutation micro-batch in: O(batch), never O(index).

        Upserts land in ``delta/`` under their (possibly new) cell;
        every mutation lands in ``muts/`` as an (id, seq, op) arbiter
        row.  Both writes are appends of batch-sized data."""
        _, delta, muts = self._snapshot_paths()
        ups = batch.filter(F.col("op") == UPSERT)
        if ups.limit(1).count() > 0:
            assigned = ups.withColumn(
                "cell_id", nearest_centroid_expr(F.col(vector_col), self.centroids)
            )
            (
                assigned.select("vec_id", vector_col, "label", "seq", "cell_id")
                .write.mode("append")
                .partitionBy("cell_id")
                .parquet(delta)
            )
        (
            batch.select("vec_id", "seq", "op")
            .write.mode("append")
            .parquet(muts)
        )

    def delete_where(self, spark: SparkSession, predicate, *, seq: int | None = None) -> int:
        """Bulk tombstone sweep — retention windows, GDPR erasure,
        policy deletes (``label``-class removal) in ONE O(matching)
        append, no data rewrite.

        The predicate (Column or SQL string over the live row schema
        ``vec_id, embedding, label, cell_id``) is evaluated against the
        CURRENT folded view — exactly what a STRONG read serves — so a
        sweep deletes precisely the rows a reader would have seen,
        including delta rows a compaction hasn't folded yet.  Matching
        ids get one ``delete`` arbiter row each; physical removal
        happens at the next ``compact()``, identical to per-id deletes.

        All tombstones share one sweep seq (current max + 1 by
        default): the LWW arbiter compares seqs within an id only, so
        a shared seq is safe, and it keeps the sweep a single tiny
        append.  Callers integrating with an engine's leader-ordered
        log should pass that log's next ``seq`` explicitly so later
        per-id mutations stay ordered after the sweep.

        Returns the number of ids tombstoned (0 = no match, no write).
        """
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        if seq is None:
            arb = self._mutation_arbiter(spark, self._snapshot_paths()[2])
            if arb is None:
                seq = 1
            else:
                row = arb.agg(F.max("_max_seq").alias("m")).collect()[0]
                seq = int(row["m"] or 0) + 1
        matched = self.live_rows(spark).filter(pred).select("vec_id")
        _, _, muts = self._snapshot_paths()
        # pin the matched set BEFORE counting/writing: the lineage reads
        # the muts directory the append below mutates, so an un-pinned
        # plan re-executed by a task retry would scan a directory being
        # written, and count vs written rows would come from two
        # separate executions (ADVICE r09)
        tomb = matched.select(
            "vec_id",
            F.lit(int(seq)).cast("long").alias("seq"),
            F.lit(DELETE).alias("op"),
        ).localCheckpoint()
        # one count, one append; the count is also the no-op guard (an
        # empty append would still create parquet part files)
        n = tomb.count()
        if n:
            tomb.write.mode("append").parquet(muts)
        return n

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

    def _mutation_arbiter(self, spark: SparkSession, muts_path: str) -> DataFrame | None:
        """(vec_id, max seq) over all mutations, or None if no mutations
        yet.  One row per mutated id — broadcastable at any corpus size
        where mutations ≪ corpus."""
        from pyspark.errors import AnalysisException

        try:
            muts = spark.read.parquet(muts_path)
        except AnalysisException:  # no mutations appended yet
            return None
        return muts.groupBy("vec_id").agg(F.max("seq").alias("_max_seq"))

    def _delta_backlog_small(self, spark: SparkSession, delta_path: str) -> bool:
        """Cap guard for the delta-key broadcast in :meth:`live_rows`
        (ADVICE r10): with ``cells=None`` and a long-uncompacted
        streaming delta the (vec_id, seq) broadcast is unbounded, so
        the anti-join shape is only taken while the backlog is small.
        Same discipline as the posting store's touched-id guard
        (``MutablePostingIndexStore.TOUCHED_BROADCAST_CAP``): a local
        size probe first — delta rows carry the full embedding, so
        64 MB of parquet cannot hold anywhere near the row cap and
        the probe costs no Spark job — then a metadata count only when
        the directory is big or remote."""
        from ..sources.posting_index import MutablePostingIndexStore as _P

        try:
            total = 0
            # delta/ is partitioned by cell_id — walk the subdirs
            for dirpath, _dirs, files in os.walk(delta_path):
                for fname in files:
                    total += os.path.getsize(os.path.join(dirpath, fname))
            if total < _P._TOUCHED_SIZE_FAST_PATH:
                return True
        except OSError:
            pass  # remote path: fall through to the count
        return (
            spark.read.parquet(delta_path).count() <= _P.TOUCHED_BROADCAST_CAP
        )

    def live_rows(
        self, spark: SparkSession, *, cells: list[int] | None = None
    ) -> DataFrame:
        """The current (id, embedding, label, cell_id) state, optionally
        restricted to ``cells`` — both base and delta scans partition-
        prune on ``cell_id IN (...)``, and LWW arbitration joins against
        the (small, broadcast) mutation arbiter.  The generation is
        resolved once up front: the whole read is one snapshot."""
        base_path, delta_path, muts_path = self._snapshot_paths()
        base = spark.read.parquet(base_path)
        if cells is not None:
            base = base.filter(F.col("cell_id").isin(cells))
        from pyspark.errors import AnalysisException

        try:
            delta = spark.read.parquet(delta_path)
            if cells is not None:
                delta = delta.filter(F.col("cell_id").isin(cells))
            # redelivered-batch duplicates collapse WITHOUT an exchange
            # over the probed-cell mass (round 10, the posting/sparse
            # stores' single-scan discipline): in-delta duplicates
            # dedup at batch size, and a base row whose (vec_id, seq)
            # was re-appended to delta (a redelivered pre-compact
            # batch) anti-joins away against the broadcast delta keys
            # — map-side; base rows themselves are written once and
            # cannot duplicate.
            delta_d = delta.select(
                "vec_id", "embedding", "label", "seq", "cell_id"
            ).dropDuplicates(["vec_id", "seq"])
            base_sel = base.select(
                "vec_id", "embedding", "label", "seq", "cell_id"
            )
            if self._delta_backlog_small(spark, delta_path):
                rows = base_sel.join(
                    F.broadcast(delta_d.select("vec_id", "seq")),
                    ["vec_id", "seq"],
                    "left_anti",
                ).unionByName(delta_d)
            else:
                # oversized backlog (compaction cadence has failed):
                # fall back to the shuffle dedup over the union, which
                # degrades gracefully instead of building an unbounded
                # driver broadcast (ADVICE r10)
                rows = base_sel.unionByName(delta_d).dropDuplicates(
                    ["vec_id", "seq"]
                )
        except AnalysisException:  # no delta appended yet
            rows = base.select("vec_id", "embedding", "label", "seq", "cell_id")
        arb = self._mutation_arbiter(spark, muts_path)
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
        where=None,
    ) -> DataFrame:
        """Partition-pruned IVF probe over base+delta with LWW merge —
        the same probe shape as sources.ivf_index.search_ivf_index, but
        correct under un-compacted streaming mutations.

        ``where`` (Column or SQL string): metadata pre-filter on the
        LIVE state (applied after LWW arbitration, so a predicate can
        never resurrect a superseded row; Catalyst still pushes simple
        stored-column predicates into both pruned scans).  Same
        filtered-search contract as ``search_ivf_index(where=)``."""
        from ..sources.ivf_index import _probe_cells_expr

        probes = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vector_col).alias("_qv"),
            F.explode(
                _probe_cells_expr(query_vector_col, self.centroids, n_probe)
            ).alias("_probe"),
        )
        # distinct cell ids: bounded by len(self.centroids), never
        # n_probe x #queries (see sources/ivf_index.search_ivf_index)
        cells = sorted({r["_probe"] for r in probes.select("_probe").distinct().collect()})
        live = self.live_rows(spark, cells=cells)
        if where is not None:
            live = live.filter(F.expr(where) if isinstance(where, str) else where)
        scored = live.join(
            F.broadcast(probes), live["cell_id"] == probes["_probe"]
        ).select(
            "query_id",
            F.col("vec_id").alias("id"),
            squared_l2(F.col("embedding"), F.col("_qv")).alias("distance"),
        )
        return merge_topk(scored, k)

    # -- maintenance --------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        *,
        max_cell_rows: int | None = None,
        split_factor: int = 2,
    ) -> None:
        """Fold delta+muts into the NEXT generation's base, then commit
        it with an atomic manifest swap.  Net state is unchanged
        (live_rows before == base rows after); amortized cost, run off
        the write path.

        **Skew maintenance at compaction cadence** (VERDICT r08 item 4):
        when ``max_cell_rows`` — the argument, or the store-level
        default armed at construction — is set, the freshly folded base
        is checked for hot cells and any cell above the bound is split
        via :func:`sources.ivf_index.split_hot_cells` BEFORE the
        manifest swap.  Because the split rewrites partitions of the
        not-yet-committed generation, the offline-maintenance window
        that standalone ``split_hot_cells`` requires does not apply:
        readers stay on the old, intact generation throughout, and a
        crash mid-split leaves the manifest untouched (the half-split
        next-gen dir is overwritten by the next compact).  The evolved
        centroid list is persisted in the new generation's
        ``centroids.json`` before the swap, so the new cells survive a
        process restart (``open()`` reads them back); the in-memory
        ``self.centroids`` is updated only after the commit.

        Safety: the old generation's files are untouched until after the
        swap, so concurrent ``live_rows``/``search`` calls (which resolve
        the manifest once per read) always scan a complete snapshot —
        old or new, never a mix — and a crash at ANY point leaves the
        manifest on the old, intact generation (a half-written next-gen
        dir is simply overwritten by the next compact).  Only the
        single-writer contract (one compactor/appender) is assumed;
        readers need no coordination."""
        cur = self._current_gen()
        nxt = "gen-%06d" % (int(cur.rsplit("-", 1)[1]) + 1)
        live = self.live_rows(spark).withColumn("seq", F.lit(0).cast("long"))
        nxt_base = os.path.join(self.root, nxt, "base")
        (
            live.select("vec_id", "embedding", "label", "seq", "cell_id")
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(nxt_base)
        )
        new_cents = [list(map(float, c)) for c in self.centroids]
        bound = max_cell_rows if max_cell_rows is not None else self.max_cell_rows
        if bound is not None:
            from ..sources.ivf_index import split_hot_cells

            new_cents = split_hot_cells(
                spark, nxt_base, new_cents,
                max_rows=bound, factor=split_factor,
            )
        self._write_centroids(nxt, new_cents)
        self._commit_gen(nxt)
        self.centroids = new_cents
        self._gc_generations(keep={cur, nxt})

    def _gc_generations(self, *, keep: set[str]) -> None:
        """Delete generation dirs not in ``keep``.  The just-replaced
        generation stays one cycle for in-flight readers; anything older
        has had a full compaction cycle to drain."""
        import shutil

        for name in os.listdir(self.root):
            if name.startswith("gen-") and name not in keep:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
