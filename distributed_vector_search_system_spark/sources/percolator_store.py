"""Mutable standing-query registry for percolation, round 11.

``operators.percolate`` matches documents against a registry of stored
boolean queries; round 10 took that registry as a plain DataFrame —
static for the life of a stream.  Production percolators (ES's
percolator index, Lucene Monitor's ``register``/``deleteById``)
REGISTER and UNREGISTER alerts continuously, so the registry is the
fifth mutable surface here and gets the same LWW store discipline as
the four document/vector stores (reference parity: the reference's
only mutable state is the vector log it replays,
``src/raft/raft_log.cc`` — the store-family contract generalizes
it; this store is cited against ``sources/sparse_index.py``'s shape,
not the reference, which has no percolator).

Layout (per generation, behind the sibling stores' atomic MANIFEST
swap):

- ``base/`` — one row per standing-query VERSION the fold kept:
  ``(query_id, qterms, none_terms, min_match, seq, op)`` — upsert
  winners (the live registry) AND delete tombstones (so a redelivered
  pre-delete register replayed after compaction stays dead, the
  posting store's ADVICE r07 lesson);
- ``log/``  — post-fold appends of the same shape (O(batch));
- ``_DIRTY`` — marker gating the fold; absent on generations written
  by init/compact, so clean reads serve ``base`` filtered to upserts
  with no arbitration at all.

The registry is SMALL by contract — alert registries are thousands of
rows, and ``percolate`` broadcasts the whole folded view — so the
dirty-read fold here is a base∪log LWW max_by over registry-sized
data: no touched-id machinery, no posting/arbiter split (those exist
to keep CORPUS-sized mass below broadcast joins; nothing here is
corpus-sized).  What this store shares with its siblings is the
CONTRACT: driver-ordered dense seqs (G3), redelivery idempotency
(content-keyed ``(query_id, seq)`` rows; the fold's max_by cannot be
perturbed by byte-identical duplicates), tombstone semantics (M2:
absent-id unregister is a no-op), ``seq_floor`` sweep protection
(ADVICE r09), generation pinning (R4), and a ``foreachBatch``
streaming sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: mutation-log row shape consumed by :meth:`PercolatorStore.apply_log`
#: — ``min_match`` NULL means "all" (conjunctive), the ES clamp applies
LOG_SCHEMA = (
    "seq long, op string, query_id long, qterms array<string>, "
    "none_terms array<string>, min_match int"
)

_COLS = ("query_id", "qterms", "none_terms", "min_match")


class PercolatorStore:
    """LWW store for standing percolation queries (module docstring)."""

    def __init__(self, root: str):
        import os

        self.root = root
        self._os = os
        #: lowest seq a DEFAULT-seq sweep may not collide with (an
        #: attached engine's pending driver-side seqs are invisible to
        #: the store's max(seq) scan — ADVICE r09, the sibling guard)
        self.seq_floor = 0

    # -- generation machinery (sibling stores' idiom) -------------------------

    @property
    def _manifest(self) -> str:
        return self._os.path.join(self.root, "MANIFEST")

    def _current_gen(self) -> str:
        try:
            with open(self._manifest, encoding="ascii") as f:
                return f.read().strip()
        except FileNotFoundError:
            return "gen-000000"

    def _commit_gen(self, gen: str) -> None:
        os = self._os
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest + ".tmp"
        with open(tmp, "w", encoding="ascii") as f:
            f.write(gen + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest)

    def _paths(self) -> tuple[str, str]:
        d = self._os.path.join(self.root, self._current_gen())
        return (
            self._os.path.join(d, "base"),
            self._os.path.join(d, "log"),
        )

    def generations(self) -> list[str]:
        try:
            names = self._os.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(n for n in names if n.startswith("gen-"))

    def at(self, generation: str) -> "PercolatorStore":
        """READ-ONLY view pinned to ``generation`` (same keep-one-cycle
        caveats as the sibling stores)."""
        import copy

        if generation not in self.generations():
            raise ValueError(
                f"unknown generation {generation!r}; on disk: "
                f"{self.generations()}"
            )
        view = copy.copy(self)
        view._current_gen = lambda: generation

        def _read_only(*_a, **_kw):
            raise ValueError("generation-pinned view is read-only")

        for name in ("init_base", "apply_log", "delete_ids", "compact",
                     "_commit_gen", "streaming_log_sink"):
            setattr(view, name, _read_only)
        return view

    # -- write path ------------------------------------------------------------

    def init_base(self, stored: DataFrame) -> None:
        """One-time base: ``(query_id, qterms[, none_terms, min_match])``
        rows at seq 0.  Missing optional columns become NULL (= no
        negative clause / conjunctive)."""
        gen = "gen-000000"
        rows = stored.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("qterms"),
            (
                F.col("none_terms")
                if "none_terms" in stored.columns
                else F.lit(None).cast("array<string>")
            ).alias("none_terms"),
            (
                F.col("min_match").cast("int")
                if "min_match" in stored.columns
                else F.lit(None).cast("int")
            ).alias("min_match"),
            F.lit(0).cast("long").alias("seq"),
            F.lit("upsert").alias("op"),
        )
        rows.write.mode("overwrite").parquet(
            self._os.path.join(self.root, gen, "base")
        )
        self._commit_gen(gen)

    def apply_log(self, log: DataFrame) -> None:
        """O(batch): fold one mutation log (:data:`LOG_SCHEMA` shape)
        in.  Dirty marker FIRST (crash ordering — the sibling stores'
        contract: a marker with no rows behind it only costs the next
        read the fold; rows without a marker would let the clean fast
        path serve unregistered/superseded queries).  Idempotent under
        redelivery (content-keyed rows, max_by fold)."""
        from .fsutil import write_marker

        base, log_path = self._paths()
        write_marker(
            log.sparkSession,
            self._os.path.join(self._os.path.dirname(base), "_DIRTY"),
            "1\n",
        )
        (
            log.select(
                F.col("query_id").cast("long").alias("query_id"),
                "qterms",
                "none_terms",
                F.col("min_match").cast("int").alias("min_match"),
                F.col("seq").cast("long").alias("seq"),
                "op",
            )
            .write.mode("append")
            .parquet(log_path)
        )

    def delete_ids(
        self, ids: DataFrame, *, id_col: str = "query_id",
        seq: int | None = None,
    ) -> int:
        """Bulk unregister sweep — one ``delete`` tombstone per LIVE
        matching standing query (same contract as the sibling stores'
        ``delete_ids``; absent/already-dead ids are no-ops).  Default
        sweep seq is ``max(stored seq, seq_floor) + 1``."""
        spark = ids.sparkSession
        rows = self._all_rows(spark)
        if seq is None:
            row = rows.agg(F.max("seq").alias("m")).collect()[0]
            seq = max(int(row["m"] or 0), int(self.seq_floor)) + 1
        elif seq <= self.seq_floor:
            raise ValueError(
                f"sweep seq {seq} <= an attached engine's last assigned "
                f"seq {self.seq_floor}; same-seq LWW arbitration on one "
                "id is order-dependent — pass the engine's next seq"
            )
        live = (
            rows.groupBy("query_id")
            .agg(F.max_by("op", "seq").alias("op"))
            .filter(F.col("op") == "upsert")
            .select("query_id")
        )
        matched = live.join(
            ids.select(F.col(id_col).alias("query_id")).distinct(),
            "query_id",
            "left_semi",
        )
        # pin before count/append (the lineage reads the directory the
        # append mutates — the sibling stores' ADVICE r09 fix)
        tomb = matched.select(
            "query_id",
            F.lit(None).cast("array<string>").alias("qterms"),
            F.lit(None).cast("array<string>").alias("none_terms"),
            F.lit(None).cast("int").alias("min_match"),
            F.lit(int(seq)).cast("long").alias("seq"),
            F.lit("delete").alias("op"),
        ).localCheckpoint()
        n = tomb.count()
        if n:
            from .fsutil import write_marker

            base, log_path = self._paths()
            write_marker(
                spark,
                self._os.path.join(self._os.path.dirname(base), "_DIRTY"),
                "1\n",
            )
            tomb.write.mode("append").parquet(log_path)
        return n

    def streaming_log_sink(self, stream: DataFrame, *, checkpoint: str):
        """foreachBatch replay of a registry mutation stream —
        at-least-once delivery, exactly-once effect (content-keyed
        rows + max_by fold), the sibling stores' streaming symmetry."""

        def _apply(batch: DataFrame, _batch_id: int) -> None:
            self.apply_log(batch)

        return (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- read path -------------------------------------------------------------

    def _all_rows(self, spark: SparkSession) -> DataFrame:
        from pyspark.errors import AnalysisException

        base, log_path = self._paths()
        rows = spark.read.parquet(base)
        try:
            return rows.unionByName(spark.read.parquet(log_path))
        except AnalysisException:  # clean generation: no log yet
            return rows

    def _is_dirty(self, spark: SparkSession) -> bool:
        from .fsutil import read_marker

        gen_dir = self._os.path.dirname(self._paths()[0])
        return read_marker(
            spark, self._os.path.join(gen_dir, "_DIRTY")
        ) is not None

    def registry_view(self, spark: SparkSession) -> DataFrame:
        """The folded LIVE registry ``(query_id, qterms, none_terms,
        min_match)`` — what :func:`operators.percolate.percolate`
        takes as ``stored``.  Clean generations serve ``base``'s
        upsert rows directly; dirty ones fold base∪log to per-id LWW
        winners (one max_by hash aggregate over registry-sized data —
        the whole view broadcasts downstream by the percolate
        contract, so there is nothing to keep below a join here)."""
        if not self._is_dirty(spark):
            base, _ = self._paths()
            return (
                spark.read.parquet(base)
                .filter(F.col("op") == "upsert")
                .select(*_COLS)
            )
        winners = (
            self._all_rows(spark)
            .groupBy("query_id")
            .agg(
                F.max("seq").alias("seq"),
                F.max_by("op", "seq").alias("op"),
                *[
                    F.max_by(c, "seq").alias(c)
                    for c in _COLS
                    if c != "query_id"
                ],
            )
        )
        return winners.filter(F.col("op") == "upsert").select(*_COLS)

    # -- maintenance -------------------------------------------------------------

    def compact(self, spark: SparkSession) -> None:
        """Fold base∪log into a fresh clean generation: one winner row
        per ever-registered query (upsert winners = the live registry;
        delete winners = tombstones, kept so a redelivered pre-delete
        register stays dead across the fold).  Atomic manifest swap;
        previous generation kept one cycle."""
        winners = (
            self._all_rows(spark)
            .groupBy("query_id")
            .agg(
                F.max("seq").alias("seq"),
                F.max_by("op", "seq").alias("op"),
                *[
                    F.max_by(c, "seq").alias(c)
                    for c in _COLS
                    if c != "query_id"
                ],
            )
            .select(*_COLS, "seq", "op")
        )
        cur = self._current_gen()
        nxt = f"gen-{int(cur.split('-')[1]) + 1:06d}"
        winners.write.mode("overwrite").parquet(
            self._os.path.join(self.root, nxt, "base")
        )
        self._commit_gen(nxt)
        import shutil

        for gen in self.generations()[:-2]:
            shutil.rmtree(
                self._os.path.join(self.root, gen), ignore_errors=True
            )


def describe_percolator_store(
    store: PercolatorStore, spark: SparkSession
) -> dict:
    """Observability for the standing-query registry — the store
    family's ``describe`` contract: generation, dirty flag, live
    standing queries, tombstones, post-fold backlog, local bytes."""
    from pyspark.errors import AnalysisException

    from .posting_index import _dir_bytes

    base, log_path = store._paths()
    winners = store._all_rows(spark).groupBy("query_id").agg(
        F.max_by("op", "seq").alias("op")
    )
    by_op = {
        r["op"]: r["count"] for r in winners.groupBy("op").count().collect()
    }
    try:
        backlog = spark.read.parquet(log_path).count()
    except AnalysisException:
        backlog = 0
    return {
        "generation": store._current_gen(),
        "dirty": store._is_dirty(spark),
        "live_queries": int(by_op.get("upsert", 0)),
        "tombstones": int(by_op.get("delete", 0)),
        "mutation_backlog_rows": int(backlog),
        "bytes": {
            "base": _dir_bytes(store._os, base),
            "log": _dir_bytes(store._os, log_path),
        },
    }
