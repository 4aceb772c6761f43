"""Doc-granular LWW token store — MaxSim under the mutation discipline.

Every other retrieval family here has a merge-on-read mutable store
(vector: ``streaming.ivf_stream.IvfIndexStore`` behind
``VectorEngine.attach_store``; lexical:
``sources.posting_index.MutablePostingIndexStore`` behind
``TextEngine.attach_store``).  The late-interaction family was
write-once (VERDICT r08 item 5): a token multi-vector corpus had no
upsert/delete path, so any correction meant rebuilding the token index
and token store from scratch — the reference's own
full-rewrite-per-mutation shape (src/index/vector_shard.cc:101-106)
at every edit.  This module closes that asymmetry with the SAME
merge-on-read design the other two stores use, specialized to the one
semantic that is new here: a mutation is **doc-granular** — an upsert
replaces a document's ENTIRE token set atomically (the ColBERT unit of
re-encoding: you re-run the document encoder, you get all its token
vectors back), a delete tombstones the document.  Token-granular edits
don't exist in the model, which is exactly what makes the LWW fold of
``operators.mutations.apply_mutations`` apply unchanged at doc
granularity.

Layout (per generation ``gen-NNNNNN/``, behind the same atomic
MANIFEST pointer swap as the sibling stores; readers resolve ONE
generation per read, a crash leaves the old complete snapshot):

- ``tok_ivf/``   — ``sources.ivf_index.write_cosine_ivf_index`` over
  the live token vectors carrying ``doc_id``: the cell-partitioned
  stage-1 routing layout of :func:`operators.late_interaction
  .maxsim_ivf_topk`, probed-cell partition pruning included;
- ``tok_store/`` — ``sources.rerank_store.write_rerank_store`` over
  the same rows bucketed by doc id: the DPP-pruned stage-2 gather
  layout;
- ``delta/``     — ``(doc_id, pos, embedding, seq)`` UNclustered
  appends: O(batch) per ``apply_log``, never a corpus scan;
- ``muts/``      — ``(id, seq, op)``: one arbiter row per doc VERSION,
  the read-side LWW liveness filter (a token row is alive iff its
  ``(id, seq)`` is its id's winning upsert — deletes write no tokens,
  so the inner join IS the tombstone filter, the
  ``MutablePostingIndexStore`` trick verbatim).

Read paths:

- :meth:`search` — the EXACT tier (``maxsim_topk`` semantics) over the
  merge-on-read live token set.  Clean generations (fresh init or
  post-compact) skip every arbiter join outright — the ``_DIRTY``
  marker gate, same as the posting store.
- :meth:`search_two_stage` — the ``maxsim_ivf_topk`` serving shape:
  stage 1 routes query-token legs over the BASE ``tok_ivf`` (which may
  hold superseded/deleted docs — harmless overfetch, liveness is
  enforced at the gather), delta docs are ALL candidates (the delta is
  O(Δ) between compactions by the store contract — the same "small
  mutable head" every merge-on-read design carries), and the union
  re-scores through the shared :func:`operators.late_interaction
  .score_pairs` stage with the arbiter applied to gathered rows only
  (O(candidates), not O(corpus)).

``compact()`` folds base+delta through the arbiter into a
re-clustered next generation: both serving layouts are rewritten from
live winners only, ``muts/`` keeps ONE winner row per doc — including
delete winners: tombstones must survive compaction or a
crash-redelivered pre-delete upsert batch would resurrect the doc
(the ADVICE r07 lesson, inherited).

Retry safety: appended rows are content-keyed by ``(id, seq)`` and
every read-side consumer reduces through max/sum aggregates or
``dropDuplicates`` on that key, so an at-least-once redelivered batch
changes nothing (tested, including across compaction).

Seq discipline: ``apply_log`` preserves the caller's per-row seqs —
the total order must be monotone ACROSS pushes (the engines' G3
contract; ``VectorEngine.attach_store`` shows the store-global remap
an engine performs before pushing).  Zero-norm token vectors are
excluded by the cosine index contract on both tiers (they have no
direction; ``write_cosine_ivf_index`` drops them and the exact tier
scores them 0.0 — document encoders never emit them in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: token schema stored in tok_store/ and delta/ (plus the bucket key)
_TOKEN_COLS = ("doc_id", "pos", "embedding", "seq")


class MutableTokenStore:
    """LWW merge-on-read multi-vector (late-interaction) store.

    ``init_base`` once (one corpus scan, EVER), then ``apply_log``
    per mutation batch (O(batch)) and ``compact`` at maintenance
    cadence.  See module docstring for layout and contracts."""

    def __init__(self, root: str):
        import os

        self.root = root
        self._os = os
        #: lowest seq a DEFAULT-seq sweep may not collide with — a
        #: caller assigning seqs driver-side (an engine log) advances
        #: this so pending seqs invisible to the max(seq) scan cannot
        #: tie with a sweep (the sibling stores' ADVICE-r09 guard)
        self.seq_floor = 0

    # -- generation machinery (the sibling stores' idiom) ---------------------

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

    def _paths(self) -> tuple[str, str, str, str]:
        d = self._os.path.join(self.root, self._current_gen())
        return (
            self._os.path.join(d, "tok_ivf"),
            self._os.path.join(d, "tok_store"),
            self._os.path.join(d, "delta"),
            self._os.path.join(d, "muts"),
        )

    def generations(self) -> list[str]:
        """On-disk generation names, oldest first — at most two exist
        between compactions (current + the just-superseded one kept a
        cycle for in-flight readers)."""
        try:
            names = self._os.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(n for n in names if n.startswith("gen-"))

    def at(self, generation: str) -> "MutableTokenStore":
        """READ-ONLY view pinned to ``generation`` — the manifest-swap
        contract surfaced as time travel, same keep-one-cycle caveats
        as the sibling stores."""
        import copy

        if generation not in self.generations():
            raise ValueError(
                f"unknown generation {generation!r}; on disk: "
                f"{self.generations()}"
            )
        view = copy.copy(self)
        view._current_gen = lambda: generation  # shadows the method

        def _read_only(*_a, **_kw):
            raise ValueError("generation-pinned view is read-only")

        for name in (
            "init_base", "apply_log", "delete_ids", "compact",
            "_commit_gen", "streaming_log_sink",
        ):
            setattr(view, name, _read_only)
        return view

    # -- write path ------------------------------------------------------------

    def _centroids(self, spark: SparkSession) -> list[list[float]]:
        import json

        from .fsutil import read_marker

        raw = read_marker(
            spark, self._os.path.join(self.root, "_CENTROIDS")
        )
        if raw is None:
            raise ValueError(
                f"{self.root} is not an initialized MutableTokenStore "
                "(no _CENTROIDS marker); call init_base first"
            )
        return json.loads(raw)

    def init_base(
        self,
        token_df: DataFrame,
        centroids: list[list[float]],
        *,
        doc_id_col: str = "doc_id",
        pos_col: str = "pos",
        vector_col: str = "embedding",
    ) -> None:
        """One corpus scan → seq-0 serving layouts + one seq-0 upsert
        arbiter row per doc.  ``token_df``: one row per (doc, token)
        with ``pos_col`` identifying the token within its doc (any
        distinct int — MaxSim is permutation-invariant, the column
        exists so replaced token sets are auditable).  ``centroids``
        must live in NORMALIZED space (the cosine index contract) and
        stay fixed for the store's lifetime — merge-on-read routing:
        new tokens assign to their nearest EXISTING cell map-side;
        correctness is centroid-agnostic (probing selects candidates,
        re-scoring is exact)."""
        import json

        from .fsutil import write_marker
        from .ivf_index import write_cosine_ivf_index
        from .rerank_store import write_rerank_store

        gen = "gen-000000"
        base = self._os.path.join(self.root, gen)
        toks = token_df.select(
            F.col(doc_id_col).cast("long").alias("doc_id"),
            F.col(pos_col).cast("int").alias("pos"),
            F.col(vector_col).alias("embedding"),
            F.lit(0).cast("long").alias("seq"),
        )
        write_cosine_ivf_index(
            toks, self._os.path.join(base, "tok_ivf"), centroids
        )
        write_rerank_store(
            toks, self._os.path.join(base, "tok_store"), id_col="doc_id"
        )
        (
            toks.select("doc_id")
            .distinct()
            .select(
                F.col("doc_id").alias("id"),
                F.lit(0).cast("long").alias("seq"),
                F.lit("upsert").alias("op"),
            )
            .write.mode("overwrite")
            .parquet(self._os.path.join(base, "muts"))
        )
        write_marker(
            token_df.sparkSession,
            self._os.path.join(self.root, "_CENTROIDS"),
            json.dumps(centroids) + "\n",
        )
        self._commit_gen(gen)

    def apply_log(
        self,
        log: DataFrame,
        *,
        doc_id_col: str = "doc_id",
        tokens_col: str = "tokens",
    ) -> None:
        """O(batch): fold one engine-shaped mutation-log DataFrame
        ``(seq, op, <doc_id>, <tokens: array<array<float>>>, …)`` into
        the store — an upsert's token array explodes into delta rows
        (its ``pos`` is the array position), every entry appends its
        arbiter row.  Idempotent under redelivery (content-keyed rows,
        aggregate-reducing reads); an absent-id delete is a no-op by
        the same arbitration (a tombstone with no token rows)."""
        from .fsutil import write_marker

        ivf, _, delta, muts = self._paths()
        gen_dir = self._os.path.dirname(ivf)
        # dirty marker FIRST (crash ordering) — a marker with no rows
        # behind it only costs the arbiter joins on the next read; rows
        # with no marker would let the clean-generation fast path serve
        # tokens a delete/replace has superseded.
        write_marker(
            log.sparkSession,
            self._os.path.join(gen_dir, "_DIRTY"),
            "1\n",
        )
        ups = log.filter(F.col("op") == "upsert")
        (
            ups.select(
                F.col(doc_id_col).cast("long").alias("doc_id"),
                F.col("seq").cast("long").alias("seq"),
                F.posexplode(F.col(tokens_col)).alias("pos", "embedding"),
            )
            .select("doc_id", "pos", "embedding", "seq")
            .write.mode("append")
            .parquet(delta)
        )
        (
            log.select(
                F.col(doc_id_col).cast("long").alias("id"),
                F.col("seq").cast("long").alias("seq"),
                "op",
            )
            .write.mode("append")
            .parquet(muts)
        )

    def delete_ids(
        self, ids: DataFrame, *, id_col: str = "id", seq: int | None = None
    ) -> int:
        """Doc-granular bulk retention sweep (GDPR erasure, policy
        deletes) — the verb the sibling stores got in round 9
        (``IvfIndexStore.delete_where``,
        ``MutablePostingIndexStore.delete_ids``,
        ``MutableSparseIndexStore.delete_ids``; VERDICT r09 missing #3).

        One ``delete`` arbiter row per LIVE matching doc id, one
        O(matching) append — a tombstoned doc's ENTIRE token set drops
        out of the merge-on-read arbitration at once (doc-granular
        atomicity, the store's replacement unit), and physical removal
        happens at the next ``compact()``.  Ids already deleted or
        never present are skipped (idempotent; re-sweeping returns 0).
        The default sweep seq is ``max(stored seq, seq_floor) + 1``;
        an explicit seq at or below the floor raises (same-id same-seq
        LWW arbitration would be order-dependent).  Returns the number
        of docs tombstoned.
        """
        from .fsutil import write_marker

        spark = ids.sparkSession
        *_, muts = self._paths()
        all_muts = spark.read.parquet(muts)
        if seq is None:
            row = all_muts.agg(F.max("seq").alias("m")).collect()[0]
            seq = max(int(row["m"] or 0), int(self.seq_floor)) + 1
        elif seq <= self.seq_floor:
            raise ValueError(
                f"sweep seq {seq} <= an attached engine's last assigned "
                f"seq {self.seq_floor}; pass the engine's next seq"
            )
        live = self._winners(spark).filter(F.col("op") == "upsert").select("id")
        matched = live.join(
            ids.select(F.col(id_col).cast("long").alias("id")).distinct(),
            "id",
            "left_semi",
        )
        # pin the matched set before count/append — the lineage reads
        # the muts directory the append below mutates (ADVICE r09)
        tomb = matched.select(
            "id",
            F.lit(int(seq)).cast("long").alias("seq"),
            F.lit("delete").alias("op"),
        ).localCheckpoint()
        n = tomb.count()
        if n:
            gen_dir = self._os.path.dirname(self._paths()[0])
            write_marker(
                spark, self._os.path.join(gen_dir, "_DIRTY"), "1\n"
            )
            tomb.write.mode("append").parquet(muts)
        return n

    def streaming_log_sink(
        self,
        mutation_stream: DataFrame,
        *,
        checkpoint: str,
        doc_id_col: str = "doc_id",
        tokens_col: str = "tokens",
    ):
        """Consume a STREAM of doc-granular mutation rows ``(seq, op,
        <doc_id>, <tokens>)`` via ``foreachBatch`` → :meth:`apply_log`
        — the late-interaction analog of the sibling stores' streaming
        replay (streaming/mutation_stream.py;
        ``MutablePostingIndexStore.streaming_log_sink``).
        at-least-once delivery, exactly-once effect: appended rows are
        content-keyed by ``(id, seq)`` and reads reduce through
        aggregates redelivered duplicates cannot perturb."""

        def _apply(batch: DataFrame, _batch_id: int) -> None:
            self.apply_log(
                batch, doc_id_col=doc_id_col, tokens_col=tokens_col
            )

        return (
            mutation_stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- read path ---------------------------------------------------------------

    def _is_dirty(self, spark: SparkSession) -> bool:
        from .fsutil import read_marker

        ivf, *_ = self._paths()
        gen_dir = self._os.path.dirname(ivf)
        return (
            read_marker(spark, self._os.path.join(gen_dir, "_DIRTY"))
            is not None
        )

    def _winners(self, spark: SparkSession) -> DataFrame:
        """Per-id LWW winner ``(id, seq, op)`` — one max_by hash
        aggregate (map-side partial combine), never a sort window."""
        *_, muts = self._paths()
        return (
            spark.read.parquet(muts)
            .groupBy("id")
            .agg(
                F.max("seq").alias("seq"),
                F.max_by("op", "seq").alias("op"),
            )
        )

    def _base_tokens(self, spark: SparkSession) -> DataFrame:
        from .rerank_store import BUCKET_COL

        _, store, *_ = self._paths()
        return spark.read.parquet(store).drop(BUCKET_COL)

    def _delta_tokens(self, spark: SparkSession) -> DataFrame:
        from pyspark.errors import AnalysisException

        *_, delta, _ = self._paths()
        try:
            return spark.read.parquet(delta)
        except AnalysisException:
            return None  # delete-only dirty generation: no delta rows

    def _live_tokens(self, spark: SparkSession) -> DataFrame:
        """The merge-on-read live token set ``(doc_id, pos, embedding,
        seq)``.  Clean generations return the base scan untouched (the
        arbiter join is skipped outright — compact() restores this
        plan); dirty generations pay ONE dropDuplicates (redelivery)
        plus ONE inner join against the winner aggregate, both hash
        shuffles on ``doc_id``."""
        rows = self._base_tokens(spark)
        if not self._is_dirty(spark):
            return rows
        delta = self._delta_tokens(spark)
        if delta is not None:
            rows = rows.unionByName(delta.select(*_TOKEN_COLS))
        rows = rows.dropDuplicates(["doc_id", "pos", "seq"])
        win = self._winners(spark).filter(F.col("op") == "upsert")
        return rows.join(
            win.select(F.col("id").alias("doc_id"), "seq"),
            ["doc_id", "seq"],
            "inner",
        )

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int,
        *,
        query_id_col: str = "query_id",
        query_vectors_col: str = "qvecs",
        round_scores: int = 6,
    ) -> DataFrame:
        """EXACT MaxSim over the live token set (``maxsim_topk``
        semantics, merge-on-read) — ``(query_id, id, maxsim, rank)``."""
        from ..operators.late_interaction import maxsim_topk

        return maxsim_topk(
            self._live_tokens(spark),
            queries,
            k,
            doc_id_col="doc_id",
            query_id_col=query_id_col,
            query_vectors_col=query_vectors_col,
            round_scores=round_scores,
        )

    def search_two_stage(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int,
        *,
        n_probe: int = 4,
        gather: int = 20,
        query_id_col: str = "query_id",
        query_vectors_col: str = "qvecs",
        round_scores: int = 6,
    ) -> DataFrame:
        """The ``maxsim_ivf_topk`` serving shape over the mutable
        store: stage-1 candidates come from the clean BASE routing
        layout (probed-cell partition pruning) plus every live DELTA
        doc (O(Δ) between compactions); liveness filters the gathered
        rows — O(candidates) arbitration — and the shared
        :func:`score_pairs` stage re-scores exactly.  On a clean
        generation this is plan-identical to ``maxsim_ivf_topk`` over
        the same layouts.  Same query_id contract (non-negative
        integral) as the operator."""
        from ..operators.late_interaction import (
            _TOKEN_LEG,
            score_pairs,
        )
        from .ivf_index import search_cosine_ivf_index
        from .rerank_store import bounded_gather

        _qid_type = queries.schema[query_id_col].dataType.simpleString()
        if _qid_type not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"search_two_stage requires an integral {query_id_col!r} "
                f"column (got {_qid_type})"
            )
        ivf, store, *_ = self._paths()
        qtok = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.posexplode(F.col(query_vectors_col)).alias("_qpos", "_qv"),
        )
        legs = qtok.select(
            (F.col("query_id") * _TOKEN_LEG + F.col("_qpos")).alias(
                "query_id"
            ),
            F.col("_qv").alias("qvec"),
        )
        hits = search_cosine_ivf_index(
            spark, ivf, legs, gather, self._centroids(spark),
            n_probe=n_probe, id_col="doc_id",
            replicated=True, round_scores=6,
        )
        cands = hits.select(
            F.expr(f"query_id div {_TOKEN_LEG}").alias("query_id"),
            F.col("id").alias("doc_id"),
        )
        dirty = self._is_dirty(spark)
        if dirty:
            # every live delta doc is a candidate for every query: the
            # routing layout predates them, so they cannot be pruned
            # into — the O(Δ) mutable head.  compact() folds them into
            # the next generation's cells and restores pure routing.
            delta = self._delta_tokens(spark)
            if delta is not None:
                fresh = (
                    delta.select("doc_id")
                    .distinct()
                    .crossJoin(
                        queries.select(
                            F.col(query_id_col).alias("query_id")
                        )
                    )
                    .select("query_id", "doc_id")
                )
                cands = cands.unionByName(fresh)
        cands = cands.distinct()
        toks = bounded_gather(
            spark, store, cands.select("doc_id"), id_col="doc_id"
        )
        if dirty:
            delta = self._delta_tokens(spark)
            if delta is not None:
                toks = toks.unionByName(delta.select(*_TOKEN_COLS))
            toks = toks.dropDuplicates(["doc_id", "pos", "seq"])
            # candidate-bounded arbitration: winners restricted to
            # gathered docs first — O(candidates), not O(corpus)
            win = (
                self._winners(spark)
                .filter(F.col("op") == "upsert")
                .select(F.col("id").alias("doc_id"), "seq")
            )
            toks = toks.join(win, ["doc_id", "seq"], "inner")
        return score_pairs(
            toks, cands, qtok, k,
            doc_id_col="doc_id", round_scores=round_scores,
        )

    # -- maintenance -------------------------------------------------------------

    def compact(self, spark: SparkSession) -> None:
        """Fold base+delta through the arbiter into a re-clustered
        next generation: both serving layouts rewritten from live
        winners only; ``muts/`` keeps one winner row per doc INCLUDING
        delete tombstones (redelivered pre-delete upserts must keep
        losing after compaction); the ``_DIRTY`` gate disappears, so
        reads return to the arbiter-free clean plan.  Old generations
        beyond the just-superseded one are GC'd (keep-one-cycle)."""
        import shutil

        from .ivf_index import write_cosine_ivf_index
        from .rerank_store import write_rerank_store

        os = self._os
        cur = self._current_gen()
        nxt = "gen-%06d" % (int(cur.rsplit("-", 1)[1]) + 1)
        live = self._live_tokens(spark)
        base = os.path.join(self.root, nxt)
        write_cosine_ivf_index(
            live, os.path.join(base, "tok_ivf"), self._centroids(spark)
        )
        write_rerank_store(
            live, os.path.join(base, "tok_store"), id_col="doc_id"
        )
        (
            self._winners(spark)
            .write.mode("overwrite")
            .parquet(os.path.join(base, "muts"))
        )
        self._commit_gen(nxt)
        for name in os.listdir(self.root):
            if name.startswith("gen-") and name not in {cur, nxt}:
                shutil.rmtree(
                    os.path.join(self.root, name), ignore_errors=True
                )
