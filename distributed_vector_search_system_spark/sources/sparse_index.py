"""Persisted learned-sparse index: term-clustered weighted postings.

The storage tier under ``operators/sparse.py`` — the same role
``posting_index.py`` plays for BM25 and ``ivf_index.py`` for dense
vectors: pay the corpus scan + encoding ONCE at build time, serve
queries from a layout whose read cost scales with the query's posting
mass, not the corpus.

Layout (parquet under one root):

- ``postings/`` — ``(term, id, weight)``, repartitioned on ``term``
  and sorted by ``term`` within partitions: a query's ``term IN (…)``
  predicate prunes row groups on min/max stats (the columnar posting
  seek, same as posting_index.py).
- ``terms/``    — ``(term, df, max_w)``: document frequency plus the
  term's maximum posting weight.  ``max_w`` is what makes query-time
  impact pruning free — ``weight ≥ frac·max_w`` needs no second scan
  and no per-term aggregate at query time (operators/sparse.py
  ``prune_postings`` is the from-scratch form).
- ``stats/``    — one row ``(n_docs)``.

Exactness contract: built from the same corpus, ``sparse_search_index``
returns IDENTICAL rows to the from-scratch ``sparse_topk`` over
``sparse_encode`` output (same weights persisted, same score join,
same round-then-rank; tested exactly in tests/test_sparse.py).  With
``min_impact_frac`` it returns identical rows to the from-scratch
pruned pipeline — the approximation is deterministic in the weights,
so even the pruned tier keeps an exact oracle.

Index-time pruning (``write_sparse_index(min_impact_frac=...)``)
physically drops low-impact postings — the 100 TB trade: the stored
posting mass shrinks by the pruned fraction and every query gets the
IO cut, at the recall cost measured in the bench recall section.

Freshness: the write-once index above is rebuilt at compaction
cadence; ``MutableSparseIndexStore`` below is the O(Δ) merge-on-read
tier (the treatment the BM25 tier got in round 7), whose mutation
contract carries model-produced weights WITH the upsert so the store
stays weighting-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sparse import sparse_encode, sparse_scores
from ..operators.retrieval import _score_ranked

#: default partition count for the postings layout (same sizing note as
#: posting_index.POSTING_PARTITIONS: at real scale, size so row groups
#: stay within maxPartitionBytes)
SPARSE_PARTITIONS = 8


def write_sparse_index(
    docs: DataFrame,
    path: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_impact_frac: float = 0.0,
    mode: str = "overwrite",
    num_partitions: int = SPARSE_PARTITIONS,
) -> None:
    """Encode + persist: one corpus scan → weighted postings, term
    stats, corpus stats.

    ``min_impact_frac`` > 0 prunes postings at build time (weight ≥
    frac · term max).  ``terms/`` records df and max_w from the FULL
    (pre-prune) postings — df because idf-style consumers need true
    document frequency, max_w because the pruning threshold must be
    stable under re-pruning (pruning twice at the same frac is a
    no-op, and a query-time frac composes with the build-time one on
    the same scale).

    ``mode`` must be ``"overwrite"``: the layout's side tables
    (``terms/`` df+max_w, ``stats/`` n_docs) are full-corpus
    aggregates — an append would double-count them and corrupt every
    idf/impact consumer (ADVICE r09).  Incremental maintenance is the
    ``MutableSparseIndexStore`` tier, not a second build.
    """
    if mode != "overwrite":
        raise ValueError(
            "write_sparse_index is overwrite-only (terms/stats are "
            "full-corpus aggregates; appending would corrupt df/max_w/"
            "n_docs) — use MutableSparseIndexStore for increments"
        )
    postings = sparse_encode(docs, doc_id_col=doc_id_col, text_col=text_col)
    spark = docs.sparkSession
    # stage the encoded postings once (the terms aggregate and the
    # clustered rewrite would otherwise each re-run the encoder's
    # two-shuffle subtree)
    staged = f"{path}/_stage_postings"
    postings.write.mode(mode).parquet(staged)
    enc = spark.read.parquet(staged)
    terms = enc.groupBy("term").agg(
        F.count("*").alias("df"), F.max("weight").alias("max_w")
    )
    terms.write.mode(mode).parquet(f"{path}/terms")
    kept = enc
    if min_impact_frac > 0.0:
        kept = enc.join(
            F.broadcast(spark.read.parquet(f"{path}/terms")), "term"
        ).filter(
            F.col("weight") >= F.lit(float(min_impact_frac)) * F.col("max_w")
        ).select("term", "id", "weight")
    # materialize the champion-list rank (operators.sparse.cap_postings
    # order: weight desc, id asc) and cluster by (term, impact_rank):
    # a query-time ``per_term_cap`` becomes a pushed-down predicate
    # whose row-group min/max skipping bounds per-term IO at B rows
    # regardless of corpus size
    ir = Window.partitionBy("term").orderBy(
        F.col("weight").desc(), F.col("id").asc()
    )
    (
        kept.withColumn("impact_rank", F.row_number().over(ir))
        .repartition(num_partitions, "term")
        .sortWithinPartitions("term", "impact_rank")
        .write.mode(mode)
        .parquet(f"{path}/postings")
    )
    docs.agg(F.count("*").alias("n_docs")).write.mode(mode).parquet(
        f"{path}/stats"
    )
    # drop the stage (best-effort; the index is already complete) —
    # through the Hadoop FS API so hdfs://-s3a:// stages are cleaned
    # too, not just local paths (ADVICE r09)
    try:
        from .fsutil import delete_path

        delete_path(spark, staged)
    except Exception:
        pass


def sparse_search_index(
    spark: SparkSession,
    path: str,
    query_postings: DataFrame,
    k: int,
    *,
    min_impact_frac: float = 0.0,
    per_term_cap: int | None = None,
    rescore_candidates: bool = False,
) -> DataFrame:
    """Top-k weighted dot product served from the persisted index.

    ``query_postings`` is ``(query_id, term, weight)`` (any encoder;
    ``operators.sparse.sparse_encode_queries`` is the in-container
    one).  The query vocabulary is collected driver-side (small by
    contract — it feeds the pushed-down ``term IN (…)`` predicate,
    which must be a literal to prune row groups), postings are read
    for those terms only, optionally impact-filtered against the
    broadcast ``terms/`` stats, scored and round-then-ranked.

    ``per_term_cap=B`` serves the champion-list tier: the build-time
    ``impact_rank`` column turns the cap into a second pushed-down
    predicate, and the (term, impact_rank) clustering makes it skip
    row groups — per-term IO bounded at B rows at ANY corpus size.
    Rows equal ``sparse_topk`` over
    ``operators.sparse.cap_postings(enc, B)`` exactly (tested).

    ``rescore_candidates=True`` (requires ``per_term_cap``) upgrades
    the champion tier to the full two-stage plan (round 10,
    ``operators.sparse.sparse_champion_rescore_topk``): the capped
    scan only PROPOSES candidates, and a second ``term IN``-pruned
    read of the uncapped postings rescores them exactly — measured
    recall@10 0.98 at B=64 on the Zipf geometry vs 0.82 truncated.
    Both reads are row-group-skipping scans of the same clustered
    layout; the second is candidate-semi-restricted.
    """
    qp = query_postings.select("query_id", "term", "weight")
    vocab = [r["term"] for r in qp.select("term").distinct().collect()]
    if not vocab:
        empty = spark.createDataFrame(
            [], "query_id long, id long, score double, rank int"
        )
        return empty
    if rescore_candidates and per_term_cap is None:
        raise ValueError("rescore_candidates requires per_term_cap")
    if rescore_candidates and min_impact_frac > 0.0:
        raise ValueError(
            "rescore_candidates composes with per_term_cap only (the "
            "rescore stage is exact by contract — a frac-pruned rescore "
            "would silently truncate candidate scores)"
        )
    full_scan = spark.read.parquet(f"{path}/postings").filter(
        F.col("term").isin(vocab)
    )
    postings = full_scan
    if per_term_cap is not None:
        if per_term_cap < 1:
            raise ValueError("per_term_cap must be >= 1")
        if "impact_rank" not in postings.columns:
            raise ValueError(
                "per_term_cap requires an index with a materialized "
                "impact_rank column (rebuild with the current writer)"
            )
        postings = postings.filter(F.col("impact_rank") <= per_term_cap)
    postings = postings.select("term", "id", "weight")
    if rescore_candidates:
        cands = sparse_scores(postings, qp).select("query_id", "id")
        qpb = qp.select("query_id", "term", F.col("weight").alias("_qw"))
        full = (
            full_scan.select("term", "id", F.col("weight").alias("_dw"))
            .join(F.broadcast(qpb), "term")
            .join(F.broadcast(cands), ["query_id", "id"], "left_semi")
            .groupBy("query_id", "id")
            .agg(F.sum(F.col("_qw") * F.col("_dw")).alias("score"))
        )
        return _score_ranked(full, k, "score")
    if min_impact_frac > 0.0:
        stats = (
            spark.read.parquet(f"{path}/terms")
            .filter(F.col("term").isin(vocab))
            .select("term", "max_w")
        )
        postings = (
            postings.join(F.broadcast(stats), "term")
            .filter(
                F.col("weight")
                >= F.lit(float(min_impact_frac)) * F.col("max_w")
            )
            .select("term", "id", "weight")
        )
    return _score_ranked(sparse_scores(postings, qp), k, "score")


def write_sparse_index_triples(
    triples: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    num_partitions: int = SPARSE_PARTITIONS,
) -> None:
    """Persist PRE-ENCODED ``(id, term, weight)`` triples in the same
    layout ``write_sparse_index`` produces from text — the
    weighting-agnostic build path (SparseEngine's per-epoch tier and
    any model-encoded corpus use this; ``sparse_search_index`` reads
    both identically).  ``stats/n_docs`` counts distinct posting ids —
    for model-encoded corpora every doc has ≥1 term by construction.
    Overwrite-only, same reason as ``write_sparse_index``."""
    if mode != "overwrite":
        raise ValueError(
            "write_sparse_index_triples is overwrite-only (terms/stats "
            "are full-corpus aggregates) — use MutableSparseIndexStore "
            "for increments"
        )
    spark = triples.sparkSession
    staged = f"{path}/_stage_postings"
    triples.select("id", "term", "weight").write.mode(mode).parquet(staged)
    enc = spark.read.parquet(staged)
    (
        enc.groupBy("term")
        .agg(F.count("*").alias("df"), F.max("weight").alias("max_w"))
        .write.mode(mode)
        .parquet(f"{path}/terms")
    )
    ir = Window.partitionBy("term").orderBy(
        F.col("weight").desc(), F.col("id").asc()
    )
    (
        enc.withColumn("impact_rank", F.row_number().over(ir))
        .repartition(num_partitions, "term")
        .sortWithinPartitions("term", "impact_rank")
        .write.mode(mode)
        .parquet(f"{path}/postings")
    )
    enc.agg(F.count_distinct("id").alias("n_docs")).write.mode(mode).parquet(
        f"{path}/stats"
    )
    try:
        from .fsutil import delete_path

        delete_path(spark, staged)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Mutable store: model-weighted postings under the LWW discipline


class MutableSparseIndexStore:
    """LWW merge-on-read learned-sparse store — the sparse family's
    O(Δ) maintenance tier, completing the pattern every other
    retrieval family already has (vector: streaming/ivf_stream.py,
    lexical: MutablePostingIndexStore, late-interaction:
    token_store.MutableTokenStore).

    Mutation contract — weights travel WITH the mutation: an upsert
    carries the document's full model-produced sparse vector
    ``(id, terms, weights)`` and replaces the doc's postings
    atomically; a delete tombstones the doc.  This is deliberately
    NOT re-derived from text inside the store: learned-sparse weights
    come from a model (corpus-independent), so the store stays
    weighting-agnostic, and the in-container tf–idf encoder's
    corpus-dependent weights are simply frozen at whatever stats the
    CALLER encoded against — the exact analog of the IVF stores
    serving mutations against attach-time centroids until a retrain.

    Per-generation layout behind the atomic MANIFEST swap (the sibling
    stores' idiom verbatim):

    - ``postings/`` — ``(term, id, weight, seq)`` term-clustered (the
      immutable snapshot; every row a winner on clean generations);
    - ``delta/``    — O(batch) appends of upserted vectors' postings;
    - ``muts/``     — ``(id, seq, op)`` arbiter FLOOR (written only by
      init/compact: the fold's winners);
    - ``muts_log/`` — post-compact arbiter appends — its ids are
      exactly the docs TOUCHED since the fold, which is what lets the
      dirty read keep every corpus-sized subtree below broadcast
      joins (round 10; see ``_live_postings``);
    - ``_DIRTY``    — marker gating the merge-on-read arbiter; absent
      on generations written by init/compact, so clean reads skip the
      arbiter machinery outright (the posting store's measured
      read-tax discipline).

    Search is exact over the folded state: restricted to the query
    vocabulary at the scan (``term IN`` pushdown on base AND delta),
    candidate-bounded arbitration (semi-join probes the pre-dedup
    scan; winner is one max hash aggregate — never a per-id sort
    window), deletes drop out because tombstones write no postings.
    """

    def __init__(self, root: str):
        import os

        self.root = root
        self._os = os
        #: lowest seq a DEFAULT-seq sweep may not collide with.  An
        #: attached engine assigns seqs driver-side and holds them
        #: PENDING until compact — invisible to the store's max(seq)
        #: scan — so the engine advances this floor on every mutation
        #: (ADVICE r09: a default sweep seq colliding with a pending
        #: engine seq makes same-id LWW arbitration order-dependent).
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

    def _paths(self) -> tuple[str, str, str]:
        d = self._os.path.join(self.root, self._current_gen())
        return (
            self._os.path.join(d, "postings"),
            self._os.path.join(d, "delta"),
            self._os.path.join(d, "muts"),
        )

    def _muts_log_path(self) -> str:
        """Post-compact arbiter appends, split from the winner floor
        (``muts/``) so the dirty read's touched-id set is exact by
        construction — the posting store's round-10 discipline (see
        ``MutablePostingIndexStore._muts_log_path``)."""
        d = self._os.path.join(self.root, self._current_gen())
        return self._os.path.join(d, "muts_log")

    def generations(self) -> list[str]:
        try:
            names = self._os.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(n for n in names if n.startswith("gen-"))

    def at(self, generation: str) -> "MutableSparseIndexStore":
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

    @staticmethod
    def _explode_log(ups: DataFrame) -> DataFrame:
        """(id, terms, weights, seq) upserts → (term, id, weight, seq)
        posting rows (arrays zipped positionally)."""
        return ups.select(
            "id",
            "seq",
            F.explode(F.arrays_zip("terms", "weights")).alias("_tw"),
        ).select(
            F.col("_tw.terms").alias("term"),
            "id",
            F.col("_tw.weights").alias("weight"),
            "seq",
        )

    def init_base(self, doc_vectors: DataFrame) -> None:
        """One-time base: doc-granular ``(id, terms, weights)`` rows
        (``operators.sparse.collect_doc_vectors`` lifts encoder
        triples) at seq 0."""
        gen = "gen-000000"
        base = self._os.path.join(self.root, gen)
        docs = doc_vectors.select(
            "id",
            "terms",
            "weights",
            F.lit(0).cast("long").alias("seq"),
        )
        (
            self._explode_log(docs)
            .repartition(SPARSE_PARTITIONS, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(self._os.path.join(base, "postings"))
        )
        (
            docs.select("id", "seq", F.lit("upsert").alias("op"))
            .write.mode("overwrite")
            .parquet(self._os.path.join(base, "muts"))
        )
        # certify the winner-floor layout before the commit (the
        # posting store's mixed-layout guard, ADVICE r10)
        self._write_floor_marker(doc_vectors.sparkSession, base)
        self._commit_gen(gen)

    def apply_log(self, log: DataFrame) -> None:
        """O(batch): fold one mutation log
        ``(seq, op, id, terms, weights)`` in — upsert postings append
        to ``delta/``, every entry appends its arbiter row.  Dirty
        marker first (crash ordering: a marker with no rows behind it
        only costs the next read the arbiter joins; rows without a
        marker would let the clean fast path serve superseded
        postings).  Idempotent under redelivery (content-keyed rows,
        read-side dedup)."""
        from .fsutil import write_marker

        postings, delta, muts = self._paths()
        write_marker(
            log.sparkSession,
            self._os.path.join(self._os.path.dirname(muts), "_DIRTY"),
            "1\n",
        )
        ups = log.filter(F.col("op") == "upsert")
        self._explode_log(ups).write.mode("append").parquet(delta)
        (
            log.select("id", F.col("seq").cast("long").alias("seq"), "op")
            .write.mode("append")
            .parquet(self._muts_log_path())
        )

    def delete_ids(
        self, ids: DataFrame, *, id_col: str = "id", seq: int | None = None
    ) -> int:
        """Bulk retention sweep — one ``delete`` arbiter row per LIVE
        matching id (same contract as the sibling stores; see
        ``MutablePostingIndexStore.delete_ids``).  The default sweep
        seq is ``max(stored seq, seq_floor) + 1`` — the floor covers
        an attached engine's PENDING driver-side seqs (ADVICE r09)."""
        spark = ids.sparkSession
        muts = self._all_muts(spark)
        if seq is None:
            row = muts.agg(F.max("seq").alias("m")).collect()[0]
            seq = max(int(row["m"] or 0), int(self.seq_floor)) + 1
        elif seq <= self.seq_floor:
            raise ValueError(
                f"sweep seq {seq} <= an attached engine's last assigned "
                f"seq {self.seq_floor}; same-seq LWW arbitration on one "
                "id is order-dependent — pass the engine's next seq"
            )
        live = (
            muts.groupBy("id")
            .agg(F.max_by("op", "seq").alias("op"))
            .filter(F.col("op") == "upsert")
            .select("id")
        )
        matched = live.join(
            ids.select(F.col(id_col).alias("id")).distinct(), "id", "left_semi"
        )
        # fix the matched set BEFORE the count/append: the lineage reads
        # the muts directory this method appends to, so an un-pinned
        # plan re-executed by a task retry would scan a directory being
        # mutated, and count vs written rows would come from two
        # executions (ADVICE r09)
        tomb = matched.select(
            "id",
            F.lit(int(seq)).cast("long").alias("seq"),
            F.lit("delete").alias("op"),
        ).localCheckpoint()
        n = tomb.count()
        if n:
            from .fsutil import write_marker

            *_, muts_path = self._paths()
            write_marker(
                spark,
                self._os.path.join(self._os.path.dirname(muts_path), "_DIRTY"),
                "1\n",
            )
            tomb.write.mode("append").parquet(self._muts_log_path())
        return n

    def streaming_log_sink(self, stream: DataFrame, *, checkpoint: str):
        """foreachBatch replay of a mutation stream — at-least-once
        delivery, exactly-once effect (the sibling stores' streaming
        symmetry)."""

        def _apply(batch: DataFrame, _batch_id: int) -> None:
            self.apply_log(batch)

        return (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- read path -------------------------------------------------------------

    def _all_muts(self, spark: SparkSession) -> DataFrame:
        from pyspark.errors import AnalysisException

        *_, muts_path = self._paths()
        floor = spark.read.parquet(muts_path)
        try:
            return floor.unionByName(
                spark.read.parquet(self._muts_log_path())
            )
        except AnalysisException:
            return floor

    def _write_floor_marker(self, spark: SparkSession, gen_dir: str) -> None:
        """Certify that ``gen_dir/muts/`` is a pure fold-time winner
        floor (every post-fold append goes to ``muts_log/``) — the
        posting store's ``_MUTS_FLOOR`` layout contract (ADVICE r10:
        without it a pre-split generation mutated by new code would
        hand ``_touched_ids`` a SUBSET of the truly touched ids and
        resurrect superseded postings)."""
        from .fsutil import write_marker

        from .posting_index import MutablePostingIndexStore as _P

        write_marker(
            spark, self._os.path.join(gen_dir, _P._FLOOR_MARKER), "v1\n"
        )

    def _touched_ids(self, spark: SparkSession) -> DataFrame | None:
        """Ids mutated since the generation fold (``muts_log/``), or
        ``None`` when unusable — the posting store's round-10 contract
        (``MutablePostingIndexStore._touched_ids``), including its
        local-size fast path for the cap guard and the mixed-layout
        ``_MUTS_FLOOR`` gate (ADVICE r10)."""
        from pyspark.errors import AnalysisException

        from .fsutil import read_marker

        from .posting_index import MutablePostingIndexStore as _P

        gen_dir = self._os.path.dirname(self._muts_log_path())
        if read_marker(
            spark, self._os.path.join(gen_dir, _P._FLOOR_MARKER)
        ) is None:
            return None  # pre-split layout: full arbiter until compact
        try:
            log = spark.read.parquet(self._muts_log_path())
        except AnalysisException:
            return None
        small = False
        try:
            total = sum(
                e.stat().st_size
                for e in self._os.scandir(self._muts_log_path())
                if e.is_file()
            )
            small = total < _P._TOUCHED_SIZE_FAST_PATH
        except OSError:
            pass  # remote path: fall through to the count
        if not small and log.count() > _P.TOUCHED_BROADCAST_CAP:
            return None
        return log.select("id").distinct()

    def _is_dirty(self, spark: SparkSession) -> bool:
        from .fsutil import read_marker

        gen_dir = self._os.path.dirname(self._paths()[0])
        return read_marker(
            spark, self._os.path.join(gen_dir, "_DIRTY")
        ) is not None

    def _live_postings(self, spark: SparkSession, terms: list[str]) -> DataFrame:
        from pyspark.errors import AnalysisException

        base_path, delta_path, _ = self._paths()
        rows = spark.read.parquet(base_path).filter(F.col("term").isin(terms))
        if not self._is_dirty(spark):
            # clean generation: every stored row is a winner by
            # construction — no dedup, no arbiter joins
            return rows.drop("seq")
        # touched-id split (round 10, the posting store's discipline —
        # see MutablePostingIndexStore._live_postings): untouched base
        # rows are winners by construction and flow through one
        # map-side broadcast anti-join; the dedup + arbiter run over
        # the mutation backlog's sliver only.
        touched = self._touched_ids(spark)
        if touched is not None:
            # single-scan form — see MutablePostingIndexStore: delta
            # dedup is batch-sized, cross-source duplicates anti-join
            # away against broadcast delta keys, and liveness is one
            # broadcast left join against the touched ids' winners
            # (null winner = untouched = live by construction).
            try:
                delta_d = (
                    spark.read.parquet(delta_path)
                    .filter(F.col("term").isin(terms))
                    .dropDuplicates(["term", "id", "seq"])
                )
                rows = rows.join(
                    F.broadcast(delta_d.select("term", "id", "seq")),
                    ["term", "id", "seq"],
                    "left_anti",
                ).unionByName(delta_d)
            except AnalysisException:
                pass  # delete-only generation
            win = (
                self._all_muts(spark)
                .join(F.broadcast(touched), "id", "left_semi")
                .groupBy("id")
                .agg(F.max("seq").alias("_wseq"))
            )
            return (
                rows.join(F.broadcast(win), "id", "left")
                .filter(
                    F.col("_wseq").isNull()
                    | (F.col("seq") == F.col("_wseq"))
                )
                .drop("seq", "_wseq")
            )
        try:
            rows = rows.unionByName(
                spark.read.parquet(delta_path).filter(F.col("term").isin(terms))
            )
        except AnalysisException:
            pass  # delete-only generation
        raw = rows  # pre-dedup: semi-join keys are dup-insensitive
        rows = rows.dropDuplicates(["term", "id", "seq"])
        win = (
            self._all_muts(spark)
            .join(raw.select("id"), "id", "left_semi")
            .groupBy("id")
            .agg(F.max("seq").alias("seq"))
        )
        # tombstones write no postings → the inner join IS the delete
        # filter; candidate-bounded, one max hash aggregate
        return rows.join(win, ["id", "seq"], "inner").drop("seq")

    def search(
        self,
        spark: SparkSession,
        query_postings: DataFrame,
        k: int,
    ) -> DataFrame:
        """Exact merge-on-read dot-product top-k: identical rows to the
        from-scratch ``sparse_topk`` over the LWW-folded doc vectors
        (tested)."""
        qp = query_postings.select("query_id", "term", "weight")
        vocab = [r["term"] for r in qp.select("term").distinct().collect()]
        if not vocab:
            return spark.createDataFrame(
                [], "query_id long, id long, score double, rank int"
            )
        live = self._live_postings(spark, vocab)
        return _score_ranked(sparse_scores(live, qp), k, "score")

    # -- maintenance -------------------------------------------------------------

    def compact(self, spark: SparkSession) -> None:
        """Fold delta+muts into a fresh clean generation: winner
        postings re-clustered on term, winner upsert rows as the new
        arbiter floor, tombstoned docs dropped for good (their arbiter
        rows survive so late redeliveries of older upserts stay dead).
        Atomic manifest swap; previous generation kept one cycle."""
        from pyspark.errors import AnalysisException

        base_path, delta_path, muts_path = self._paths()
        cur = self._current_gen()
        nxt = f"gen-{int(cur.split('-')[1]) + 1:06d}"
        nxt_dir = self._os.path.join(self.root, nxt)
        rows = spark.read.parquet(base_path)
        try:
            rows = rows.unionByName(spark.read.parquet(delta_path))
        except AnalysisException:
            pass
        rows = rows.dropDuplicates(["term", "id", "seq"])
        muts = self._all_muts(spark)
        winners = muts.groupBy("id").agg(
            F.max("seq").alias("seq"), F.max_by("op", "seq").alias("op")
        )
        live = rows.join(
            winners.filter(F.col("op") == "upsert").select("id", "seq"),
            ["id", "seq"],
            "inner",
        )
        (
            live.select("term", "id", "weight", "seq")
            .repartition(SPARSE_PARTITIONS, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(self._os.path.join(nxt_dir, "postings"))
        )
        (
            winners.select("id", "seq", "op")
            .write.mode("overwrite")
            .parquet(self._os.path.join(nxt_dir, "muts"))
        )
        # fresh fold = pure winner floor; certify the layout (ADVICE r10)
        self._write_floor_marker(spark, nxt_dir)
        self._commit_gen(nxt)
        # GC: keep current + previous generation only
        import shutil

        for gen in self.generations()[:-2]:
            shutil.rmtree(
                self._os.path.join(self.root, gen), ignore_errors=True
            )


def describe_sparse_store(
    store: "MutableSparseIndexStore", spark: SparkSession
) -> dict:
    """ES ``_stats``-shaped observability for the mutable sparse store
    — the posting store's ``describe_posting_store`` contract on this
    family: generation, dirty flag, live/tombstone counts, distinct
    live terms, post-fold mutation backlog, per-directory local bytes.
    Two arbiter aggregates + one distinct-count over the live winners'
    posting keys; run at maintenance cadence, not per query."""
    from pyspark.errors import AnalysisException

    from .fsutil import read_marker
    from .posting_index import _dir_bytes

    base_path, delta_path, muts_path = store._paths()
    gen_dir = store._os.path.dirname(base_path)
    winners = store._all_muts(spark).groupBy("id").agg(
        F.max_by("op", "seq").alias("op")
    )
    by_op = {
        r["op"]: r["count"] for r in winners.groupBy("op").count().collect()
    }
    try:
        backlog = spark.read.parquet(store._muts_log_path()).count()
    except AnalysisException:
        backlog = 0
    live = winners.filter(F.col("op") == "upsert").select("id")
    rows = spark.read.parquet(base_path)
    try:
        rows = rows.unionByName(spark.read.parquet(delta_path))
    except AnalysisException:
        pass
    n_terms = (
        rows.join(F.broadcast(live), "id", "left_semi")
        .select("term")
        .distinct()
        .count()
    )
    return {
        "generation": store._current_gen(),
        "dirty": read_marker(
            spark, store._os.path.join(gen_dir, "_DIRTY")
        ) is not None,
        "live_docs": int(by_op.get("upsert", 0)),
        "tombstones": int(by_op.get("delete", 0)),
        "live_terms": int(n_terms),
        "mutation_backlog_rows": int(backlog),
        "bytes": {
            "postings": _dir_bytes(store._os, base_path),
            "delta": _dir_bytes(store._os, delta_path),
            "muts": _dir_bytes(store._os, muts_path),
            "muts_log": _dir_bytes(store._os, store._muts_log_path()),
        },
    }
