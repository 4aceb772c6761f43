"""VectorEngine — the user-facing facade mirroring the reference's service
surface (the 5 RPCs of proto/search.proto:74-80: Search, BatchSearch,
Upsert, Delete, WarmCache) as library calls over DataFrames.

Control-plane mapping (SURVEY.md §2.5-§2.6): the Spark driver is the
single writer (the "leader"), so:

- G1/G2 consistency gates (search_service_impl.cc:10-31,52-62):
  ``consistency="strong"`` compacts all pending mutations into the
  snapshot before reading; ``"eventual"`` reads the current compacted
  snapshot without forcing the apply; ``"bounded_staleness"`` reads the
  current snapshot while the pending-mutation lag is within
  ``max_staleness`` and compacts like STRONG beyond it (the reference
  declares the level but implements no bound — this engine makes it
  real; see ``DEFAULT_MAX_STALENESS``).  There is no non-leader to
  reject requests — the FAILED_PRECONDITION path is structurally
  impossible here.
- G3 leader-only writes: all mutations funnel through this object,
  which assigns the dense ``seq`` (the Raft total order, R1).
- M4 cache invalidation: every accepted mutation bumps the snapshot
  version and clears the query cache (shard_manager.cc:90,100-101).

Scale notes: the snapshot is any DataFrame — 100 TB of bucketed parquet
works unchanged; ``compact()`` is the only operation that rewrites data,
and it shuffles only on ``vec_id`` (co-partitioned under bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.cache import PersistentResultCache, QueryCache
from .operators.knn import knn, shard_cardinality
from .operators.mutations import MutationLog, apply_mutations
from .schemas import QUERIES_SCHEMA, assert_vector_dimension

STRONG = "strong"
BOUNDED_STALENESS = "bounded_staleness"
EVENTUAL = "eventual"
_LEVELS = (STRONG, BOUNDED_STALENESS, EVENTUAL)


class VectorEngine:
    """Exact-kNN vector table with mutation log, result cache, and
    consistency-gated reads."""

    def __init__(
        self,
        spark,
        vectors: DataFrame,
        *,
        dim: int | None = None,
        cache: QueryCache | None = None,
        persistent_cache: PersistentResultCache | None = None,
        validate: bool = False,
        shard_col: str | None = None,
        auto_compact_threshold: int | None = None,
        auto_checkpoint_every: int | None = None,
        max_staleness: int | float | None = None,
    ):
        self._spark = spark
        self._max_staleness = (
            self.DEFAULT_MAX_STALENESS if max_staleness is None else max_staleness
        )
        self._dim = dim
        if validate and dim is not None:
            # load-time dimension invariant (vector_shard.cc:36-38)
            assert_vector_dimension(vectors, dim)
        self._snapshot = vectors
        self._log = MutationLog(spark, dim=dim)
        self._pending = 0
        # maintenance policy: compact once the pending log reaches the
        # threshold (bounds read amplification: every STRONG read and
        # search otherwise re-folds the whole pending log), and cut
        # lineage every N compactions (bounds PLAN depth — each compact
        # layers a window+anti-join+union onto the snapshot plan)
        self._auto_compact = auto_compact_threshold
        self._auto_checkpoint = auto_checkpoint_every
        self._compactions = 0
        self._cache = cache if cache is not None else QueryCache()
        # optional second cache tier surviving across sessions (reference
        # C2/C3 live for the node-process lifetime, query_cache.cc:15-43;
        # a Spark "process" is the storage layer, so the durable tier is
        # a parquet-backed table)
        self._pcache = persistent_cache
        self._shard_col = shard_col
        self.version = 0
        # PQ codebooks are data-derived → memoized per (snapshot EPOCH,
        # geometry).  The epoch bumps only when the compacted snapshot's
        # content actually changes (compact / bulk apply), NOT at
        # mutation time like ``version``: an EVENTUAL pq search between
        # a mutation and its compaction reads the pre-mutation snapshot,
        # so books trained there must be keyed to that snapshot — keying
        # on ``version`` would cache stale books under the new version
        # and keep serving them after compaction (ADVICE r04).
        self._snapshot_epoch = 0
        self._pq_books: list | None = None
        self._pq_books_key: tuple[int, int, int] | None = None
        # persisted-index serving tier (round 7, VERDICT r06 item 4):
        # declared via attach_index(); indexes are built lazily per
        # snapshot EPOCH (like the PQ codebook memo), so a mutation's
        # compaction invalidates them and the next indexed read rebuilds
        # — a stale persisted index can never keep serving.
        self._index_root: str | None = None
        self._index_conf: dict | None = None
        self._index_state: dict[tuple, tuple] = {}
        #: observable build counter (tests assert reuse vs rebuild)
        self.index_builds = 0
        # incremental (merge-on-read) serving tier — attach_store();
        # mutations flow to it as O(Δ) appends at compaction instead of
        # the per-epoch full rebuild attach_index pays (VERDICT r07
        # item 1; the lexical side proved the pattern in round 7,
        # text_engine.TextEngine.attach_store)
        self._store = None
        self._store_conf: dict | None = None
        self._store_seq_base = 0
        # semantic cache store (C4 made live at the ENGINE surface,
        # VERDICT r04 item 6): (cached_id, qvec, k, rows) of previously
        # computed searches, probed by operators/cache.semantic_probe.
        # Bounded like the exact cache; cleared on every mutation (M4).
        self._semantic_entries: list[tuple[int, list[float], int, list]] = []
        self._semantic_next_id = 0

    # -- reads -------------------------------------------------------------

    #: BOUNDED_STALENESS lag bound: a bounded read tolerates at most
    #: this many pending (uncompacted) mutations; beyond it the gate
    #: compacts like STRONG.  The reference declares the level but
    #: implements no bound (src/rpc/search_service_impl.cc:10-12 treats
    #: it as EVENTUAL); this engine makes the bound real — staleness is
    #: measured in leader-ordered mutations, the one clock the
    #: single-writer log actually has.  max_staleness=0 degenerates to
    #: STRONG; float("inf") restores the reference's eventual-aliasing.
    DEFAULT_MAX_STALENESS = 8

    def _read_snapshot(self, consistency: str) -> DataFrame:
        if consistency not in _LEVELS:
            raise ValueError(f"unknown consistency level: {consistency!r}")
        if consistency == STRONG and self._pending:
            self.compact()
        elif (
            consistency == BOUNDED_STALENESS
            and self._pending > self._max_staleness
        ):
            self.compact()
        return self._snapshot

    def search(
        self,
        queries: DataFrame,
        k: int,
        *,
        consistency: str = EVENTUAL,
        method: str = "expr",
        pq_m: int = 8,
        pq_ksub: int = 16,
        semantic_threshold: float | None = None,
        where=None,
        round_scores: int | None = None,
    ) -> DataFrame:
        """Search == BatchSearch: N query rows, one plan (SURVEY §3.2).

        ``method``: "expr" (codegen expressions), "numpy" (Arrow GEMM),
        "quantized" (int8 coarse scan + exact re-rank — the 100 TB
        IO-bound tier, operators/quantize.py), "pq" (product-
        quantized ADC coarse scan + exact re-rank, operators/pq.py;
        needs ``dim``), "auto" (expr vs GEMM by the engine's
        declared dimension — the measured d768 crossover), or — once
        ``attach_index(root)`` has been called — one of
        ``INDEXED_METHODS`` ("ivf" / "ivfpq" / "sq8" / "cosine_ivf" /
        "cosine_ivfpq"): partition-pruned serving from a persisted
        per-epoch index under the same gates and invalidation (see
        ``attach_index``; cosine kinds return ``cosine`` instead of
        ``distance``).  Approximate tiers return EXACT distances —
        approximation only selects which candidates reach the re-rank.

        ``round_scores=N`` (``"ivf"`` / ``"cosine_ivf"`` only): rank
        the indexed leg on N-decimal-ROUNDED scores with id tie-break —
        the hybrid-fusion determinism convention
        (operators/retrieval.py; ``HybridEngine`` passes 6).  Other
        methods rank raw, matching their own oracles, and reject the
        parameter.

        ``semantic_threshold``: enable SEMANTIC cache reuse (the
        reference's dead ``exact_match`` hook made live — C4): each
        query is first probed against previously computed searches
        (operators/cache.semantic_probe); a query whose cosine to some
        cached query vector is >= the threshold is served that entry's
        stored rows, the rest fall through to the exact path and fill
        the store.  The result gains a ``served_by`` column (serving
        cache-entry id, NULL for computed rows).  Served rows carry the
        CACHED query's distances — exact only when the probe matched an
        identical vector (threshold 1.0); any lower threshold is an
        explicit approximation opt-in.  The store is invalidated by
        every mutation, like the digest cache (M4).

        ``where`` (Column or SQL string): metadata PRE-filter — the k
        results are the k nearest vectors SATISFYING the predicate
        (filtered search, mirroring ``search_ivf_index(where=)``).  The
        filter restricts candidate scanning on every method; the PQ
        codebooks stay trained on the unfiltered snapshot (they are a
        property of the corpus, and the memo key stays filter-free —
        approximation only affects candidate selection, the re-rank is
        exact over matching rows).  Incompatible with
        ``semantic_threshold``: cached results were computed under a
        different (or no) predicate and must not serve filtered reads."""
        snap = self._read_snapshot(consistency)
        if where is not None and semantic_threshold is not None:
            raise ValueError(
                "where= cannot combine with semantic_threshold=: the semantic "
                "store is keyed by query vector only, not by predicate"
            )
        if semantic_threshold is not None and method in (
            "cosine_ivf", "cosine_ivfpq",
        ):
            raise ValueError(
                "semantic_threshold= cannot combine with cosine index methods: "
                "the semantic store fills from distance-shaped results"
            )
        if round_scores is not None and (
            method not in ("ivf", "cosine_ivf") or semantic_threshold is not None
        ):
            raise ValueError(
                "round_scores= is supported only for method='ivf'/'cosine_ivf' "
                "without semantic_threshold="
            )
        if semantic_threshold is not None:
            return self._search_semantic(
                queries, k, semantic_threshold, method=method, consistency=consistency
            )
        scan = snap
        if where is not None:
            scan = snap.filter(F.expr(where) if isinstance(where, str) else where)
        if (
            method in ("quantized", "pq", "store")
            or method in self.INDEXED_METHODS
        ) and self._shard_col is not None:
            raise ValueError(
                f"{method} search does not carry shard columns; use method='expr'"
            )
        if method == "store":
            if self._store is None:
                raise ValueError(
                    "method='store' requires attach_store(root) first"
                )
            # the gate already ran: STRONG compacted pending mutations,
            # which pushed them to the store as O(Δ) appends — the
            # store state tracks the compacted snapshot exactly
            return self._store.search(
                self._spark, queries, k,
                n_probe=self._store_conf["n_probe"], where=where,
            )
        if method in self.INDEXED_METHODS:
            return self._search_indexed(
                queries, k, method, where=where, round_scores=round_scores
            )
        if method == "auto":
            # measured dispatch (bench d768 section): the Arrow GEMM
            # kernel beats the codegen expression tier once the row
            # width makes the per-element HOF fold dominate — crossover
            # sits well below the reference's d=768 (0.97 s GEMM vs
            # 3.5 s expr at 20k x 768) and above the 64-dim fixtures.
            # Unknown dim (no engine dim declared) stays on expr, the
            # oracle-comparable default.
            method = "numpy" if (self._dim or 0) >= self.AUTO_GEMM_MIN_DIM else "expr"
        if method == "quantized":
            from .operators.quantize import quantized_knn

            # same measured crossover as exact kNN (bench d768): at high
            # dims the per-element codegen fold loses to the Arrow GEMM
            # kernel by ~4×, so the coarse int8 scan dispatches on the
            # declared dimension too (ADVICE/VERDICT r05 item 8)
            coarse = (
                "numpy"
                if (self._dim or 0) >= self.AUTO_GEMM_MIN_DIM
                else "expr"
            )
            return quantized_knn(scan, queries, k, coarse_method=coarse)
        if method == "pq":
            if self._dim is None:
                raise ValueError("method='pq' requires the engine's dim")
            from .operators.pq import pq_adc_topk, pq_sample_codebooks

            key = (self._snapshot_epoch, pq_m, pq_ksub)
            if self._pq_books is None or self._pq_books_key != key:
                # trained on the UNFILTERED snapshot (see docstring)
                self._pq_books = pq_sample_codebooks(
                    snap, dim=self._dim, m=pq_m, ksub=pq_ksub
                )
                self._pq_books_key = key
            return pq_adc_topk(scan, queries, k, self._pq_books)
        return knn(scan, queries, k, shard_col=self._shard_col, method=method)

    #: persisted-index serving methods accepted by ``search`` once
    #: ``attach_index`` has declared a root (VERDICT r06 item 4: the
    #: reference's single ``ShardManager::Search`` surface serves every
    #: tier through one call — these give the partition-pruned stores
    #: the same front door, behind the same gates, as the scan tiers)
    INDEXED_METHODS = (
        "ivf", "ivfpq", "sq8", "binary",
        "cosine_ivf", "cosine_ivfpq", "cosine_sq8", "cosine_binary",
    )

    def attach_index(
        self,
        root: str,
        *,
        num_cells: int = 16,
        n_probe: int = 4,
        rerank: int = 10,
        pq_m: int = 8,
        pq_ksub: int = 16,
        replicas: int = 1,
        centroid_source: str = "head",
        keep_epochs: int | None = None,
    ) -> None:
        """Declare a persisted-index serving tier rooted at ``root``.

        After this, ``search(method="ivf" | "ivfpq" | "sq8" | "binary"
        | "cosine_ivf" | "cosine_ivfpq" | "cosine_sq8" |
        "cosine_binary")`` serves from a cell-partitioned parquet index
        (sources/ivf_index.py, sources/ivfpq_index.py,
        sources/ivfsq_index.py, sources/ivfbin_index.py — the sq8 kinds
        are the int8 middle rung of the compression ladder: no codebook
        training, ~8x less coarse IO than float cells, shallow exact
        re-rank; the binary kinds are the 1-bit bottom rung: ~64x less
        coarse IO, integer Hamming coarse rank, and a DEEP re-rank —
        size ``rerank`` per search_ivf_binary_index's sizing rule — the
        attach-level default 10 is far below the binary rung's measured
        rerank≈64 for ≥0.9 recall) instead of a scan — the 100 TB read
        path —
        while keeping the SAME
        consistency gates, caches, and invalidation as every other
        method:

        - indexes are built lazily at first indexed read and memoized
          per **snapshot epoch** (the PQ-codebook-memo discipline): a
          mutation's compaction bumps the epoch, so the next indexed
          read REBUILDS from the new snapshot — a stale index can never
          keep serving after a write is visible (M4 extended to the
          persisted tier; tested in tests/test_engine.py);
        - ``consistency="strong"`` compacts pending mutations first,
          which itself invalidates the index; ``"eventual"`` serves the
          current compacted snapshot — identical to the scan tiers;
        - each epoch's index lives at ``root/<kind>_e<epoch>``;
          superseded epochs are dropped from the memo, and their
          DIRECTORIES are pruned by :meth:`prune_epochs` — either
          on demand, or automatically at every ``compact()`` when
          ``keep_epochs=N`` is set.  Pruning keeps the newest N epochs
          per kind among those ON DISK, so an in-flight reader of the
          just-superseded epoch survives at least one full
          write→compact cycle before its directory can go (tested in
          tests/test_engine.py; VERDICT r07 item 6 — the keep-last-N
          contract made enforceable instead of policy prose).

        ``centroid_source``: ``"head"`` (default) uses the
        deterministic hash-thinned head sample (the ``ann_ivf_topk``
        scheme); ``"trained"`` runs ``operators.clustering.kmeans_fit``
        over the snapshot at every (re)build — the production build-
        cadence shape (trained cells balance the partition sizes, the
        bench recall section measures the gain).  Either way the space
        is normalized first for the cosine kinds, and codebooks (ivfpq
        kinds) are ``pq_sample_codebooks`` over the same space (needs
        ``dim``).  Correctness is centroid-agnostic: routing only picks
        which cells are probed, the in-cell ranking is exact — at full
        probe both sources return identical results (tested).
        """
        if replicas < 1:
            raise ValueError("replicas must be >= 1")
        if centroid_source not in ("head", "trained"):
            raise ValueError("centroid_source must be 'head' or 'trained'")
        if keep_epochs is not None and keep_epochs < 1:
            raise ValueError("keep_epochs must be >= 1 (or None)")
        self._index_root = root
        self._index_conf = {
            "num_cells": num_cells,
            "n_probe": n_probe,
            "rerank": rerank,
            "pq_m": pq_m,
            "pq_ksub": pq_ksub,
            "replicas": replicas,
            "centroid_source": centroid_source,
            "keep_epochs": keep_epochs,
        }
        self._index_state = {}

    def prune_epochs(self, keep: int = 1) -> list[str]:
        """Delete superseded per-epoch index directories under the
        ``attach_index`` root, keeping the newest ``keep`` epochs PER
        KIND among those on disk.  Returns the removed paths.

        Reader-safety contract: an index is built lazily AFTER a
        compaction bumps the epoch, so at prune time (compact cadence)
        the newest on-disk epoch is the one just superseded — with
        ``keep=1`` it survives this prune and is dropped only by the
        NEXT cycle's, giving in-flight readers one full cycle to drain
        (the manifest-swap discipline of the merge-on-read stores,
        applied to the rebuild tier)."""
        import os
        import shutil

        if keep < 1:
            raise ValueError("keep must be >= 1")
        if self._index_root is None:
            raise ValueError("prune_epochs requires attach_index(root) first")
        try:
            names = os.listdir(self._index_root)
        except FileNotFoundError:  # nothing built yet
            return []
        by_kind: dict[str, list[tuple[int, str]]] = {}
        for name in names:
            kind, sep, tail = name.rpartition("_e")
            if not sep or not tail.isdigit():
                continue  # not an epoch dir — never touch it
            by_kind.setdefault(kind, []).append((int(tail), name))
        removed = []
        for _kind, epochs in by_kind.items():
            for _epoch, name in sorted(epochs)[:-keep]:
                path = os.path.join(self._index_root, name)
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
        return removed

    def _ensure_index(self, kind: str) -> tuple:
        """Build (or reuse) the ``kind`` index for the CURRENT snapshot
        epoch; returns (path, centroids, codebooks)."""
        import os

        conf = self._index_conf
        key = (
            kind, self._snapshot_epoch, conf["num_cells"],
            conf["pq_m"], conf["pq_ksub"], conf["replicas"],
            conf["centroid_source"],
        )
        state = self._index_state.get(key)
        if state is not None:
            return state
        # anything memoized for an older epoch is stale by definition
        self._index_state.clear()
        snap = self._snapshot
        cosine = kind.startswith("cosine")
        space = snap
        if cosine:
            from .functions.distance import l2_norm, l2_normalize

            space = snap.filter(l2_norm(F.col("embedding")) > 0.0).withColumn(
                "embedding", l2_normalize("embedding")
            )
        if conf["centroid_source"] == "trained":
            from .operators.clustering import kmeans_fit

            cents, _ = kmeans_fit(space, conf["num_cells"])
        else:
            from .operators.sampling import thinned_head_rows
            from .operators.similarity import IVF_THIN_SEED

            rows = thinned_head_rows(
                space.select(
                    F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")
                ),
                conf["num_cells"],
                seed=IVF_THIN_SEED,
                id_col="_id",
            )
            cents = [[float(x) for x in r["_v"]] for r in rows]
        books = None
        if kind.endswith(("ivfpq", "binary")):
            if self._dim is None:
                raise ValueError(f"method={kind!r} requires the engine's dim")
        if kind.endswith("ivfpq"):
            from .operators.pq import pq_sample_codebooks

            books = pq_sample_codebooks(
                space, dim=self._dim, m=conf["pq_m"], ksub=conf["pq_ksub"]
            )
        path = os.path.join(self._index_root, f"{kind}_e{self._snapshot_epoch}")
        from .sources import ivf_index as ivf_mod
        from .sources import ivfpq_index as ivfpq_mod

        from .sources import ivfsq_index as ivfsq_mod

        if kind == "ivf":
            ivf_mod.write_ivf_index(snap, path, cents, replicas=conf["replicas"])
        elif kind == "cosine_ivf":
            ivf_mod.write_cosine_ivf_index(
                snap, path, cents, replicas=conf["replicas"]
            )
        elif kind == "sq8":
            ivfsq_mod.write_ivf_sq8_index(
                snap, path, cents, replicas=conf["replicas"]
            )
        elif kind == "cosine_sq8":
            ivfsq_mod.write_cosine_ivf_sq8_index(
                snap, path, cents, replicas=conf["replicas"]
            )
        elif kind == "binary":
            from .sources import ivfbin_index as ivfbin_mod

            ivfbin_mod.write_ivf_binary_index(
                snap, path, cents, self._dim, replicas=conf["replicas"]
            )
        elif kind == "cosine_binary":
            from .sources import ivfbin_index as ivfbin_mod

            ivfbin_mod.write_cosine_ivf_binary_index(
                snap, path, cents, self._dim, replicas=conf["replicas"]
            )
        elif kind == "ivfpq":
            ivfpq_mod.write_ivfpq_index(
                snap, path, cents, books, replicas=conf["replicas"]
            )
        else:
            ivfpq_mod.write_cosine_ivfpq_index(
                snap, path, cents, books, replicas=conf["replicas"]
            )
        state = (path, cents, books)
        self._index_state[key] = state
        self.index_builds += 1
        return state

    def _search_indexed(
        self, queries: DataFrame, k: int, kind: str, *, where=None,
        round_scores: int | None = None,
    ) -> DataFrame:
        """Serve from the persisted index of the current epoch.  L2
        kinds return (query_id, id, distance, rank); cosine kinds
        return (query_id, id, cosine, rank) — the standalone searchers'
        contracts, unified behind ``search``."""
        if self._index_root is None:
            raise ValueError(
                f"method={kind!r} requires attach_index(root) first"
            )
        path, cents, books = self._ensure_index(kind)
        conf = self._index_conf
        rep = conf["replicas"] > 1
        from .sources import ivf_index as ivf_mod
        from .sources import ivfpq_index as ivfpq_mod

        if kind == "ivf":
            return ivf_mod.search_ivf_index(
                self._spark, path, queries, k, cents,
                n_probe=conf["n_probe"], replicated=rep, where=where,
                round_scores=round_scores,
            )
        if kind == "cosine_ivf":
            return ivf_mod.search_cosine_ivf_index(
                self._spark, path, queries, k, cents,
                n_probe=conf["n_probe"], replicated=rep, where=where,
                round_scores=round_scores,
            )
        if kind == "sq8":
            from .sources import ivfsq_index as ivfsq_mod

            return ivfsq_mod.search_ivf_sq8_index(
                self._spark, path, queries, k, cents,
                n_probe=conf["n_probe"], rerank=conf["rerank"],
                replicated=rep, where=where,
            )
        if kind == "cosine_sq8":
            from .sources import ivfsq_index as ivfsq_mod

            return ivfsq_mod.search_cosine_ivf_sq8_index(
                self._spark, path, queries, k, cents,
                n_probe=conf["n_probe"], rerank=conf["rerank"],
                replicated=rep, where=where,
            )
        if kind == "binary":
            from .sources import ivfbin_index as ivfbin_mod

            return ivfbin_mod.search_ivf_binary_index(
                self._spark, path, queries, k, cents,
                n_probe=conf["n_probe"], rerank=conf["rerank"],
                replicated=rep, where=where,
            )
        if kind == "cosine_binary":
            from .sources import ivfbin_index as ivfbin_mod

            return ivfbin_mod.search_cosine_ivf_binary_index(
                self._spark, path, queries, k, cents,
                n_probe=conf["n_probe"], rerank=conf["rerank"],
                replicated=rep, where=where,
            )
        if kind == "ivfpq":
            return ivfpq_mod.search_ivfpq_index(
                self._spark, path, queries, k, cents, books,
                n_probe=conf["n_probe"], rerank=conf["rerank"],
                replicated=rep, where=where,
            )
        return ivfpq_mod.search_cosine_ivfpq_index(
            self._spark, path, queries, k, cents, books,
            n_probe=conf["n_probe"], rerank=conf["rerank"],
            replicated=rep, where=where,
        )

    def attach_store(
        self,
        root: str,
        *,
        num_cells: int = 16,
        n_probe: int = 4,
        centroid_source: str = "head",
    ) -> None:
        """Declare the INCREMENTAL vector serving tier: a
        ``streaming.ivf_stream.IvfIndexStore`` rooted at ``root``,
        initialized from the current snapshot (one corpus scan, ever).
        After this, every ``compact()`` pushes the folded mutation log
        into the store as **O(Δ) appends** — upserts land in the delta
        under their (possibly new) cell, every mutation lands one
        arbiter row — and ``search(method="store")`` serves the
        merge-on-read index, which tracks the compacted snapshot
        exactly under the SAME consistency gates (a STRONG read
        compacts → pushes → reads; tested against the expr path).

        This closes the engine's last O(corpus)-per-write asymmetry
        (VERDICT r07 item 1): ``attach_index`` rebuilds the whole
        persisted index at every snapshot epoch — the reference's own
        full-rewrite-per-mutation shape (src/index/vector_shard.cc:
        101-106) at compaction cadence — while the store pays O(batch)
        per compaction and amortizes re-clustering into its own
        ``compact_store()`` (manifest-swapped generations, crash- and
        reader-safe), exactly like the lexical side's
        ``TextEngine.attach_store``.

        Centroids are computed ONCE from the attach-time snapshot
        (``"head"`` = the deterministic hash-thinned sample, or
        ``"trained"`` = ``kmeans_fit``) and stay fixed for the store's
        lifetime — the merge-on-read contract: new vectors are assigned
        to their nearest EXISTING cell map-side, so routing never needs
        a rebuild; correctness is centroid-agnostic (probing selects
        candidates, in-cell ranking is exact)."""
        if self._pending:
            # the store must initialize from a fold point; pending
            # entries compact into the snapshot it scans (their seqs
            # would otherwise double-apply on the next push)
            self.compact()
        if centroid_source not in ("head", "trained"):
            raise ValueError("centroid_source must be 'head' or 'trained'")
        if self._shard_col is not None:
            raise ValueError(
                "attach_store does not carry shard columns; the store's "
                "cell partitioning replaces shard routing"
            )
        need = {"vec_id", "embedding", "label"}
        if not need <= set(self._snapshot.columns):
            raise ValueError(
                f"attach_store requires snapshot columns {sorted(need)}"
            )
        if centroid_source == "trained":
            from .operators.clustering import kmeans_fit

            cents, _ = kmeans_fit(self._snapshot, num_cells)
        else:
            from .operators.sampling import thinned_head_rows
            from .operators.similarity import IVF_THIN_SEED

            rows = thinned_head_rows(
                self._snapshot.select(
                    F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")
                ),
                num_cells,
                seed=IVF_THIN_SEED,
                id_col="_id",
            )
            cents = [[float(x) for x in r["_v"]] for r in rows]
        from .streaming.ivf_stream import IvfIndexStore

        store = IvfIndexStore(root, cents)
        store.init_base(self._snapshot.select("vec_id", "embedding", "label"))
        self._store = store
        self._store_conf = {"n_probe": n_probe}
        self._store_seq_base = 0

    def _push_to_store(self, log: DataFrame, max_seq: int) -> None:
        """Append one compacted mutation log to the attached store with
        seqs remapped onto the engine's store-global monotone range —
        each ``MutationLog`` restarts at 1, so raw seqs from a later
        compaction would lose LWW arbitration against an earlier one.
        ``max_seq`` is the log's highest seq (driver-known, no extra
        job); the next push's offset starts strictly above it."""
        offset = self._store_seq_base
        self._store.append_batch(
            log.select(
                (F.lit(offset) + F.col("seq")).cast("long").alias("seq"),
                "op",
                "vec_id",
                "embedding",
                "label",
            )
        )
        self._store_seq_base = offset + int(max_seq)

    def compact_store(self) -> None:
        """Fold the attached store's delta+muts into a fresh clustered
        generation (amortized maintenance, off the write path) — the
        atomic manifest swap keeps concurrent readers on a complete
        snapshot either side of the commit."""
        if self._store is None:
            raise ValueError("compact_store requires attach_store(root) first")
        self._store.compact(self._spark)

    @property
    def store(self):
        """The attached ``IvfIndexStore`` (read-only handle), or None."""
        return self._store

    #: bound on the semantic store, mirroring the exact cache default
    SEMANTIC_MAX_ENTRIES = 1024

    #: method="auto" picks the Arrow GEMM kernel at or above this
    #: dimension (see the dispatch comment in ``search``)
    AUTO_GEMM_MIN_DIM = 256

    def _search_semantic(
        self,
        queries: DataFrame,
        k: int,
        threshold: float,
        *,
        method: str,
        consistency: str,
    ) -> DataFrame:
        """probe → exact search on miss → store fill (see ``search``)."""
        from .operators.cache import semantic_probe

        spark = self._spark
        qcols = queries.select("query_id", "qvec")
        entries = [e for e in self._semantic_entries if e[2] == k]
        if entries:
            cached_df = spark.createDataFrame(
                [(cid, qv) for cid, qv, _, _ in entries],
                "cached_id long, cvec array<double>",
            )
            probe = semantic_probe(cached_df, qcols, threshold=threshold)
            hit_map = {
                r["query_id"]: r["served_by"]
                for r in probe.filter("hit").collect()
            }
        else:
            hit_map = {}
        rows_by_cid = {cid: rows for cid, _, kk, rows in entries if kk == k}
        served_rows = [
            (qid, rid, dist, rank, cid)
            for qid, cid in hit_map.items()
            for (rid, dist, rank) in rows_by_cid[cid]
        ]
        miss_q = qcols.filter(~F.col("query_id").isin(list(hit_map)))
        # compute misses ONCE (materialized — this IS the cache-fill
        # action, same contract as search_one's collect+insert; query
        # batches are small so the collected set is k x |misses| rows)
        qv_by_id = {
            r["query_id"]: [float(x) for x in r["qvec"]] for r in miss_q.collect()
        }
        new_by_q: dict[int, list] = {qid: [] for qid in qv_by_id}
        if qv_by_id:
            for r in self.search(
                miss_q, k, consistency=consistency, method=method
            ).collect():
                new_by_q[r["query_id"]].append((r["id"], r["distance"], r["rank"]))
        for qid, rows in new_by_q.items():
            self._semantic_entries.append(
                (self._semantic_next_id, qv_by_id[qid], k,
                 sorted(rows, key=lambda t: t[2]))
            )
            self._semantic_next_id += 1
        while len(self._semantic_entries) > self.SEMANTIC_MAX_ENTRIES:
            self._semantic_entries.pop(0)
        out_schema = "query_id long, id long, distance double, rank int, served_by long"
        computed_rows = [
            (qid, rid, dist, rank, None)
            for qid, rows in new_by_q.items()
            for (rid, dist, rank) in rows
        ]
        return spark.createDataFrame(computed_rows + served_rows, out_schema)

    def search_one(
        self, query_id: int, qvec, k: int, *, consistency: str = EVENTUAL
    ) -> tuple[list, bool]:
        """Single-query convenience with the cache short-circuit
        (reference Q5 pipeline: lookup → compute → fill)."""
        if k <= 0:
            return [], False
        if consistency == STRONG and self._pending:
            self.compact()  # also invalidates the cache via version bump
        cached = self._cache.lookup(qvec, k)
        if cached is not None:
            return cached, True
        if self._pcache is not None:
            hit = self._pcache.probe(qvec, k)
            if hit is not None:
                rows = [tuple(h[:2]) + (i + 1,) for i, h in enumerate(hit)]
                self._cache.insert(qvec, k, rows)  # promote to the fast tier
                return rows, True
        qdf = self._spark.createDataFrame(
            [(query_id, [float(x) for x in qvec], k)], schema=QUERIES_SCHEMA
        )
        rows = [
            (r["id"], r["distance"], r["rank"])
            for r in self.search(qdf, k).orderBy("rank").collect()
        ]
        self._cache.insert(qvec, k, rows)
        if self._pcache is not None:
            self._pcache.put(qvec, k, [(r[0], r[1], None) for r in rows])
        return rows, False

    def warm(self) -> int:
        """WarmCache RPC analog (Q7): materialize the snapshot into
        executor memory."""
        self._snapshot.persist()
        return self._snapshot.count()

    def size(self) -> int:
        return self._read_snapshot(EVENTUAL).count()

    def cardinality(self) -> DataFrame:
        if self._shard_col is None:
            raise ValueError("no shard column configured")
        return shard_cardinality(self._snapshot, self._shard_col)

    # -- writes ------------------------------------------------------------

    def upsert(self, vec_id: int, embedding, *, label: int | None = None,
               shard_id: str | None = None) -> None:
        self._log.upsert(vec_id, embedding, label=label, shard_id=shard_id)
        self._on_mutation()

    def delete(self, vec_id: int, *, shard_id: str | None = None) -> None:
        self._log.delete(vec_id, shard_id=shard_id)
        self._on_mutation()

    def upsert_batch(self, updates: DataFrame) -> None:
        """Bulk path: fold a whole DataFrame of (vec_id, embedding, label)
        upserts into the snapshot in one generation — at scale this is
        the only write shape that matters.  All rows share one generation
        seq: the contract is one row per id (duplicate ids are collapsed
        to an arbitrary row — a DataFrame has no row order to break the
        tie with), so no intra-batch ordering is needed — avoiding a
        global-window sort that would bottleneck on one partition at
        scale.

        Write order (G3/R1): any pending single upsert/delete entries were
        issued BEFORE this batch, so they are compacted into the snapshot
        first; the batch then overrides them — the driver-assigned total
        order is preserved (a replay can never resurrect an older write
        over a newer batch row).
        """
        if self._pending:
            self.compact()
        base_seq = 10_000_000 * (self.version + 1)
        types = {f.name: f.dataType for f in self._snapshot.schema.fields}
        payload = [c for c in self._snapshot.columns if c != "vec_id"]
        log = updates.dropDuplicates(["vec_id"]).select(
            F.lit(base_seq).cast("long").alias("seq"),
            F.lit("upsert").alias("op"),
            "vec_id",
            *[
                F.col(c) if c in updates.columns
                else F.lit(None).cast(types[c]).alias(c)
                for c in payload
            ],
        )
        self._snapshot = apply_mutations(self._snapshot, log)
        if self._store is not None:
            # the bulk log's rows share one constant seq (= base_seq),
            # so remapping preserves it and the next push lands above
            self._push_to_store(log, max_seq=base_seq)
        self._snapshot_epoch += 1
        self._on_mutation(applied=True)

    def _on_mutation(self, applied: bool = False) -> None:
        self.version += 1
        if not applied:
            self._pending += 1
        self._cache.invalidate()  # M4: full clear on any write
        self._semantic_entries.clear()  # semantic tier follows M4 too
        if self._pcache is not None:
            self._pcache.invalidate()  # epoch bump — no table rewrite
        if self._auto_compact is not None and self._pending >= self._auto_compact:
            self.compact()

    # -- maintenance -------------------------------------------------------

    def compact(self) -> None:
        """Fold the pending mutation log into the snapshot (R11 replay).
        An attached store receives the SAME log as O(Δ) appends
        (``attach_store``) — store state == compacted snapshot by
        construction (identical per-seq LWW fold)."""
        if self._pending:
            log_df = self._log.to_df()
            self._snapshot = apply_mutations(self._snapshot, log_df)
            if self._store is not None:
                self._push_to_store(log_df, max_seq=self._log.max_seq)
            self._log = MutationLog(self._spark, dim=self._dim)
            self._pending = 0
            self._snapshot_epoch += 1
            self._compactions += 1
            if (
                self._index_conf is not None
                and self._index_conf.get("keep_epochs") is not None
            ):
                self.prune_epochs(self._index_conf["keep_epochs"])
            if (
                self._auto_checkpoint is not None
                and self._compactions % self._auto_checkpoint == 0
            ):
                self._snapshot = self._snapshot.localCheckpoint(eager=True)

    def checkpoint(self, path: str | None = None) -> None:
        """Cut the snapshot's lineage (reference S2 persist,
        vector_shard.cc:101-106 — but at compaction cadence, not per
        mutation).

        Every ``compact()`` layers a window + anti-join + union onto the
        snapshot plan; after many write/compact cycles the PLAN, not the
        data, becomes the bottleneck (analysis time grows per layer and a
        task failure would recompute the whole chain).  ``checkpoint``
        materializes the current snapshot and restarts the lineage:
        to parquet at ``path`` (durable, partitioned by the shard column
        when present — survives the session), or via ``localCheckpoint``
        (cluster-memory/disk, session-scoped) when ``path`` is None.
        """
        self.compact()
        if path is None:
            self._snapshot = self._snapshot.localCheckpoint(eager=True)
            return
        from .sources.parquet import read_vectors, write_vectors

        cols = self._snapshot.columns  # partitionBy moves the shard col last
        # read back with the EXPLICIT pre-write schema: partition-column
        # type inference parses the partition VALUES, so a cast after
        # inference cannot undo its loss (string shard '01' → int 1 →
        # cast back '1'; '0' and '00' collide).  With the schema given,
        # inference never runs and the raw directory strings are read as
        # the declared type (ADVICE r03, superseding the r02 cast fix).
        pre_schema = self._snapshot.schema
        write_vectors(
            self._snapshot, path,
            shard_col=self._shard_col if self._shard_col else None,
        )
        self._snapshot = read_vectors(self._spark, path, schema=pre_schema).select(*cols)

    @property
    def cache(self) -> QueryCache:
        return self._cache

    @classmethod
    def from_config(cls, spark, vectors: DataFrame, config) -> "VectorEngine":
        """Build from an EngineConfig (reference S3→S4 wiring: node_main.cc
        constructs the ShardManager from the parsed NodeConfig): the
        config's dimension becomes the validated invariant and its cache
        sizing becomes the QueryCache bounds.  A shard column is used iff
        the config declares shards."""
        return cls(
            spark,
            vectors,
            dim=config.dimension,
            validate=True,
            cache=QueryCache(
                max_entries=config.cache_max_entries,
                ttl_seconds=config.cache_ttl_seconds,
            ),
            shard_col="shard_id" if config.shards and "shard_id" in vectors.columns else None,
        )
