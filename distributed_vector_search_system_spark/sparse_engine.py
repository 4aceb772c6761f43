"""SparseEngine — the learned-sparse serving surface, completing the
engine family (``engine.VectorEngine`` dense, ``text_engine.TextEngine``
lexical, ``text_engine.HybridEngine`` fused; reference single surface:
proto/search.proto:74-80, src/index/shard_manager.cc:30-59).

The engine serves what the MODEL produced: its snapshot is the
doc-granular encoded corpus ``(id, terms array<string>, weights
array<double>)``, and an upsert carries the re-encoded sparse vector —
the engine never derives weights from text (the learned-sparse
contract; the in-container tf–idf encoder is one upstream producer,
``operators.sparse.collect_doc_vectors(sparse_encode(docs))``).

Discipline identical to the siblings, mechanism for mechanism:

- **leader-ordered mutations** (G3/R1): ``upsert_doc_vector`` /
  ``delete_doc`` append to a driver-assigned dense-``seq`` log; replay
  is the same payload-generic LWW fold
  (``operators.mutations.apply_mutations`` over the (terms, weights)
  payload — a doc's vector replaces atomically);
- **consistency gates** (G1): ``strong`` compacts pending mutations
  before reading; ``bounded_staleness`` enforces the real lag bound
  (``max_staleness`` pending mutations, VectorEngine's default);
  ``eventual`` reads the current snapshot;
- **per-epoch index serving** (M4-extended): ``attach_index(root)``
  then ``search(method="indexed")`` serves from a persisted
  term-clustered index at ``root/sparse_e<epoch>`` built lazily per
  snapshot epoch — a compacted write bumps the epoch, so a stale
  index can never serve a post-write read; ``prune_epochs`` /
  ``keep_epochs=`` GC superseded directories with the one-cycle
  reader-drain guarantee;
- **O(Δ) incremental serving** (the 100 TB write path):
  ``attach_store(root)`` initializes a
  ``sources.sparse_index.MutableSparseIndexStore`` from the current
  snapshot (one scan, ever); every ``compact()`` pushes the folded
  log into the store as O(batch) appends — never a rebuild — and
  ``search(method="store")`` serves the merge-on-read postings.

Scale notes: the scan path explodes the gated snapshot map-side and
reuses ``sparse_topk``'s broadcast-restricted plan; the indexed and
store paths read only the query vocabulary's row groups.  The engine
adds no scan, no shuffle, no driver-side data path beyond the
RPC-sized mutation log.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import _LEVELS, EVENTUAL, STRONG, VectorEngine
from .operators.mutations import UPSERT, apply_mutations
from .operators.sparse import sparse_topk


class SparseEngine:
    """Weighted-dot-product retrieval over a model-encoded sparse
    corpus, with the shared mutation/consistency/epoch discipline (see
    module docstring)."""

    def __init__(
        self,
        spark,
        doc_vectors: DataFrame,
        *,
        id_col: str = "id",
        auto_compact_threshold: int | None = None,
        max_staleness: int | float | None = None,
    ):
        for c in (id_col, "terms", "weights"):
            if c not in doc_vectors.columns:
                raise ValueError(
                    f"doc_vectors must carry {id_col!r}, 'terms', 'weights'"
                )
        self._spark = spark
        self._snapshot = doc_vectors
        self._id = id_col
        self._entries: list[tuple[int, str, int, list | None, list | None]] = []
        self._seq = itertools.count(1)
        self._pending = 0
        self._auto_compact = auto_compact_threshold
        self._max_staleness = (
            VectorEngine.DEFAULT_MAX_STALENESS
            if max_staleness is None else max_staleness
        )
        self.version = 0
        self._snapshot_epoch = 0
        self._index_root: str | None = None
        self._keep_epochs: int | None = None
        self._index_state: dict[int, str] = {}
        #: observable build counter (tests assert reuse vs rebuild)
        self.index_builds = 0
        self._store = None

    # -- reads ---------------------------------------------------------------

    def _read_snapshot(self, consistency: str) -> DataFrame:
        if consistency not in _LEVELS:
            raise ValueError(f"unknown consistency level: {consistency!r}")
        if consistency == STRONG and self._pending:
            self.compact()
        elif (
            consistency == "bounded_staleness"
            and self._pending > self._max_staleness
        ):
            self.compact()
        return self._snapshot

    def _triples(self, snap: DataFrame) -> DataFrame:
        return snap.select(
            F.col(self._id).alias("id"),
            F.explode(F.arrays_zip("terms", "weights")).alias("_tw"),
        ).select(
            "id",
            F.col("_tw.terms").alias("term"),
            F.col("_tw.weights").alias("weight"),
        )

    def search(
        self,
        query_postings: DataFrame,
        k: int,
        *,
        consistency: str = EVENTUAL,
        method: str = "scan",
    ) -> DataFrame:
        """Top-k ``(query_id, id, score, rank)`` for queries carrying
        exploded ``(query_id, term, weight)`` postings (any encoder).

        ``method="scan"`` explodes the gated snapshot and runs the
        from-scratch plan; ``"indexed"`` serves the current epoch's
        persisted index (identical rows by the exactness contract);
        ``"store"`` serves the attached merge-on-read store (tracks
        the compacted snapshot exactly)."""
        snap = self._read_snapshot(consistency)
        if method == "scan":
            return sparse_topk(self._triples(snap), query_postings, k)
        if method == "store":
            if self._store is None:
                raise ValueError(
                    "method='store' requires attach_store(root) first"
                )
            return self._store.search(self._spark, query_postings, k)
        if method != "indexed":
            raise ValueError(f"unknown method: {method!r}")
        from .sources.sparse_index import sparse_search_index

        return sparse_search_index(
            self._spark, self._ensure_index(), query_postings, k
        )

    def attach_index(self, root: str, *, keep_epochs: int | None = None) -> None:
        """Declare the per-epoch persisted-index tier (the sibling
        engines' ``attach_index`` discipline; see module docstring)."""
        if keep_epochs is not None and keep_epochs < 1:
            raise ValueError("keep_epochs must be >= 1 (or None)")
        self._index_root = root
        self._keep_epochs = keep_epochs
        self._index_state = {}

    def prune_epochs(self, keep: int = 1) -> list[str]:
        """Delete superseded ``sparse_e<epoch>`` directories, keeping
        the newest ``keep`` (one-cycle reader-drain contract)."""
        import os
        import shutil

        if keep < 1:
            raise ValueError("keep must be >= 1")
        if self._index_root is None:
            raise ValueError("prune_epochs requires attach_index(root) first")
        try:
            names = os.listdir(self._index_root)
        except FileNotFoundError:
            return []
        epochs = []
        for name in names:
            kind, sep, tail = name.rpartition("_e")
            if kind == "sparse" and sep and tail.isdigit():
                epochs.append((int(tail), name))
        removed = []
        for _epoch, name in sorted(epochs)[:-keep]:
            path = os.path.join(self._index_root, name)
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
        return removed

    def _ensure_index(self) -> str:
        import os

        if self._index_root is None:
            raise ValueError("method='indexed' requires attach_index(root) first")
        path = self._index_state.get(self._snapshot_epoch)
        if path is not None:
            return path
        from .sources.sparse_index import write_sparse_index_triples

        self._index_state.clear()  # older epochs are stale by definition
        path = os.path.join(self._index_root, f"sparse_e{self._snapshot_epoch}")
        write_sparse_index_triples(self._triples(self._snapshot), path)
        self._index_state[self._snapshot_epoch] = path
        self.index_builds += 1
        return path

    def attach_store(self, root: str) -> None:
        """Declare the O(Δ) incremental tier: a MutableSparseIndexStore
        initialized from the current snapshot; every ``compact()``
        pushes the folded log as O(batch) appends (never a rebuild)."""
        from .sources.sparse_index import MutableSparseIndexStore

        if self._pending:
            # store seqs must start after the fold-point (the sibling
            # engines' contract): compact so pending entries fold into
            # the snapshot the store initializes from
            self.compact()
        store = MutableSparseIndexStore(root)
        store.init_base(
            self._snapshot.select(
                F.col(self._id).alias("id"), "terms", "weights"
            )
        )
        # engine seqs already assigned (now folded) bound any default
        # sweep seq from below, even before the first post-attach push
        store.seq_floor = self.version
        self._store = store
        # NOTE on seq discipline: this engine's seq counter is
        # engine-lifetime monotone and never resets at compaction
        # (unlike VectorEngine's per-push MutationLog, which needs the
        # attach_store seq remap) — store base rows sit at seq 0, every
        # engine seq is ≥ 1, so the cross-push total order holds by
        # construction.

    def size(self) -> int:
        return self._read_snapshot(EVENTUAL).count()

    # -- writes ---------------------------------------------------------------

    def upsert_doc_vector(self, doc_id: int, terms, weights) -> None:
        """LWW upsert of a document's ENTIRE sparse vector (the model
        re-encoding unit; M1 semantics)."""
        terms = [str(t) for t in terms]
        weights = [float(w) for w in weights]
        if len(terms) != len(weights):
            raise ValueError("terms and weights must be the same length")
        self._entries.append((next(self._seq), UPSERT, doc_id, terms, weights))
        self._on_mutation()

    def delete_doc(self, doc_id: int) -> None:
        """Tombstone delete; absent id is a no-op (M2 semantics)."""
        self._entries.append((next(self._seq), "delete", doc_id, None, None))
        self._on_mutation()

    def _on_mutation(self) -> None:
        self.version += 1
        self._pending += 1
        if self._store is not None:
            # pending seqs are driver-side until compact — invisible to
            # the store's max(seq) scan, so advance its sweep floor
            # (ADVICE r09; see MutableSparseIndexStore.delete_ids)
            self._store.seq_floor = self._entries[-1][0]
        if self._auto_compact is not None and self._pending >= self._auto_compact:
            self.compact()

    # -- maintenance -----------------------------------------------------------

    def _log_df(self) -> DataFrame:
        return self._spark.createDataFrame(
            self._entries,
            f"seq long, op string, {self._id} long, "
            "terms array<string>, weights array<double>",
        )

    def compact(self) -> None:
        """Fold the pending log into the snapshot (R11 replay, payload =
        the (terms, weights) arrays) and bump the snapshot epoch; an
        attached store receives the SAME log as O(Δ) appends."""
        if not self._pending:
            return
        log = self._log_df()
        self._snapshot = apply_mutations(
            self._snapshot, log, id_col=self._id
        )
        if self._store is not None:
            self._store.apply_log(
                log.select(
                    "seq", "op", F.col(self._id).alias("id"),
                    "terms", "weights",
                )
            )
        self._entries = []
        self._pending = 0
        self._snapshot_epoch += 1
        if self._index_root is not None and self._keep_epochs is not None:
            self.prune_epochs(self._keep_epochs)
