"""Exact k-nearest-neighbor search — the reference's core query surface.

Reference operators covered (SURVEY.md §2.2):

- Q1 exact kNN shard scan  (src/index/vector_shard.cc:72-94)
- Q2 query validation      (src/index/shard_manager.cc:121-127)
- Q3 parallel shard fan-out (src/index/shard_manager.cc:46-51)
- Q4 top-k merge           (src/index/shard_manager.cc:129-145)
- Q5 single search         (src/index/shard_manager.cc:30-59)
- Q6 batch search          (src/index/shard_manager.cc:61-78)
- Q7 cache warm            (src/index/shard_manager.cc:105-119)
- Q8 cardinality           (src/index/vector_shard.cc:96-99)

Spark-first shape: Search and BatchSearch collapse into ONE dataflow —
queries are rows.  ``broadcast(queries) × vectors → distance projection →
per-query top-k``.  The shard fan-out (Q1 under OpenMP) is simply Spark's
task-per-partition parallelism; the per-shard partial top-k + global merge
(Q3+Q4) is what Spark ≥3.5's ``WindowGroupLimit`` rule performs
automatically for ``row_number() <= k`` — each map task emits only its
partition-local top-k before the shuffle, the reduce side merges.  That is
exactly the reference's two-level merge, picked by the optimizer instead
of hand-scheduled.

Scale notes (100 TB): the vectors side never shuffles its payload — only
(query_id, id, distance) triples ≤ k per partition per query reach the
exchange.  Query sets are broadcast (they are small by contract, like the
reference's single-request/batch RPCs).  For huge query sets use
``operators.similarity.ann_lsh`` to prune candidates first.

Determinism: the reference sorts by distance only, leaving ties
implementation-defined (src/index/shard_manager.cc:134-144); we impose a
total order ``(rank_key(distance), id)`` — the 6-decimal half-even
rounding of functions.distance.rank_key, computed bit-identically by
the expr tier, the numpy kernels, and the DuckDB oracles — so results
are reproducible, partitioning-independent, and oracle-comparable
(ADVICE r07: every tier of one query surface must rank on one key).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import rank_key, squared_l2

#: Columns of a kNN result (reference SearchResponse.ScoredPoint,
#: proto/search.proto:26-35, plus the imposed rank).
RESULT_COLS = ("query_id", "id", "distance", "rank")


def _topk_window(k: int, query_id_col: str = "query_id"):
    """Per-query rank over ``(rank_key(distance), id)`` — the repo-wide
    distance-space order (functions.distance.rank_key): 6-decimal
    half-even rounding collapses BLAS/summation ulp noise so the expr,
    numpy, and DuckDB-oracle tiers select and rank the SAME rows; the
    raw ``distance`` column is untouched (ADVICE r07)."""
    return (
        F.row_number()
        .over(
            Window.partitionBy(query_id_col).orderBy(
                rank_key("distance").asc(), F.col("id").asc()
            )
        )
        .alias("rank")
    )


def knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    shard_col: str | None = None,
    method: str = "expr",
) -> DataFrame:
    """Exact squared-L2 top-k for every query row (reference Q1-Q6).

    ``method="expr"``  — pure Catalyst expressions (oracle-comparable).
    ``method="numpy"`` — Arrow-batched BLAS kernel (hot path; same
    results up to float summation order).

    k=0 (or negative) returns an empty result with the right schema —
    the reference's early-exit guard (src/index/shard_manager.cc:31-36).
    """
    out_cols = [
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col("distance"),
    ]
    if shard_col is not None:
        out_cols.append(F.col(shard_col).cast("string").alias("shard_id"))

    if k <= 0:
        empty = (
            vectors.crossJoin(queries.limit(0))
            .withColumn("distance", F.lit(0.0))
            .select(*out_cols)
            .withColumn("rank", F.lit(0))
        )
        return empty.limit(0)

    if method == "numpy":
        return _knn_numpy(
            vectors,
            queries,
            k,
            id_col=id_col,
            vector_col=vector_col,
            query_id_col=query_id_col,
            query_vector_col=query_vector_col,
            shard_col=shard_col,
        )

    scored = vectors.join(F.broadcast(queries), how="cross").select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("id"),
        squared_l2(F.col(vector_col), F.col(query_vector_col)).alias("distance"),
        *([F.col(shard_col).cast("string").alias("shard_id")] if shard_col else []),
    )
    ranked = scored.withColumn("rank", _topk_window(k))
    return ranked.filter(F.col("rank") <= k)


def _select_topk_by_distance_id(d, ids, kk):
    """Indices of the ``kk`` smallest ``(distance, id)`` PAIRS —
    argpartition for the bulk (O(B)), then deterministic repair of the
    boundary-distance tie cohort (sort over the ties only).  Selection
    order within the result is unspecified; callers re-rank globally.
    """
    import numpy as np

    part = np.argpartition(d, kk - 1)[:kk]
    thr = d[part].max()
    strict = np.flatnonzero(d < thr)  # at most kk-1 rows
    tied = np.flatnonzero(d == thr)
    take = kk - len(strict)
    tied = tied[np.argsort(ids[tied], kind="stable")][:take]
    return np.concatenate([strict, tied])


def _select_topk_matrix(d2, ids, kk):
    """Per-column top-``kk`` by ``(distance, id)`` over a ``(B, Q)``
    distance matrix → ``(kk, Q)`` row indices.

    ONE vectorized axis-0 argpartition for every query column, then the
    id-order repair ONLY for columns whose boundary cut is actually
    ambiguous (ADVICE r06: the prior per-column Python loop ran two
    extra O(B) scans per column even when no tie existed).  A column
    needs repair iff rows equal to its boundary distance exist OUTSIDE
    the selected block — when all tied rows are already inside, the
    selected SET is uniquely determined regardless of which indices
    argpartition picked.  The check is three vectorized O(B·Q)
    comparisons; distinct-distance corpora (the common case) repair
    zero columns.
    """
    import numpy as np

    part = np.argpartition(d2, kk - 1, axis=0)[:kk]  # (kk, Q)
    sel_d = np.take_along_axis(d2, part, axis=0)
    thr = sel_d.max(axis=0)  # per-column boundary distance (Q,)
    n_eq_full = (d2 == thr[None, :]).sum(axis=0)
    n_eq_sel = (sel_d == thr[None, :]).sum(axis=0)
    for j in np.flatnonzero(n_eq_full != n_eq_sel):
        part[:, j] = _select_topk_by_distance_id(d2[:, j], ids, kk)
    return part


def _knn_numpy(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str,
    vector_col: str,
    query_id_col: str,
    query_vector_col: str,
    shard_col: str | None,
) -> DataFrame:
    """Arrow/NumPy kNN: one GEMM per Arrow batch + per-batch partial top-k,
    then a tiny global merge.

    This is the FAISS-flat-scan analog (reference src/index/vector_shard.cc:
    72-94): each executor task scans its partition's vectors against the
    broadcast query matrix with one ``||x||^2 - 2 x·q + ||q||^2`` BLAS
    call, keeps only its local top-k (argpartition + deterministic
    tie-boundary repair), and ships
    #partitions × #queries × k triples to the final merge — the same
    two-level partial-sort + merge as reference Q3+Q4, with the shuffle
    carrying only the partials.
    """
    import numpy as np
    import pandas as pd

    # Query sets are small by contract (an RPC batch in the reference);
    # collect to the driver and let Spark broadcast the closure.
    qrows = queries.select(query_id_col, query_vector_col).collect()
    if not qrows:
        # same columns as the non-empty branch, including shard_id
        return knn(
            vectors, queries.limit(0), 0,
            id_col=id_col, vector_col=vector_col,
            query_id_col=query_id_col, query_vector_col=query_vector_col,
            shard_col=shard_col,
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # (Q, d)
    qsq = (qmat * qmat).sum(axis=1)  # (Q,)

    sel = [F.col(id_col).alias("id"), F.col(vector_col).alias("vec")]
    if shard_col is not None:
        sel.append(F.col(shard_col).cast("string").alias("shard_id"))
    src = vectors.select(*sel)

    out_fields = "id long, query_id long, distance double" + (
        ", shard_id string" if shard_col is not None else ""
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(np.stack(pdf["vec"].to_numpy()), dtype=np.float64)  # (B, d)
            xsq = (x * x).sum(axis=1)  # (B,)
            # (B, Q) squared-L2 distance matrix via GEMM
            d2 = xsq[:, None] - 2.0 * (x @ qmat.T) + qsq[None, :]
            np.maximum(d2, 0.0, out=d2)
            b = d2.shape[0]
            kk = min(k, b)
            ids = pdf["id"].to_numpy()
            # partial top-k per query within this Arrow batch, by
            # (rank_key, id): np.round(d2, 6) IS the repo-wide rank key
            # (rint(x*1e6)/1e6 — see functions.distance.rank_key), so
            # the batch cut, the global merge window, and the DuckDB
            # oracle all select on bit-identical values; the RAW
            # distance is what the caller receives.  _select_topk_matrix
            # does one vectorized argpartition for all query columns and
            # repairs only columns whose boundary cohort is ambiguous,
            # keeping selection prefix-closed under the merge order.
            rkey = np.round(d2, 6)
            part = _select_topk_matrix(rkey, ids, kk)  # (kk, Q)
            rows = {
                "id": ids[part].ravel(order="F"),
                "query_id": np.repeat(qids, kk),
                "distance": np.take_along_axis(d2, part, axis=0).ravel(order="F"),
            }
            if shard_col is not None:
                rows["shard_id"] = pdf["shard_id"].to_numpy()[part].ravel(order="F")
            yield pd.DataFrame(rows)

    # the global merge recomputes rank_key(distance) in the window —
    # bit-identical to the rkey each batch cut on (same IEEE ops), so
    # nothing extra needs to ride the shuffle
    partials = src.mapInPandas(scan, schema=out_fields)
    return (
        partials.withColumn("rank", _topk_window(k))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "id",
            "distance",
            *(["shard_id"] if shard_col is not None else []),
            "rank",
        )
    )


def merge_topk(partials: DataFrame, k: int, query_id_col: str = "query_id") -> DataFrame:
    """Global top-k merge of per-shard/per-partition partial results.

    Reference Q4 MergeTopK (src/index/shard_manager.cc:129-145): concat +
    partial_sort + truncate.  Spark shape: row_number over
    (distance, id) per query — Catalyst's WindowGroupLimit keeps it a
    partial top-k before the exchange.
    """
    ranked = partials.withColumn("rank", _topk_window(k, query_id_col))
    return ranked.filter(F.col("rank") <= k)


def sharded_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    shard_col: str,
    **kwargs,
) -> DataFrame:
    """Explicit two-level shard fan-out + merge (reference Q3 + Q4).

    Computes a per-(query, shard) partial top-k, then the global per-query
    merge — the literal shape of the reference's OpenMP fan-out.  Results
    are identical to :func:`knn`; this exists to make the shard semantics
    first-class (and testable) and as the building block when vectors are
    physically partitioned by ``shard_col``.
    """
    id_col = kwargs.get("id_col", "vec_id")
    vector_col = kwargs.get("vector_col", "embedding")
    query_id_col = kwargs.get("query_id_col", "query_id")
    query_vector_col = kwargs.get("query_vector_col", "qvec")

    scored = vectors.join(F.broadcast(queries), how="cross").select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("id"),
        squared_l2(F.col(vector_col), F.col(query_vector_col)).alias("distance"),
        F.col(shard_col).cast("string").alias("shard_id"),
    )
    per_shard = F.row_number().over(
        Window.partitionBy("query_id", "shard_id").orderBy(
            rank_key("distance").asc(), F.col("id").asc()
        )
    )
    partials = scored.withColumn("shard_rank", per_shard).filter(F.col("shard_rank") <= k)
    return merge_topk(partials.drop("shard_rank"), k)


def range_search(
    vectors: DataFrame,
    queries: DataFrame,
    radius_sq: float,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
) -> DataFrame:
    """All neighbors within a squared-L2 radius, ranked by distance.

    The radius analog of the reference's flat scan (FAISS exposes the
    same duality: ``IndexFlatL2::search`` vs ``range_search``; the
    reference only wires up the top-k form, src/index/vector_shard.cc:
    72-94 — this generalizes the identical scan to a distance
    threshold).  The radius predicate is applied INSIDE the scan
    projection (map-side), so only in-radius rows reach the per-query
    rank exchange — at 100 TB the shuffle carries the selectivity of
    the radius, not the corpus.

    Ranks are per-query ``(distance, id)`` positions over the matched
    set; there is deliberately no k cap (that is :func:`knn`)."""
    scored = vectors.join(F.broadcast(queries), how="cross").select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("id"),
        squared_l2(F.col(vector_col), F.col(query_vector_col)).alias("distance"),
    )
    within = scored.filter(F.col("distance") <= F.lit(float(radius_sq)))
    return within.withColumn("rank", _topk_window(0))


def grouped_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    group_col: str,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
) -> DataFrame:
    """Faceted search: exact top-k per (query, group) — e.g. the k
    nearest vectors of EVERY label for each query, in one plan.

    Same scan/window shape as :func:`knn` with the group key joined
    into the window partition — Catalyst's WindowGroupLimit still
    applies (partial top-k per task before the exchange), and the
    group key adds no extra shuffle because it rides the same
    ``(query_id, group)`` hash partitioning the rank needs anyway.
    The reference has no grouping surface; this is the §2.7-style
    relational generalization of Q1/Q4 (partition the merge by an
    attribute), a first-class need for per-source / per-language
    retrieval quotas in training-data pipelines."""
    scored = vectors.join(F.broadcast(queries), how="cross").select(
        F.col(query_id_col).alias("query_id"),
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        squared_l2(F.col(vector_col), F.col(query_vector_col)).alias("distance"),
    )
    w = Window.partitionBy("query_id", "group").orderBy(
        rank_key("distance").asc(), F.col("id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked.filter(F.col("rank") <= k)


def warm(df: DataFrame) -> int:
    """Cache warm (reference Q7, src/index/shard_manager.cc:105-119): the
    reference probes each shard with a dummy query to page indices into
    memory; the Spark analog is persist + a materializing action."""
    df.persist()
    return df.count()


def shard_cardinality(vectors: DataFrame, shard_col: str = "shard_id") -> DataFrame:
    """Per-shard vector count (reference Q8 VectorShard::size,
    src/index/vector_shard.cc:96-99)."""
    return vectors.groupBy(F.col(shard_col).cast("string").alias("shard_id")).agg(
        F.count("*").alias("n_vectors")
    )
