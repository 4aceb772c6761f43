"""Persisted IVF+binary index: partition-pruned cells × packed sign bits.

The bottom rung of the compressed serving ladder, composed with cell
pruning (VERDICT r08 item 3).  Round 8 added the GLOBAL binary tier
(operators/quantize.py ``binary_knn``: sign bits packed 64-to-a-long,
integer Hamming coarse rank, exact re-rank) — but as a full-corpus
two-phase scan it still reads every row's bit words.  This module gives
the 1-bit codes the same cell-partitioned layout the float
(sources/ivf_index.py), int8 (sources/ivfsq_index.py), and PQ
(sources/ivfpq_index.py) tiers already have, so the 64×-smaller coarse
column ALSO gets partition pruning: probed cells are a ``cell_id IN
(…)`` PartitionFilter and the coarse scan reads ONLY the packed-bits
column — ``8·ceil(d/64)`` bytes/row vs the float column's ``8·d``.

The complete ladder, cheapest coarse IO first:

- **IVF+binary** (d/8 bytes/row, THIS module): sign bits carry
  direction only, so Hamming approximates ANGULAR closeness — the
  re-rank must sit far deeper than the int8 rung (see the sizing rule
  on :func:`search_ivf_binary_index`).  Right as the FIRST cut when
  even the int8 column is IO-prohibitive, feeding a deeper exact
  (or int8) re-rank.
- **IVF+PQ** (m bytes/row): trained codebooks, ADC coarse scores with
  magnitude information; rerank≈50 for ≥0.9 recall with default books.
- **IVF+SQ8** (d+8 bytes/row): near-exact coarse ordering, shallow
  rerank=3 — the serving default.
- **IVF float** (8d bytes/row): exact in-cell scan, no re-rank.

Flow (mirrors ivfsq_index stage for stage; every stage deterministic,
so the pipeline replays in a DuckDB oracle — registry/vector.py
``ann_ivfbin_topk``; Hamming replays as the per-dimension
sign-disagreement count, equal to the packed popcount by construction):

1. **Route**: each query's ``n_probe`` nearest cells → partition
   filter; unprobed directories never open.
2. **Binary coarse** (pruned cells, packed-bits column only): Hamming
   distance (popcount of XOR — pure integer codegen), per-query
   partial top-``k·rerank``.  Integer distances tie EXACTLY; the cut
   needs no rounded key, ties break on id.
3. **Exact re-rank**: candidates equi-join back to the float column
   (same pruned scan path), exact squared-L2, final top-``k``.

The float column is stored alongside the bits — parquet is columnar,
so the coarse scan never reads it (plan-locked in tests/test_ivfbin.py);
it serves phase 3 and full-fidelity rebuilds.

The vector dimension is persisted as a ``_DIM`` marker at build time
and read back at search time, so query packing can never silently use
a different word layout than the stored corpus.

The reference persists full-fidelity vectors only
(src/index/vector_shard.cc:101-106); this layout is the 1-bit
generalization its flat files cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.distance import l2_norm, l2_normalize, squared_l2
from ..operators.clustering import nearest_centroid_expr
from ..operators.knn import merge_topk
from ..operators.quantize import binarize_expr, hamming_packed
from .fsutil import read_marker, write_marker


def write_ivf_binary_index(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    dim: int,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    replicas: int = 1,
) -> None:
    """Persist ``vectors`` partitioned by nearest-centroid cell with the
    packed sign bits (``qbits``: ``ceil(dim/64)`` longs) alongside —
    ONE map-side pass (cell argmin and the bit-pack fold are both
    codegen expressions), one partitioned write, no shuffle.

    ``replicas > 1`` stores each row in its ``replicas`` nearest cells
    (the index-side recall lever, see write_ivf_index); searches must
    then pass ``replicated=True``.  Each copy carries the same bits —
    sign packing is independent of the cell, so replication never
    re-encodes."""
    if replicas < 1:
        raise ValueError("replicas must be >= 1")
    if replicas > len(centroids):
        raise ValueError("replicas cannot exceed the number of cells")
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if replicas == 1:
        assigned = vectors.withColumn(
            "cell_id", nearest_centroid_expr(F.col(vector_col), centroids)
        )
    else:
        from .ivf_index import _probe_cells_expr

        assigned = vectors.withColumn(
            "cell_id",
            F.explode(_probe_cells_expr(vector_col, centroids, replicas)),
        )
    assigned = assigned.withColumn("qbits", binarize_expr(vector_col, dim))
    assigned.write.mode(mode).partitionBy("cell_id").parquet(path)
    write_marker(vectors.sparkSession, f"{path}/_DIM", f"{dim}\n")


def _stored_dim(spark: SparkSession, path: str) -> int:
    raw = read_marker(spark, f"{path}/_DIM")
    if raw is None:
        raise ValueError(
            f"{path} has no _DIM marker; build it with write_ivf_binary_index"
        )
    return int(raw.strip())


def search_ivf_binary_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    *,
    n_probe: int = 4,
    rerank: int = 16,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    replicated: bool = False,
    where=None,
) -> DataFrame:
    """Three-stage probe over the persisted IVF+binary index (module
    docstring).  Returned distances are EXACT squared-L2 except in
    coarse-only mode ``rerank=0``, where ``distance`` is the INTEGER
    Hamming count cast to double (a shortlist score, not a metric
    estimate — unlike SQ8/PQ coarse mode there is no reconstruction).

    Sizing ``rerank`` (measured at the bench geometry, d=64, k=5 —
    BENCH_DETAIL ``recall_vs_nprobe``): Hamming keeps direction only,
    so recall trails the magnitude-aware rungs at equal depth — the
    global tier measures 0.45/0.57/0.70/0.86/0.96 at rerank
    4/8/16/32/64, crossing ≥0.9 only at rerank≈64; under cell routing
    this index measures 0.92/0.96 at (n_probe=4/8, rerank=64,
    replicas=2) — AT the IVF probe ceiling, vs 0.71 at rerank=16.  The
    binary rung is therefore a SHORTLIST tier by design: run it with
    ``rerank`` ≥ 64 at this geometry (the coarse scan is ~64× smaller,
    so a deep integer cut stays cheap), or prefer the SQ8 rung
    (rerank=3 at the same ceiling) when coarse IO at d+8 bytes/row is
    affordable.  Higher intrinsic dimension narrows the gap (sign bits
    per vector grow with d); re-measure per corpus via the bench recall
    section.

    ``replicated=True`` (required for ``replicas > 1`` indexes): coarse
    candidates and re-rank rows collapse to one per (query, id).

    ``where`` (Column or SQL string): metadata pre-filter on the coarse
    scan — the k results are the k nearest MATCHING vectors; simple
    predicates reach the pruned parquet scan as PushedFilters stacked
    on the cell PartitionFilters (same contract as
    ``search_ivf_index(where=)``)."""
    from .ivf_index import _probe_cells_expr

    dim = _stored_dim(spark, path)
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vector_col).alias("_qv"),
        binarize_expr(query_vector_col, dim).alias("_qb"),
        F.explode(
            _probe_cells_expr(query_vector_col, centroids, n_probe)
        ).alias("_probe"),
    )
    # driver-side by necessity (the probe list must be a literal to
    # reach PartitionFilters) and bounded by construction: DISTINCT cell
    # ids — at most len(centroids) rows regardless of query-batch size
    cells = sorted({r["_probe"] for r in probes.select("_probe").distinct().collect()})
    idx = spark.read.parquet(path).filter(F.col("cell_id").isin(cells))
    if where is not None:
        idx = idx.filter(F.expr(where) if isinstance(where, str) else where)
    coarse = idx.select(id_col, "qbits", "cell_id").join(
        F.broadcast(probes.select("query_id", "_qb", "_probe")),
        idx["cell_id"] == F.col("_probe"),
    ).select(
        "query_id",
        F.col(id_col).alias("id"),
        hamming_packed(F.col("qbits"), F.col("_qb")).alias("_hd"),
    )
    if replicated:
        # a row stored in two probed cells scores identically in both
        coarse = coarse.groupBy("query_id", "id").agg(F.min("_hd").alias("_hd"))
    if rerank == 0:
        return merge_topk(
            coarse.select(
                "query_id", "id", F.col("_hd").cast("double").alias("distance")
            ),
            k,
        )
    # integer Hamming ties are exact — no rounded key needed, id breaks
    w = Window.partitionBy("query_id").orderBy(F.col("_hd").asc(), F.col("id").asc())
    cands = (
        coarse.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= k * rerank)
        .select("query_id", "id")
    )
    full = (
        spark.read.parquet(path)
        .filter(F.col("cell_id").isin(cells))
        .select(F.col(id_col).alias("id"), F.col(vector_col).alias("_fv"))
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vector_col).alias("_qv")
    )
    exact = (
        cands.join(full, on="id")
        .join(F.broadcast(qv), on="query_id")
        .select(
            "query_id", "id", squared_l2(F.col("_fv"), F.col("_qv")).alias("distance")
        )
    )
    if replicated:
        exact = exact.dropDuplicates(["query_id", "id"])
    return merge_topk(exact, k)


# --- cosine-metric serving ---------------------------------------------------
# The same normalized-space identity the other cosine tiers use: for
# unit vectors ||a − b||² = 2 − 2·cos(a, b), so normalizing BEFORE cell
# assignment makes L2 routing and the exact re-rank equal the cosine
# ranking, with the exact similarity recovered as cos = 1 − d²/2.  The
# sign bits themselves are normalization-INVARIANT (positive scaling
# never flips a sign), so the Hamming coarse rank is identical either
# way — the binary rung is natively an angular code, which is exactly
# why its L2 recall trails the magnitude-aware rungs.


def write_cosine_ivf_binary_index(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    dim: int,
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    replicas: int = 1,
) -> None:
    """Cell-partitioned COSINE IVF+binary index: vectors are
    L2-normalized, then assigned/packed/stored by
    :func:`write_ivf_binary_index` unchanged.  Zero-norm vectors are
    EXCLUDED (no direction → no cosine rank; the contract shared by
    every cosine tier)."""
    norm = vectors.filter(l2_norm(F.col(vector_col)) > 0.0).withColumn(
        vector_col, l2_normalize(vector_col)
    )
    write_ivf_binary_index(
        norm, path, centroids, dim,
        vector_col=vector_col, id_col=id_col, mode=mode, replicas=replicas,
    )
    write_marker(vectors.sparkSession, f"{path}/_METRIC", "cosine\n")


def search_cosine_ivf_binary_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    *,
    n_probe: int = 4,
    rerank: int = 16,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    replicated: bool = False,
    where=None,
) -> DataFrame:
    """Top-k by COSINE similarity from a ``write_cosine_ivf_binary_index``
    index: normalize the query, run the normalized-space probe
    (identical ranking), convert ``cos = 1 − d²/2``.  Returns
    ``(query_id, id, cosine, rank)`` — rank by (cosine desc, id), the
    ``cosine_topk`` convention.  Similarities are EXACT (the re-rank
    is); ``rerank=0`` is REJECTED here — a raw Hamming count has no
    cosine form, so coarse-only serving is an L2-surface-only mode.
    Zero-norm queries are excluded like zero-norm corpus rows at build;
    the ``_METRIC`` marker must read ``cosine`` — pointing this at an
    L2 index raises instead of returning unbounded "cosine" values."""
    if rerank < 1:
        raise ValueError(
            "cosine binary serving requires rerank >= 1: the coarse "
            "Hamming count has no cosine form"
        )
    raw = read_marker(spark, f"{path}/_METRIC")
    metric = raw.strip() if raw is not None else None
    if metric != "cosine":
        raise ValueError(
            f"{path} is not a cosine index (metric marker: {metric!r}); "
            "build it with write_cosine_ivf_binary_index"
        )
    nq = queries.filter(l2_norm(F.col(query_vector_col)) > 0.0).withColumn(
        query_vector_col, l2_normalize(query_vector_col)
    )
    out = search_ivf_binary_index(
        spark, path, nq, k, centroids,
        n_probe=n_probe, rerank=rerank, id_col=id_col, vector_col=vector_col,
        query_id_col=query_id_col, query_vector_col=query_vector_col,
        replicated=replicated, where=where,
    )
    return out.select(
        "query_id",
        "id",
        (F.lit(1.0) - F.col("distance") / 2.0).alias("cosine"),
        "rank",
    )
