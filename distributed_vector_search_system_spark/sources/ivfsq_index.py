"""Persisted IVF+SQ8 index: partition-pruned cells × int8 scalar codes.

The middle rung of the compressed serving ladder.  The engine already
persists two cell-partitioned layouts — plain IVF floats
(sources/ivf_index.py: full-fidelity in-cell scan) and IVF+PQ
(sources/ivfpq_index.py: 8-byte codes, highest compression, codebook
training required, coarse fidelity low enough that ``rerank`` must be
deep) — and the FAISS-equivalent point between them is
``IndexIVFScalarQuantizer``: each vector stored as ``d`` int8 codes +
one per-vector scale (operators/quantize.py's max-abs symmetric affine,
the same encoding as the GLOBAL int8 tier).  Per-row coarse bytes are
``d + 8`` instead of the float column's ``8·d`` — ~8× less in-cell scan
IO — while the coarse error stays ≤ ``scale/2`` per component, so a
SHALLOW re-rank recovers exactness (the int8 tier's measured contract,
vs PQ needing rerank≈50 to reach 0.92 recall with the default books).
No training, no codebooks, codes survive re-clustering unchanged
(quantization is layout-independent, unlike PQ's ``residual=True``
coupling).

When to pick which rung (the ladder, cheapest coarse IO first):

- **IVF+PQ** (m bytes/row): maximum compression; pay codebook training
  + deep re-rank.  Right when the corpus dwarfs everything and ADC-only
  latency serving matters.
- **IVF+SQ8** (d+8 bytes/row, THIS module): no training, near-exact
  coarse ordering, shallow re-rank.  Right default for 100 TB serving
  when d is moderate.
- **IVF float** (8d bytes/row): exact in-cell scan, no re-rank at all.
  Right when cells are small or recall tolerance is zero.

Flow (mirrors ivfpq_index; all stages deterministic, so the whole
pipeline replays in a DuckDB oracle — registry/vector.py
``ann_sq8_topk``):

1. **Route**: each query's ``n_probe`` nearest cells; the union is a
   ``cell_id IN (…)`` partition filter — unprobed directories never
   open.
2. **SQ8 coarse** (pruned cells, code+scale columns only): squared-L2
   against the dequantized reconstruction ``code·scale``, per-query
   partial top-``k·rerank`` across the single exchange.
3. **Exact re-rank**: candidates equi-join back to the float column
   (same pruned scan path), exact squared-L2, final top-``k``.

The float column is stored alongside the codes — parquet is columnar,
so the coarse scan never reads it; it serves phase 3 and full-fidelity
rebuilds (the same trade write_ivfpq_index documents).

The reference persists full-fidelity vectors only
(src/index/vector_shard.cc:101-106); this layout is the quantized
generalization its flat files cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.distance import l2_norm, l2_normalize, rank_key, squared_l2
from ..operators.clustering import nearest_centroid_expr
from ..operators.knn import merge_topk
from ..operators.quantize import dequantize_expr, quantize_vectors
from .fsutil import read_marker, write_marker


def write_ivf_sq8_index(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    replicas: int = 1,
) -> None:
    """Persist ``vectors`` partitioned by nearest-centroid cell with
    int8 codes + per-vector scale alongside — ONE map-side pass (cell
    argmin and the affine encode are both codegen expressions), one
    partitioned write, no shuffle.

    ``replicas > 1`` stores each row in its ``replicas`` nearest cells
    (the index-side recall lever, see write_ivf_index); searches must
    then pass ``replicated=True``.  Each copy carries the same codes —
    quantization is independent of the cell, so replication never
    re-encodes (unlike residual IVFPQ)."""
    if replicas < 1:
        raise ValueError("replicas must be >= 1")
    if replicas > len(centroids):
        raise ValueError("replicas cannot exceed the number of cells")
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
    assigned = quantize_vectors(assigned, vector_col=vector_col)
    assigned.write.mode(mode).partitionBy("cell_id").parquet(path)


def search_ivf_sq8_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    *,
    n_probe: int = 4,
    rerank: int = 3,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    replicated: bool = False,
    where=None,
) -> DataFrame:
    """Three-stage probe over the persisted IVF+SQ8 index (module
    docstring).  Returned distances are EXACT except in coarse-only
    mode ``rerank=0``, where the returned ``distance`` is the
    approximate reconstruction distance (the latency-serving contract
    of ``search_ivfpq_index(rerank=0)``).

    Sizing ``rerank``: the int8 coarse ordering is near-exact (per-
    component error ≤ scale/2), so the default shallow ``rerank=3``
    matches the global int8 tier (``quantized_knn``) — contrast PQ's
    rerank≈50.

    ``replicated=True`` (required for ``replicas > 1`` indexes): coarse
    candidates and re-rank rows collapse to one per (query, id).

    ``where`` (Column or SQL string): metadata pre-filter on the coarse
    scan — the k results are the k nearest MATCHING vectors; simple
    predicates reach the pruned parquet scan as PushedFilters stacked
    on the cell PartitionFilters (same contract as
    ``search_ivf_index(where=)``)."""
    from .ivf_index import _probe_cells_expr

    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vector_col).alias("_qv"),
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
    coarse = idx.select(id_col, "qcodes", "qscale", "cell_id").join(
        F.broadcast(probes.select("query_id", "_qv", "_probe")),
        idx["cell_id"] == F.col("_probe"),
    ).select(
        "query_id",
        F.col(id_col).alias("id"),
        squared_l2(
            dequantize_expr(F.col("qcodes"), F.col("qscale")), F.col("_qv")
        ).alias("_cd"),
    )
    if replicated:
        # a row stored in two probed cells scores identically in both
        coarse = coarse.groupBy("query_id", "id").agg(F.min("_cd").alias("_cd"))
    if rerank == 0:
        return merge_topk(
            coarse.select("query_id", "id", F.col("_cd").alias("distance")), k
        )
    # candidate cut on the repo-wide rounded distance key (exact
    # boundary ties — duplicate vectors quantize identically)
    w = Window.partitionBy("query_id").orderBy(rank_key("_cd").asc(), F.col("id").asc())
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
# The same normalized-space identity the other two cosine tiers use:
# for unit vectors ||a − b||² = 2 − 2·cos(a, b), so normalizing BEFORE
# cell assignment and int8 encoding makes L2 routing, the SQ8 coarse
# ranking, and the exact re-rank all equal the cosine ranking, with the
# exact similarity recovered as cos = 1 − d²/2.  Centroids must live in
# normalized space; the persisted ``_METRIC`` marker rejects mixing.


def write_cosine_ivf_sq8_index(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    replicas: int = 1,
) -> None:
    """Cell-partitioned COSINE IVF+SQ8 index: vectors are L2-normalized,
    then assigned/encoded/stored by :func:`write_ivf_sq8_index`
    unchanged.  Zero-norm vectors are EXCLUDED (no direction → no
    cosine rank; the contract shared by every cosine tier)."""
    norm = vectors.filter(l2_norm(F.col(vector_col)) > 0.0).withColumn(
        vector_col, l2_normalize(vector_col)
    )
    write_ivf_sq8_index(
        norm, path, centroids,
        vector_col=vector_col, id_col=id_col, mode=mode, replicas=replicas,
    )
    write_marker(vectors.sparkSession, f"{path}/_METRIC", "cosine\n")


def search_cosine_ivf_sq8_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    *,
    n_probe: int = 4,
    rerank: int = 3,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    replicated: bool = False,
    where=None,
) -> DataFrame:
    """Top-k by COSINE similarity from a ``write_cosine_ivf_sq8_index``
    index: normalize the query, run the normalized-space L2 probe
    (identical ranking), convert ``cos = 1 − d²/2``.  Returns
    ``(query_id, id, cosine, rank)`` — rank by (cosine desc, id), the
    ``cosine_topk`` convention.  With ``rerank > 0`` similarities are
    EXACT; ``rerank=0`` returns the approximate reconstruction pushed
    through the same conversion.  Zero-norm queries are excluded like
    zero-norm corpus rows at build; the ``_METRIC`` marker must read
    ``cosine`` — pointing this at an L2 index raises instead of
    returning unbounded "cosine" values."""
    raw = read_marker(spark, f"{path}/_METRIC")
    metric = raw.strip() if raw is not None else None
    if metric != "cosine":
        raise ValueError(
            f"{path} is not a cosine index (metric marker: {metric!r}); "
            "build it with write_cosine_ivf_sq8_index"
        )
    nq = queries.filter(l2_norm(F.col(query_vector_col)) > 0.0).withColumn(
        query_vector_col, l2_normalize(query_vector_col)
    )
    out = search_ivf_sq8_index(
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
