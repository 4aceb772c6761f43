"""Persisted IVF+PQ index: partition-pruned cells × 32×-compressed codes.

The serving plan for vector search at 100 TB composes the two physical
wins this engine already has separately:

- **IVF** (sources/ivf_index.py): vectors partitioned by nearest-cell
  directory; a probe's ``cell_id IN (…)`` becomes PartitionFilters, so
  IO scales with ``n_probe / num_cells`` — the analog of FAISS scanning
  only the probed inverted lists (reference src/index/vector_shard.cc:
  72-94 generalized).
- **PQ** (operators/pq.py): each vector stored as ``m`` one-byte
  codebook indices; the coarse scan does ADC lookups over 8 bytes per
  row instead of arithmetic over 256.

Combined: a probe reads ``(n_probe/num_cells) × (1/32)`` of the corpus
bytes for phase 1 — for the default 16 cells / 4 probes that is <1% of
a flat float scan — then re-ranks the ``k·rerank`` survivors exactly
against the float column (itself read only for those rows via an
id equi-join).  This is FAISS ``IndexIVFPQ`` re-expressed as parquet
layout + Catalyst pruning + codegen expressions; both the cell
assignment (hash-thinned centroid sample) and the codebooks
(hash-thinned row sample) are deterministic, so the ENTIRE pipeline —
centroid choice, codebook choice, cell routing, code assignment, ADC
sums, re-rank — replays in a DuckDB oracle (registry/vector.py
``ann_ivfpq_topk``).

Residual note: classic IVFPQ quantizes the residual ``x - centroid``;
the DEFAULT here quantizes ``x`` directly and re-ranks exactly, so the
approximation only affects candidate choice, never returned distances,
and the codebooks stay decoupled from the cell layout (retrain-free on
re-cluster) — the right trade when an exact re-rank column exists.
``residual=True`` (write + search) opts into the classic refinement
for ADC-only serving (``rerank=0``), where the coarse ranking is the
result and residual codes carry materially less quantization error;
codebooks then come from ``operators.pq.pq_residual_codebooks`` and
are valid only for the cell layout they were encoded against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.distance import squared_l2
from ..operators.clustering import nearest_centroid_expr
from ..operators.knn import merge_topk
from ..operators.pq import adc_distance_expr, pq_encode, _lut_sql


def write_ivfpq_index(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    replicas: int = 1,
    residual: bool = False,
) -> None:
    """Persist ``vectors`` partitioned by nearest-centroid cell with PQ
    codes alongside — ONE map-side pass (cell argmin + per-subspace
    argmin are both codegen expressions over literals), one
    partitioned write.  The float column is stored too: it serves the
    exact re-rank reads and full-fidelity rebuilds.

    ``replicas > 1`` stores each row in its ``replicas`` nearest cells
    (see sources/ivf_index.write_ivf_index — the index-side recall
    lever); searches must then pass ``replicated=True``.

    ``residual=True`` — classic FAISS-IVFPQ refinement: codes quantize
    ``x − centroid[cell]`` instead of ``x`` (codebooks should come from
    :func:`operators.pq.pq_residual_codebooks`).  Residuals concentrate
    around the origin, so the same code budget carries far less
    quantization error — the lever that matters for ADC-ONLY serving
    (``rerank=0``), where the coarse ranking IS the result.  The cost
    is operational coupling: codes are valid only for the cell layout
    they were encoded against (re-cluster ⇒ re-encode), which is why
    direct encoding stays the default (module docstring).  Under
    ``replicas > 1`` each stored copy encodes against ITS OWN cell's
    centroid.  Searches must pass the same ``residual=True``."""
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
    if residual:
        from ..operators.pq import residual_expr

        assigned = (
            assigned.withColumn(
                "_res", residual_expr(vector_col, "cell_id", centroids)
            )
            .transform(lambda df: pq_encode(df, codebooks, vector_col="_res"))
            .drop("_res")
        )
    else:
        assigned = pq_encode(assigned, codebooks, vector_col=vector_col)
    assigned.write.mode(mode).partitionBy("cell_id").parquet(path)


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    *,
    n_probe: int = 4,
    rerank: int = 10,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    replicated: bool = False,
    residual: bool = False,
    where=None,
) -> DataFrame:
    """Three-stage probe over the persisted IVF+PQ index.

    1. **Route** (driver-tiny): each query's ``n_probe`` nearest cells;
       the union becomes a ``cell_id IN (…)`` partition filter —
       unprobed directories never open.
    2. **ADC coarse** (pruned cells, code column only): per-query
       lookup tables built once on the broadcast query side; candidate
       cost is ``m`` lookups + adds per (query, row); per-query partial
       top-``k·rerank`` crosses the single exchange.
    3. **Exact re-rank**: candidates equi-join back to the float column
       (same pruned scan path), exact squared-L2, final top-``k``.

    Returned distances are exact (see module docstring) — EXCEPT in
    ADC-only mode, ``rerank=0``: phase 3 is skipped and the returned
    ``distance`` is the APPROXIMATE ADC reconstruction distance.  That
    mode exists for latency-critical serving where the exact re-rank
    join is the tail; callers accept quantization error in the
    distances (ranking quality tracked in bench's recall section).

    ``replicated=True`` (required for ``replicas > 1`` indexes): coarse
    candidates and re-rank rows collapse to one per (query, id).

    Sizing ``rerank``: the exact re-rank can only recover neighbors the
    ADC ranking kept, so rerank depth must scale with codebook
    coarseness, not with ``n_probe`` — measured on the d=64 fixture
    with m=8/ksub=16 books, recall@5 saturates at ~0.77 for rerank=20
    at BOTH n_probe 4 and 8 (the ADC ordering is the binding
    constraint), while rerank=50 recovers to 0.92/0.96 against the IVF
    ceiling of 0.93/1.0 (bench recall section tracks both depths).

    ``where`` (Column or SQL string): metadata pre-filter — applied to
    the coarse scan, so the k results are the k nearest MATCHING
    vectors (same contract as ``search_ivf_index(where=)``); simple
    predicates reach the pruned parquet scan as PushedFilters stacked
    on the cell PartitionFilters.

    ``residual=True`` (required for indexes written with
    ``residual=True``): the per-query ADC lookup table is built from
    the QUERY residual against each probed cell's centroid — one LUT
    per (query, probed cell) instead of one per query (the standard
    IVFPQ asymmetry; still broadcast-side, still tiny)."""
    from .ivf_index import _probe_cells_expr

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vector_col).alias("_qv"),
        F.explode(
            _probe_cells_expr(query_vector_col, centroids, n_probe)
        ).alias("_probe"),
    )
    if residual:
        from ..operators.pq import residual_expr

        probes = probes.withColumn(
            "_qres", residual_expr("_qv", "_probe", centroids)
        ).withColumn("_lut", F.expr(_lut_sql("_qres", codebooks, dsub)))
    else:
        probes = probes.withColumn(
            "_lut", F.expr(_lut_sql("_qv", codebooks, dsub))
        )
    # driver-side by necessity (the probe list must be a literal to
    # reach PartitionFilters) and bounded by construction: DISTINCT cell
    # ids — at most len(centroids) rows regardless of query-batch size
    cells = sorted({r["_probe"] for r in probes.select("_probe").distinct().collect()})
    idx = spark.read.parquet(path).filter(F.col("cell_id").isin(cells))
    if where is not None:
        idx = idx.filter(F.expr(where) if isinstance(where, str) else where)
    coarse = idx.select(id_col, "pq_codes", "cell_id").join(
        F.broadcast(probes.select("query_id", "_lut", "_probe")),
        idx["cell_id"] == F.col("_probe"),
    ).select(
        "query_id",
        F.col(id_col).alias("id"),
        adc_distance_expr("pq_codes", "_lut").alias("_adc"),
    )
    if replicated:
        # a row stored in two probed cells scores identically in both;
        # collapse before ranking (candidate-set-sized aggregation)
        coarse = coarse.groupBy("query_id", "id").agg(F.min("_adc").alias("_adc"))
    if rerank == 0:
        # ADC-only: the coarse ranking IS the result; distances are the
        # approximate reconstruction distances (see docstring)
        return merge_topk(
            coarse.select("query_id", "id", F.col("_adc").alias("distance")), k
        )
    from pyspark.sql import Window

    from ..functions.distance import rank_key

    # candidate cut on rank_key(_adc) — the repo-wide distance-space
    # order (PQ codes duplicate heavily → exact boundary ties), matching
    # the oracle's round_even key (ADVICE r07)
    w = Window.partitionBy("query_id").orderBy(rank_key("_adc").asc(), F.col("id").asc())
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


# --- cosine-metric IVF+PQ serving (round 7) ---------------------------------
# Production embedding search is COSINE and the 100 TB serving plan is
# IVF+PQ; round 6 joined cosine to plain IVF (sources/ivf_index.py:166)
# but the compressed tier still served only L2 (VERDICT r06 item 3).
# The same normalized-space identity composes with PQ directly: for
# unit vectors ||a − b||² = 2 − 2·cos(a, b) is monotone decreasing in
# cosine, so normalizing BEFORE cell assignment and PQ encoding makes
# L2 cell routing, ADC coarse ranking, and the exact re-rank all equal
# the cosine ranking, with the exact similarity recovered as
# cos = 1 − d²/2.  Cell centroids AND codebooks must live in normalized
# space (sample/train them over an ``l2_normalize`` projection); the
# persisted ``_METRIC`` marker rejects mixing the two spaces, exactly
# like the plain cosine IVF tier.


def write_cosine_ivfpq_index(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    replicas: int = 1,
    residual: bool = False,
) -> None:
    """Cell-partitioned COSINE IVF+PQ index: vectors are L2-normalized,
    then assigned/encoded/stored by :func:`write_ivfpq_index` unchanged
    — partition pruning, replication, and the residual refinement all
    inherit.  ``centroids`` and ``codebooks`` must be built over the
    NORMALIZED vectors.  Zero-norm vectors are EXCLUDED (no direction
    → no cosine rank; same contract as ``write_cosine_ivf_index``)."""
    from ..functions.distance import l2_norm, l2_normalize
    from .fsutil import write_marker

    norm = vectors.filter(l2_norm(F.col(vector_col)) > 0.0).withColumn(
        vector_col, l2_normalize(vector_col)
    )
    write_ivfpq_index(
        norm, path, centroids, codebooks,
        vector_col=vector_col, id_col=id_col, mode=mode,
        replicas=replicas, residual=residual,
    )
    write_marker(vectors.sparkSession, f"{path}/_METRIC", "cosine\n")


def search_cosine_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    *,
    n_probe: int = 4,
    rerank: int = 10,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    replicated: bool = False,
    residual: bool = False,
    where=None,
) -> DataFrame:
    """Top-k by COSINE similarity from a ``write_cosine_ivfpq_index``
    index: normalize the query, run the normalized-space L2 IVF+PQ
    probe (identical ranking), convert ``cos = 1 − d²/2``.  Returns
    ``(query_id, id, cosine, rank)`` — rank by (cosine desc, id), the
    ``cosine_topk`` convention.

    With ``rerank > 0`` the returned similarities are EXACT (phase 3
    re-ranks on the stored normalized floats); ``rerank=0`` returns the
    APPROXIMATE ADC reconstruction pushed through the same conversion —
    the latency-serving contract of ``search_ivfpq_index(rerank=0)``.

    At full probe coverage and ``k·rerank ≥`` corpus size the result
    equals ``cosine_topk`` over the non-zero-norm corpus exactly
    (tested).  Zero-norm QUERIES are excluded like zero-norm corpus
    rows at build; the ``_METRIC`` marker must read ``cosine`` —
    pointing this at an L2 index raises instead of returning unbounded
    "cosine" values."""
    from ..functions.distance import l2_norm, l2_normalize
    from .fsutil import read_marker

    raw = read_marker(spark, f"{path}/_METRIC")
    metric = raw.strip() if raw is not None else None
    if metric != "cosine":
        raise ValueError(
            f"{path} is not a cosine index (metric marker: {metric!r}); "
            "build it with write_cosine_ivfpq_index"
        )
    nq = queries.filter(l2_norm(F.col(query_vector_col)) > 0.0).withColumn(
        query_vector_col, l2_normalize(query_vector_col)
    )
    out = search_ivfpq_index(
        spark, path, nq, k, centroids, codebooks,
        n_probe=n_probe, rerank=rerank, id_col=id_col, vector_col=vector_col,
        query_id_col=query_id_col, query_vector_col=query_vector_col,
        replicated=replicated, residual=residual, where=where,
    )
    return out.select(
        "query_id",
        "id",
        (F.lit(1.0) - F.col("distance") / 2.0).alias("cosine"),
        "rank",
    )
