"""Distributed Lloyd k-means — the IVF training step.

The reference never trains anything (FAISS *flat* index, no IVF), but an
IVF index at 100 TB needs real centroids, and ``ann_ivf_topk``'s
deterministic sample is only the zero-iteration special case.  This is
the standard Spark formulation:

- **assign** (map-only): distance to each of k centroid literals in
  codegen, argmin via ``array_sort`` over (distance, cluster) structs —
  no shuffle, no Python;
- **update** (one shuffle): ``posexplode`` the assigned vectors and
  average per (cluster, position) with map-side partial aggregation —
  the same shuffle-light pattern as the ``vector_centroids`` registry
  query, never ``collect_list`` of vectors;
- centroids themselves are k·d doubles — driver-held and broadcast as
  literals each round (k ≤ a few thousand: kilobytes).

Iterations stop on centroid movement < ``tol`` (max squared-L2 shift)
or ``max_iterations``.  Initialization is the deterministic
hash-thinned sample used by ``ann_ivf_topk`` so runs are reproducible.
Empty clusters keep their previous centroid (standard Lloyd fix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.distance import squared_l2


def _centroid_literal(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def nearest_centroid_sql(vec_sql: str, centroids: list[list[float]]) -> str:
    """SQL string for the nearest-centroid index (squared-L2,
    lowest-index tie-break) — parsed once instead of k × dim literal
    Column calls, same array_sort-over-structs semantics."""
    from ..functions.distance import squared_l2_lit_sql

    structs = ", ".join(
        f"named_struct('d', {squared_l2_lit_sql(vec_sql, c)}, 'cid', {i})"
        for i, c in enumerate(centroids)
    )
    return f"array_sort(array({structs}))[0].cid"


def nearest_centroid_expr(vector_col, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared-L2, lowest-index tie-break)
    — pure codegen expression over k centroid literals."""
    if isinstance(vector_col, str):
        return F.expr(nearest_centroid_sql(f"`{vector_col}`", centroids))
    v = vector_col
    scored = F.array(
        *[
            F.struct(
                squared_l2(v, _centroid_literal(c)).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_sort(scored)[0]["cid"]


def assign_clusters(
    vectors: DataFrame,
    centroids: list[list[float]],
    *,
    vector_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Map-only cluster assignment against driver-held centroids."""
    return vectors.withColumn(
        out_col, nearest_centroid_expr(vector_col, centroids).cast("int")
    )


def _init_centroids(
    vectors: DataFrame, k: int, id_col: str, vector_col: str
) -> list[list[float]]:
    """Deterministic hash-thinned sample (same scheme as ann_ivf_topk):
    TakeOrderedAndProject, so selection is a distributed partial top-k."""
    total = vectors.count()
    step = max(total // (k * 4), 1)
    rows = (
        vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(step)) == 0)
        .orderBy(F.col(id_col))
        .limit(k)
        .select(vector_col)
        .collect()
    )
    if len(rows) < k:
        rows = vectors.orderBy(F.col(id_col)).limit(k).select(vector_col).collect()
    return [[float(x) for x in r[0]] for r in rows]


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    *,
    max_iterations: int = 20,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> tuple[list[list[float]], int]:
    """Lloyd's algorithm; returns (centroids, iterations_run).

    Each iteration is one Spark job: assign (map-only) + per-(cluster,
    dim) average (one shuffle with map-side combine) + a k·d-value
    collect.  The data-side state never leaves the cluster; only the
    centroid matrix crosses the driver boundary.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    centroids = _init_centroids(vectors, k, id_col, vector_col)
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        assigned = assign_clusters(vectors, centroids, vector_col=vector_col)
        per_dim = (
            assigned.select("cluster_id", F.posexplode(vector_col).alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("v"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty cluster → keep
        by_cluster: dict[int, dict[int, float]] = {}
        for r in per_dim:
            by_cluster.setdefault(r["cluster_id"], {})[r["pos"]] = r["v"]
        for cid, dims in by_cluster.items():
            new_centroids[cid] = [dims[p] for p in sorted(dims)]
        shift = max(
            sum((a - b) * (a - b) for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, iterations


def wcss(
    vectors: DataFrame,
    centroids: list[list[float]],
    *,
    vector_col: str = "embedding",
) -> float:
    """Within-cluster sum of squares — the k-means objective, used to
    verify monotone improvement."""
    assigned = assign_clusters(vectors, centroids, vector_col=vector_col)
    dist_to_own = F.array(
        *[
            F.when(
                F.col("cluster_id") == i,
                squared_l2(F.col(vector_col), _centroid_literal(c)),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return (
        assigned.select(
            F.aggregate(
                F.array_compact(dist_to_own), F.lit(0.0), lambda a, x: a + x
            ).alias("d")
        )
        .agg(F.sum("d").alias("s"))
        .first()["s"]
    )
