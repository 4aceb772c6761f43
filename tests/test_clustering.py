"""Distributed Lloyd k-means (IVF training): recovers planted blobs,
monotonically improves the objective, assignment matches a numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    wcss,
)


def _blobs(spark, n_per=60, d=8, seed=7):
    """Three well-separated gaussian blobs around distant centers."""
    rng = np.random.RandomState(seed)
    centers = np.array(
        [[0.0] * d, [50.0] * d, [-50.0 if i % 2 else 100.0 for i in range(d)]]
    )
    rows = []
    for b, c in enumerate(centers):
        pts = c + rng.randn(n_per, d)
        for i, p in enumerate(pts):
            rows.append((b * n_per + i, [float(x) for x in p], b))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, true_blob int"
    )
    return df, centers


def test_kmeans_recovers_blobs(spark):
    df, centers = _blobs(spark)
    fitted, iters = kmeans_fit(df, 3, max_iterations=15)
    assert iters <= 15
    # every true center must be within a small distance of some fitted one
    fitted_arr = np.array(fitted)
    for c in centers:
        assert np.min(np.linalg.norm(fitted_arr - c, axis=1)) < 2.0
    # assignments must be pure: each fitted cluster maps to one true blob
    assigned = assign_clusters(df, fitted)
    purity = (
        assigned.groupBy("cluster_id")
        .agg(
            F.count_distinct("true_blob").alias("n_blobs"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert all(r["n_blobs"] == 1 for r in purity)
    assert sum(r["n"] for r in purity) == df.count()


def test_kmeans_objective_improves(spark):
    df, _ = _blobs(spark)
    c0, _ = kmeans_fit(df, 3, max_iterations=1)
    c5, _ = kmeans_fit(df, 3, max_iterations=8)
    assert wcss(df, c5) <= wcss(df, c0) + 1e-6


def test_assignment_matches_numpy_oracle(spark):
    df, _ = _blobs(spark, n_per=20)
    fitted, _ = kmeans_fit(df, 3, max_iterations=5)
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(df, fitted).collect()
    }
    rows = df.select("vec_id", "embedding").collect()
    cents = np.array(fitted)
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        want = int(np.argmin(((cents - v) ** 2).sum(axis=1)))
        assert got[r["vec_id"]] == want


def test_kmeans_rejects_bad_k(spark):
    df, _ = _blobs(spark, n_per=5)
    with pytest.raises(ValueError):
        kmeans_fit(df, 0)


def test_kmeans_fixture_embeddings(spark, sf_smoke):
    """Smoke over the real fixture table: converges and covers all rows."""
    from distributed_vector_search_system_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    cents, iters = kmeans_fit(emb, 4, max_iterations=6)
    assert len(cents) == 4 and iters >= 1
    n = assign_clusters(emb, cents).filter(F.col("cluster_id").isNotNull()).count()
    assert n == emb.count()
