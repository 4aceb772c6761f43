"""ANN quality gates: the approximate paths must hit recall targets
against the exact brute-force baseline (which itself is oracle-checked)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.tables import load_table

from distributed_vector_search_system_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    with_lsh_bucket,
)


def _qset(emb, mod):
    return emb.filter(F.col("vec_id") % mod == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _topk_ids(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["id"])
    return out


def _recall(approx, exact):
    hits = sum(len(approx.get(q, set()) & ids) for q, ids in exact.items())
    total = sum(len(ids) for ids in exact.items() and exact.values())
    return hits / total


def test_cosine_topk_matches_numpy(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = _qset(emb, 250)
    got = cosine_topk(emb, q, 5).collect()
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    for qr in q.collect():
        qv = np.array(qr["qvec"], dtype=np.float64)
        cos = (mat @ qv) / (norms * np.linalg.norm(qv))
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:5]
        expect = [int(ids[i]) for i in order]
        mine = [r["id"] for r in sorted(got, key=lambda r: r["rank"])
                if r["query_id"] == qr["query_id"]]
        assert mine == expect


def test_lsh_recall(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = _qset(emb, 100)
    exact = _topk_ids(cosine_topk(emb, q, 5))
    approx = _topk_ids(ann_lsh_topk(emb, q, 5, dim=64))
    assert _recall(approx, exact) >= 0.6


def test_ivf_recall(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = _qset(emb, 100)
    exact = _topk_ids(
        # exact squared-L2 baseline
        __import__(
            "distributed_vector_search_system_spark.operators.knn", fromlist=["knn"]
        ).knn(emb, q, 5)
    )
    approx = _topk_ids(ann_ivf_topk(emb, q, 5, num_cells=16, n_probe=8))
    assert _recall(approx, exact) >= 0.6


def test_lsh_bucket_is_deterministic(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").limit(50)
    a = with_lsh_bucket(emb, dim=64, seed=7).select("vec_id", "bucket").collect()
    b = with_lsh_bucket(emb, dim=64, seed=7).select("vec_id", "bucket").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = with_lsh_bucket(emb, dim=64, seed=8).select("vec_id", "bucket").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))  # seed matters


def test_ivf_with_trained_centroids_recall(spark, sf_smoke):
    """IVF over kmeans-trained cells must reach high recall vs the exact
    baseline — the trained path is the production IVF shape."""
    from distributed_vector_search_system_spark.operators.clustering import kmeans_fit
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.operators.similarity import ann_ivf_topk
    from distributed_vector_search_system_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cents, _ = kmeans_fit(emb, 8, max_iterations=5)
    approx = ann_ivf_topk(emb, q, 5, n_probe=4, centroids=cents)
    exact = knn(emb, q, 5)
    a = {(r["query_id"], r["id"]) for r in approx.collect()}
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.6  # recall@5 with 4/8 cells probed


def test_multiprobe_masks_cover_hamming_ball():
    """ADVICE r03: multiprobe_bits > 1 used to silently behave as 1 —
    masks must now cover every perturbation with popcount ≤ bits."""
    import pytest

    from distributed_vector_search_system_spark.operators.similarity import (
        multiprobe_masks,
    )

    assert multiprobe_masks(6, 0) == []
    m1 = multiprobe_masks(6, 1)
    assert sorted(m1) == [1 << i for i in range(6)]
    m2 = multiprobe_masks(6, 2)
    assert len(m2) == 6 + 15  # C(6,1) + C(6,2)
    assert all(bin(m).count("1") <= 2 and m > 0 for m in m2)
    assert len(set(m2)) == len(m2)
    with pytest.raises(ValueError):
        multiprobe_masks(6, 7)
    with pytest.raises(ValueError):
        multiprobe_masks(6, -1)


def test_lsh_multiprobe2_candidates_superset(spark, sf_smoke):
    """multiprobe_bits=2 probes a strict superset of buckets, so recall
    (vs exact) must be ≥ the 1-bit run — and the 2-bit hamming ball is
    actually reached (pre-fix both runs were identical)."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = _qset(emb, 100)
    exact = _topk_ids(cosine_topk(emb, q, 5))
    a1 = _topk_ids(ann_lsh_topk(emb, q, 5, dim=64, multiprobe_bits=1))
    a2 = _topk_ids(ann_lsh_topk(emb, q, 5, dim=64, multiprobe_bits=2))
    assert _recall(a2, exact) >= _recall(a1, exact)


# -- knn_join (round 5: large-to-large ANN join, neither side broadcast) ---

def test_knn_join_self_contains_identity(spark, sf_oracle):
    """left ⊂ right ⇒ every left row's rank-1 neighbor is itself at
    distance 0 (its own cell is always its nearest probe)."""
    from distributed_vector_search_system_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_oracle, "embeddings")
    left = emb.filter(F.col("vec_id") % 50 == 3)
    out = knn_join(left, emb, 3, n_probe=2).collect()
    rank1 = {r["left_id"]: (r["right_id"], r["distance"]) for r in out if r["rank"] == 1}
    n_left = left.count()
    assert len(rank1) == n_left
    assert all(rid == lid and d == 0.0 for lid, (rid, d) in rank1.items())


def test_knn_join_no_broadcast_no_cartesian(spark, sf_oracle):
    """The scale contract: with broadcast disabled the plan still builds —
    one shuffle equi-join on the cell id, no CartesianProduct and no
    BroadcastNestedLoopJoin anywhere (an all-pairs fallback would show
    up as exactly those)."""
    from distributed_vector_search_system_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_oracle, "embeddings")
    left = emb.filter(F.col("vec_id") % 10 == 1)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = knn_join(left, emb, 3, n_probe=2)
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_knn_join_trained_centroids_full_probe_is_exact(spark, sf_oracle):
    """n_probe = num_cells ⇒ every pair is a candidate ⇒ exact kNN join."""
    from distributed_vector_search_system_spark.operators.clustering import kmeans_fit
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_oracle, "embeddings")
    left = emb.filter(F.col("vec_id") % 100 == 9)
    cents, _ = kmeans_fit(emb, 6, max_iterations=2)
    got = {
        (r["left_id"], r["right_id"], r["rank"])
        for r in knn_join(
            left, emb, 4, centroids=cents, n_probe=len(cents)
        ).collect()
    }
    q = left.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    want = {
        (r["query_id"], r["id"], r["rank"]) for r in knn(emb, q, 4).collect()
    }
    assert got == want
