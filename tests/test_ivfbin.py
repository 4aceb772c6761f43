"""Persisted IVF+binary index (sources/ivfbin_index.py).

Oracle parity for the ann_ivfbin_topk registry row runs in
test_oracle_parity.py; these tests lock the physical plan — partition
pruning AND bits-column-only coarse IO — and the semantic contracts
(exact distances, full-probe/deep-rerank equality with exact kNN,
coarse Hamming == sign-disagreement count, cosine wrapper equality,
replication, the metric/_DIM marker guards, engine integration)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark import registry
from distributed_vector_search_system_spark.registry.vector import (
    _IVF_NPROBE,
    _IVF_NUM_CELLS,
    _ivf_thinned_centroids,
    ivfbin_index,
)
from distributed_vector_search_system_spark.sources.ivfbin_index import (
    search_cosine_ivf_binary_index,
    search_ivf_binary_index,
    write_cosine_ivf_binary_index,
    write_ivf_binary_index,
)
from distributed_vector_search_system_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _queries(emb, pred=None):
    pred = pred if pred is not None else F.col("vec_id") % 100 == 43
    return emb.filter(pred).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _search(spark, sf_dir, k=5, rerank=16, n_probe=_IVF_NPROBE):
    emb = load_table(spark, sf_dir, "embeddings")
    return search_ivf_binary_index(
        spark,
        ivfbin_index(spark, sf_dir),
        _queries(emb),
        k,
        _ivf_thinned_centroids(spark, sf_dir),
        n_probe=n_probe,
        rerank=rerank,
    )


def test_plan_prunes_partitions_and_coarse_reads_bits_only(spark, sf_oracle):
    plan = _plan(_search(spark, sf_oracle))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell_id" in l for l in pf), plan  # unprobed dirs never open
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    coarse = [l for l in read_schemas if "qbits" in l]
    assert coarse, read_schemas
    # the packed-bits column carries phase 1; the float column enters
    # only the re-rank scan
    assert not any("embedding" in l for l in coarse), coarse
    assert any("embedding" in l and "qbits" not in l for l in read_schemas), (
        read_schemas
    )


def test_full_probe_deep_rerank_equals_exact_knn(spark, sf_oracle):
    """n_probe = num_cells and k·rerank ≥ corpus ⇒ the three-stage plan
    degrades to exact kNN — result-identical to operators.knn."""
    from distributed_vector_search_system_spark.operators.knn import knn

    emb = load_table(spark, sf_oracle, "embeddings")
    n = emb.count()
    q = _queries(emb)
    got = search_ivf_binary_index(
        spark, ivfbin_index(spark, sf_oracle), q, 5,
        _ivf_thinned_centroids(spark, sf_oracle),
        n_probe=_IVF_NUM_CELLS, rerank=(n // 5) + 1,
    )
    want = knn(emb, q, 5)
    assert sorted(
        (r["query_id"], r["id"], r["rank"], round(r["distance"], 6))
        for r in got.collect()
    ) == sorted(
        (r["query_id"], r["id"], r["rank"], round(r["distance"], 6))
        for r in want.collect()
    )


def test_distances_exact_and_candidates_within_probed_cells(spark, sf_oracle):
    from distributed_vector_search_system_spark.functions.distance import squared_l2
    from distributed_vector_search_system_spark.operators.clustering import (
        assign_clusters,
    )
    from distributed_vector_search_system_spark.sources.ivf_index import (
        _probe_cells_expr,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    cents = _ivf_thinned_centroids(spark, sf_oracle)
    got = _search(spark, sf_oracle).collect()
    assert got
    truth = {
        (r["query_id"], r["vec_id"]): r["d"]
        for r in _queries(emb)
        .crossJoin(emb.select("vec_id", "embedding"))
        .select(
            "query_id", "vec_id", squared_l2("embedding", F.col("qvec")).alias("d")
        )
        .collect()
    }
    cell_of = {
        r["vec_id"]: r["cell_id"]
        for r in assign_clusters(emb, cents, out_col="cell_id")
        .select("vec_id", "cell_id")
        .collect()
    }
    probed = {
        r["query_id"]: set(r["cells"])
        for r in emb.filter(F.col("vec_id") % 100 == 43)
        .select(
            F.col("vec_id").alias("query_id"),
            _probe_cells_expr("embedding", cents, _IVF_NPROBE).alias("cells"),
        )
        .collect()
    }
    for r in got:
        assert abs(r["distance"] - truth[(r["query_id"], r["id"])]) < 1e-9
        assert cell_of[r["id"]] in probed[r["query_id"]]


def test_coarse_hamming_equals_sign_disagreement(spark, sf_oracle):
    """rerank=0 returns the raw integer Hamming count — it must equal
    the per-dimension sign-disagreement count computed independently
    from the float vectors (the invariant the DuckDB oracle relies on:
    packing is invisible to the distance)."""
    emb = load_table(spark, sf_oracle, "embeddings")
    got = _search(spark, sf_oracle, rerank=0, n_probe=_IVF_NUM_CELLS).collect()
    assert got
    q = _queries(emb)
    sign_dis = {
        (r["query_id"], r["vec_id"]): r["sd"]
        for r in q.crossJoin(emb.select("vec_id", "embedding"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "qvec",
                    lambda a, b: (
                        (a.cast("double") > 0.0) != (b.cast("double") > 0.0)
                    ).cast("int"),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("sd"),
        )
        .collect()
    }
    for r in got:
        assert r["distance"] == float(sign_dis[(r["query_id"], r["id"])])
        assert r["distance"] == int(r["distance"])  # integer count


def test_replicated_index_equals_single_copy(spark, sf_oracle, tmp_path):
    emb = load_table(spark, sf_oracle, "embeddings")
    cents = _ivf_thinned_centroids(spark, sf_oracle)
    dim = len(emb.select("embedding").first()[0])
    q = _queries(emb)
    p1 = str(tmp_path / "b1")
    p2 = str(tmp_path / "b2")
    write_ivf_binary_index(emb, p1, cents, dim)
    write_ivf_binary_index(emb, p2, cents, dim, replicas=2)
    n = emb.count()
    # full probe coverage: duplicate copies collapse and both indexes
    # hold the same live set, so results are identical
    a = search_ivf_binary_index(
        spark, p1, q, 5, cents, n_probe=len(cents), rerank=(n // 5) + 1
    )
    b = search_ivf_binary_index(
        spark, p2, q, 5, cents, n_probe=len(cents), rerank=(n // 5) + 1,
        replicated=True,
    )
    key = lambda r: (r["query_id"], r["rank"], r["id"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))
    # partial probe: replication is the recall lever — the replicated
    # index can only see MORE true neighbors, never fewer
    from distributed_vector_search_system_spark.operators.knn import knn

    exact = {(r["query_id"], r["id"]) for r in knn(emb, q, 5).collect()}
    ra = search_ivf_binary_index(spark, p1, q, 5, cents, n_probe=2)
    rb = search_ivf_binary_index(spark, p2, q, 5, cents, n_probe=2, replicated=True)
    hits = lambda df: len({(r["query_id"], r["id"]) for r in df.collect()} & exact)  # noqa: E731
    assert hits(rb) >= hits(ra)


def test_cosine_full_probe_equals_cosine_topk(spark, sf_oracle, tmp_path):
    from distributed_vector_search_system_spark.functions.distance import (
        l2_norm,
        l2_normalize,
    )
    from distributed_vector_search_system_spark.operators.clustering import kmeans_fit
    from distributed_vector_search_system_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_oracle, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    norm = emb.filter(l2_norm("embedding") > 0.0).withColumn(
        "embedding", l2_normalize("embedding")
    )
    cents, _ = kmeans_fit(norm, 8, max_iterations=3)
    path = str(tmp_path / "cbin")
    write_cosine_ivf_binary_index(emb, path, cents, dim)
    q = _queries(emb)
    n = emb.count()
    got = search_cosine_ivf_binary_index(
        spark, path, q, 5, cents, n_probe=8, rerank=(n // 5) + 1
    ).collect()
    want = {
        (r["query_id"], r["id"], r["rank"]): r["cosine"]
        for r in cosine_topk(emb, q, 5).collect()
    }
    assert {(r["query_id"], r["id"], r["rank"]) for r in got} == set(want)
    for r in got:  # cos = 1 - d^2/2 recovers the exact similarity
        assert abs(r["cosine"] - want[(r["query_id"], r["id"], r["rank"])]) < 1e-9


def test_cosine_search_rejects_l2_index_and_coarse_only(spark, sf_oracle, tmp_path):
    emb = load_table(spark, sf_oracle, "embeddings")
    cents = _ivf_thinned_centroids(spark, sf_oracle)
    dim = len(emb.select("embedding").first()[0])
    path = str(tmp_path / "l2bin")
    write_ivf_binary_index(emb, path, cents, dim)
    with pytest.raises(ValueError, match="not a cosine index"):
        search_cosine_ivf_binary_index(spark, path, _queries(emb), 5, cents)
    # a raw Hamming count has no cosine form
    with pytest.raises(ValueError, match="rerank >= 1"):
        search_cosine_ivf_binary_index(
            spark, path, _queries(emb), 5, cents, rerank=0
        )


def test_search_requires_dim_marker(spark, sf_oracle, tmp_path):
    """An index directory without the _DIM sidecar is rejected — query
    packing must never guess the word layout."""
    emb = load_table(spark, sf_oracle, "embeddings")
    cents = _ivf_thinned_centroids(spark, sf_oracle)
    path = str(tmp_path / "nodim")
    emb.withColumn("cell_id", F.lit(0)).write.partitionBy("cell_id").parquet(path)
    with pytest.raises(ValueError, match="_DIM"):
        search_ivf_binary_index(spark, path, _queries(emb), 5, cents)


def test_engine_binary_method_full_coverage_equals_expr(spark, sf_oracle, tmp_path):
    """The engine-served rung: attach_index + method='binary' under the
    standard gates equals the exact expr scan at full coverage, and the
    cosine kind equals the cosine conversion."""
    from distributed_vector_search_system_spark.engine import VectorEngine

    emb = load_table(spark, sf_oracle, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    eng = VectorEngine(
        spark, emb.select("vec_id", "embedding", "label"), dim=dim
    )
    eng.attach_index(
        str(tmp_path / "idx"),
        num_cells=_IVF_NUM_CELLS,
        n_probe=_IVF_NUM_CELLS,
        rerank=(n // 5) + 1,
    )
    q = _queries(emb)
    got = eng.search(q, 5, method="binary")
    want = eng.search(q, 5, method="expr")
    key = lambda r: (r["query_id"], r["rank"], r["id"], round(r["distance"], 6))  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    cos = eng.search(q, 5, method="cosine_binary")
    assert set(cos.columns) == {"query_id", "id", "cosine", "rank"}
    assert cos.count() > 0


def test_engine_binary_requires_dim(spark, sf_oracle, tmp_path):
    from distributed_vector_search_system_spark.engine import VectorEngine

    emb = load_table(spark, sf_oracle, "embeddings")
    eng = VectorEngine(spark, emb.select("vec_id", "embedding", "label"))
    eng.attach_index(str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="requires the engine's dim"):
        eng.search(_queries(emb), 5, method="binary")


def test_registry_row_runs_and_ranks_contiguously(spark, sf_smoke):
    rows = registry.all_queries()["ann_ivfbin_topk"](spark, sf_smoke).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert by_q
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
