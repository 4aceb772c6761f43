"""Persisted IVF+PQ index (sources/ivfpq_index.py).

Oracle parity for the ann_ivfpq_topk registry row runs in
test_oracle_parity.py; these tests lock the physical plan — partition
pruning AND code-column-only coarse IO — and the semantic contract
(exact distances, candidates confined to probed cells)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark import registry
from distributed_vector_search_system_spark.registry.vector import (
    _IVF_NPROBE,
    _ivf_thinned_centroids,
    ivfpq_index,
    pq_books,
)
from distributed_vector_search_system_spark.sources.ivfpq_index import (
    search_ivfpq_index,
)
from distributed_vector_search_system_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _search(spark, sf_dir, k=5, rerank=10):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 23).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return search_ivfpq_index(
        spark,
        ivfpq_index(spark, sf_dir),
        q,
        k,
        _ivf_thinned_centroids(spark, sf_dir),
        pq_books(spark, sf_dir),
        n_probe=_IVF_NPROBE,
        rerank=rerank,
    )


def test_plan_prunes_partitions_and_coarse_reads_codes_only(spark, sf_oracle):
    plan = _plan(_search(spark, sf_oracle))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cell_id" in l for l in pf), plan  # unprobed dirs never open
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    coarse = [l for l in read_schemas if "pq_codes" in l]
    assert coarse, read_schemas
    # the 8-byte code column carries phase 1; the 256-byte float column
    # enters only the re-rank scan
    assert not any("embedding" in l for l in coarse), coarse
    assert any("embedding" in l and "pq_codes" not in l for l in read_schemas), (
        read_schemas
    )


def test_distances_exact_and_candidates_within_probed_cells(spark, sf_oracle):
    """Returned distances equal the true squared-L2 (re-rank is exact),
    and every returned id lives in one of the query's probed cells."""
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
    assert got  # non-empty at the fixture

    truth = {
        (r["query_id"], r["vec_id"]): r["d"]
        for r in emb.filter(F.col("vec_id") % 100 == 23)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
        .crossJoin(emb.select("vec_id", "embedding"))
        .select(
            "query_id", "vec_id", squared_l2("embedding", F.col("qvec")).alias("d")
        )
        .collect()
    }
    cell_of = {
        r["vec_id"]: r["cell_id"]
        for r in assign_clusters(emb, cents, out_col="cell_id").select(
            "vec_id", "cell_id"
        ).collect()
    }
    probed = {
        r["query_id"]: set(r["cells"])
        for r in emb.filter(F.col("vec_id") % 100 == 23)
        .select(
            F.col("vec_id").alias("query_id"),
            _probe_cells_expr("embedding", cents, _IVF_NPROBE).alias("cells"),
        )
        .collect()
    }
    for r in got:
        assert abs(r["distance"] - truth[(r["query_id"], r["id"])]) < 1e-9
        assert cell_of[r["id"]] in probed[r["query_id"]]


def test_registry_row_runs_and_ranks_contiguously(spark, sf_smoke):
    rows = registry.queries()["ann_ivfpq_topk"](spark, sf_smoke).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
