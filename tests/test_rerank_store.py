"""Id-bucketed rerank store (sources/rerank_store.py): the IO bound for
the global two-phase tiers' exact re-rank (VERDICT r06 finding #1)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_sample_codebooks,
)
from distributed_vector_search_system_spark.operators.quantize import (
    quantize_vectors,
    quantized_knn,
)
from distributed_vector_search_system_spark.sources.rerank_store import (
    BUCKET_COL,
    lookup_ids,
    store_bucket_rows,
    write_rerank_store,
)
from distributed_vector_search_system_spark.tables import load_table


@pytest.fixture(scope="module")
def store(spark, sf_oracle, tmp_path_factory):
    """One int8+PQ tier persisted as a rerank store (module-shared):
    codes columns for phase 1, float column for phase 2, id-bucketed."""
    emb = load_table(spark, sf_oracle, "embeddings")
    books = pq_sample_codebooks(emb, dim=64, m=8, ksub=16)
    tier = pq_encode(quantize_vectors(emb), books)
    path = str(tmp_path_factory.mktemp("rerank") / "store")
    write_rerank_store(tier, path, bucket_rows=64)
    return emb, books, path


def _queries(emb):
    return emb.filter(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _key(rows):
    return sorted((r.query_id, r.rank, r.id, round(r.distance, 6)) for r in rows)


def test_lookup_matches_plain_filter(spark, store):
    emb, _, path = store
    ids = [3, 70, 200, 499]
    got = sorted(r.vec_id for r in lookup_ids(spark, path, ids).collect())
    want = sorted(
        r.vec_id for r in emb.filter(F.col("vec_id").isin(ids)).collect()
    )
    assert got == want == sorted(ids)
    assert BUCKET_COL not in lookup_ids(spark, path, ids).columns


def test_lookup_prunes_partitions_and_columns(spark, store):
    """The re-rank scan must carry an id_bucket PartitionFilter, read
    strictly fewer files than the store holds (measured), and prune to
    the requested columns only — that is the entire IO bound."""
    _, _, path = store
    lk = lookup_ids(spark, path, [3, 70]).select("vec_id", "embedding")
    plan = lk._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any(BUCKET_COL in l for l in pf), plan
    rs = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert rs and all("qcodes" not in l and "pq_codes" not in l for l in rs), plan

    total_files = len(glob.glob(path + f"/{BUCKET_COL}=*/*.parquet"))
    read_files = lk.select(F.input_file_name()).distinct().count()
    assert 0 < read_files < total_files


def test_quantized_knn_store_backed_equality(spark, store):
    """Store-backed phase 2 returns exactly the in-memory tier's result
    (same candidates, same exact re-rank)."""
    emb, _, path = store
    tier = spark.read.parquet(path)
    q = _queries(emb)
    base = quantized_knn(tier, q, 5, rerank=3)
    bounded = quantized_knn(tier, q, 5, rerank=3, rerank_store=path)
    assert _key(bounded.collect()) == _key(base.collect())
    assert bounded.count() > 0


def test_pq_topk_store_backed_equality(spark, store):
    emb, books, path = store
    tier = spark.read.parquet(path)
    q = _queries(emb)
    base = pq_adc_topk(tier, q, 5, books, rerank=4)
    bounded = pq_adc_topk(tier, q, 5, books, rerank=4, rerank_store=path)
    assert _key(bounded.collect()) == _key(base.collect())
    assert bounded.count() > 0


def test_store_backed_rerank_uses_dynamic_partition_pruning(spark, store):
    """The IO bound itself, plan-locked: the re-rank scan's
    PartitionFilters must carry a dynamicpruning expression on
    id_bucket — only buckets holding coarse candidates are read — and
    phase 1's coarse scan must stay float-free (the store layout must
    not regress the r03 phase-1 contract)."""
    emb, _, path = store
    tier = spark.read.parquet(path)
    out = quantized_knn(tier, _queries(emb), 5, rerank=3, rerank_store=path)
    plan = out._jdf.queryExecution().executedPlan().toString()
    dpp = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "dynamicpruning" in l
    ]
    assert dpp and any(BUCKET_COL in l for l in dpp), plan
    # phase 1 (the scan feeding the coarse ranking) reads codes, not floats
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    coarse = [l for l in reads if "qcodes" in l]
    assert coarse and not any("embedding" in l for l in coarse), reads


def test_store_backed_rerank_empty_queries(spark, store):
    emb, _, path = store
    tier = spark.read.parquet(path)
    out = quantized_knn(tier, _queries(emb).limit(0), 5, rerank=3, rerank_store=path)
    assert out.count() == 0


def test_lookup_empty_ids_returns_empty_with_store_schema(spark, store):
    """The empty-candidate contract is explicit (ADVICE r13): zero ids →
    zero rows, store schema (minus the bucket column), no reliance on
    the optimizer folding an empty IN list."""
    _, _, path = store
    out = lookup_ids(spark, path, [])
    assert out.count() == 0
    assert BUCKET_COL not in out.columns
    assert set(out.columns) == {
        c for c in spark.read.parquet(path).columns if c != BUCKET_COL
    }


def test_missing_marker_raises(spark, tmp_path, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path / "plain")
    emb.write.parquet(path)
    with pytest.raises(ValueError, match="not a rerank store"):
        store_bucket_rows(spark, path)


def test_marker_roundtrip(spark, store):
    _, _, path = store
    assert store_bucket_rows(spark, path) == 64


def test_bad_bucket_rows(spark, sf_smoke, tmp_path):
    emb = load_table(spark, sf_smoke, "embeddings")
    with pytest.raises(ValueError, match="bucket_rows"):
        write_rerank_store(emb, str(tmp_path / "x"), bucket_rows=0)
