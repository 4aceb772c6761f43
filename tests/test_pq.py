"""Product-quantization tier (operators/pq.py).

Oracle parity for the registry rows (embedding_pq_codes, ann_pq_topk)
runs in test_oracle_parity.py; these tests lock the numeric guarantees,
the training behavior, and the stored-tier plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark import registry
from distributed_vector_search_system_spark.operators.knn import knn
from distributed_vector_search_system_spark.operators.pq import (
    adc_distance_expr,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    pq_reconstruction_mse,
    pq_sample_codebooks,
)
from distributed_vector_search_system_spark.tables import load_table

M, KSUB, DIM = 8, 16, 64


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def books(spark, sf_smoke):
    return pq_sample_codebooks(_emb(spark, sf_smoke), dim=DIM, m=M, ksub=KSUB)


def test_geometry_validation(spark, sf_smoke):
    with pytest.raises(ValueError, match="not divisible"):
        pq_sample_codebooks(_emb(spark, sf_smoke), dim=DIM, m=7, ksub=KSUB)
    with pytest.raises(ValueError, match="ksub"):
        pq_sample_codebooks(_emb(spark, sf_smoke), dim=DIM, m=M, ksub=200)


def test_codebook_shape(books):
    assert len(books) == M
    assert all(len(b) == KSUB for b in books)
    assert all(len(c) == DIM // M for b in books for c in b)


def test_codes_in_range(spark, sf_smoke, books):
    enc = pq_encode(_emb(spark, sf_smoke), books)
    bad = enc.filter(
        (F.size("pq_codes") != M)
        | F.exists("pq_codes", lambda c: (c < 0) | (c >= KSUB))
    ).count()
    assert bad == 0


def test_adc_equals_reconstruction_error_on_self(spark, sf_smoke, books):
    """ADC distance between a vector and its own codes must equal the
    reconstruction error: lut lookups replay exactly the per-subspace
    distances to the chosen centroids."""
    from distributed_vector_search_system_spark.operators.pq import _lut_sql

    enc = pq_encode(_emb(spark, sf_smoke), books)
    dsub = DIM // M
    df = enc.select(
        F.expr(_lut_sql("embedding", books, dsub)).alias("_lut"),
        F.col("pq_codes").alias("_codes"),
        "embedding",
    ).select(adc_distance_expr("_codes", "_lut").alias("adc"))
    # every ADC self-distance is >= 0 and finite
    row = df.agg(
        F.min("adc").alias("lo"), F.max("adc").alias("hi"), F.avg("adc").alias("mean")
    ).first()
    assert row["lo"] >= 0.0
    assert row["mean"] == pytest.approx(
        pq_reconstruction_mse(_emb(spark, sf_smoke), books), rel=1e-9
    )


def test_adc_recall_floor_and_exact_distances(spark, sf_smoke, books):
    """Recall vs exact kNN at the fixture (deterministic) and exactness
    of the returned distances (phase 2 re-ranks on the float column)."""
    emb = _emb(spark, sf_smoke)
    q = _queries(emb)
    approx = pq_adc_topk(emb, q, 5, books, rerank=10)
    exact = knn(emb, q, 5)
    a = {(r["query_id"], r["id"]): r["distance"] for r in approx.collect()}
    e = {(r["query_id"], r["id"]): r["distance"] for r in exact.collect()}
    hit = set(a) & set(e)
    assert len(hit) / len(e) >= 0.4  # deterministic on the fixture
    for key in hit:  # distances are EXACT where the candidate was found
        assert a[key] == pytest.approx(e[key], abs=1e-12)


def test_fit_improves_reconstruction_and_recall_not_worse(spark, sf_smoke, books):
    emb = _emb(spark, sf_smoke)
    mse0 = pq_reconstruction_mse(emb, books)
    trained, iters = pq_fit(emb, dim=DIM, m=M, ksub=KSUB, max_iterations=3)
    mse1 = pq_reconstruction_mse(emb, trained)
    assert 1 <= iters <= 3
    assert mse1 <= mse0 + 1e-12  # Lloyd never increases the objective


def test_stored_tier_coarse_scan_skips_float_column(spark, sf_oracle):
    """The registered ann_pq_topk plan reads the STORED code column in
    phase 1; the float embedding column enters only the re-rank scan
    (same stored-tier discipline as knn_quantized)."""
    df = registry.all_queries()["ann_pq_topk"](spark, sf_oracle)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    coarse = [l for l in read_schemas if "pq_codes" in l]
    assert coarse, read_schemas  # the stored tier really is scanned
    assert not any("embedding" in l for l in coarse), coarse
    assert any("embedding" in l and "pq_codes" not in l for l in read_schemas), (
        read_schemas
    )


def test_compression_ratio_on_disk(spark, sf_oracle):
    """The PQ tier's code payload is m bytes per vector vs 4·dim for the
    float32 column — assert the logical 32× (codes column width), not
    parquet file sizes (encoding noise)."""
    tier = registry.vector.pq_tier(spark, sf_oracle)
    row = tier.select(
        F.size("pq_codes").alias("m"), F.size("embedding").alias("d")
    ).first()
    code_bytes, float_bytes = row["m"], row["d"] * 4
    assert float_bytes == 32 * code_bytes  # 256 B float32 → 8 B codes
