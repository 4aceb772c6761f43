"""Matryoshka adaptive retrieval (operators/matryoshka.py): coarse
slicing semantics, degrade-to-exact, recall ordering, prefix-column
pruning.  Exactness vs DuckDB is the ``ann_matryoshka_topk`` row in
test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.matryoshka import (
    matryoshka_topk,
    prefix_cosine_topk,
    prefix_vector,
)
from distributed_vector_search_system_spark.operators.similarity import cosine_topk
from distributed_vector_search_system_spark.tables import load_table


def _queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _ids(df):
    return {(r["query_id"], r["id"]) for r in df.select("query_id", "id").collect()}


def test_degrades_to_exact_when_shortlist_covers_corpus(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    q = _queries(emb)
    n = emb.count()
    got = matryoshka_topk(emb, q, 5, d_prime=4, shortlist=n)
    exact = cosine_topk(emb, q, 5)
    assert _ids(got) == _ids(exact)


def test_full_prefix_equals_exact_coarse(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    q = _queries(emb)
    d = len(emb.select("embedding").first()["embedding"])
    got = prefix_cosine_topk(emb, q, 5, d_prime=d)
    exact = cosine_topk(emb, q, 5)
    assert _ids(got) == _ids(exact)


def test_recall_grows_with_d_prime(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    q = _queries(emb)
    exact = _ids(cosine_topk(emb, q, 5))

    def recall(dp):
        got = _ids(matryoshka_topk(emb, q, 5, d_prime=dp, shortlist=25))
        return len(got & exact) / len(exact)

    d = len(emb.select("embedding").first()["embedding"])
    r_small, r_big, r_full = recall(4), recall(32), recall(d)
    assert r_full == 1.0          # full-dim coarse IS the exact ranking
    assert r_big >= r_small - 1e-9


def test_rescore_scores_are_full_dimension(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    q = _queries(emb)
    got = matryoshka_topk(emb, q, 3, d_prime=8, shortlist=30)
    # the self-match (query vector present in the corpus) must score
    # cosine 1.0 — only true if the RESCORE uses the full vector
    self_rows = got.filter(F.col("id") == F.col("query_id")).collect()
    assert self_rows
    for r in self_rows:
        assert r["cosine"] == pytest.approx(1.0)


def test_prefix_col_path_matches_from_scratch(spark, sf_smoke, tmp_path):
    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path / "mrl")
    emb.select(
        "vec_id", "embedding", prefix_vector("embedding", 16).alias("p16")
    ).write.parquet(path)
    stored = spark.read.parquet(path)
    q = _queries(emb)
    a = matryoshka_topk(stored, q, 5, d_prime=16, shortlist=40)
    b = matryoshka_topk(emb, q, 5, d_prime=16, shortlist=40)
    assert _ids(a) == _ids(b)


def test_prefix_col_scan_prunes_full_vector(spark, sf_smoke, tmp_path):
    """The 100 TB claim: with a materialized prefix column the COARSE
    pass never reads the full vector bytes — its scan's ReadSchema
    carries the prefix column only."""
    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path / "mrl2")
    emb.select(
        "vec_id", "embedding", prefix_vector("embedding", 16).alias("p16")
    ).write.parquet(path)
    stored = spark.read.parquet(path)
    out = prefix_cosine_topk(
        stored, _queries(emb), 5, d_prime=16, prefix_col="p16"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "ReadSchema" in l and "mrl2" in l]
    assert scans, plan
    for line in scans:
        assert "embedding" not in line.split("ReadSchema")[1], line


def test_validation(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    q = _queries(emb)
    with pytest.raises(ValueError):
        matryoshka_topk(emb, q, 10, d_prime=8, shortlist=5)
    with pytest.raises(ValueError):
        prefix_cosine_topk(emb, q, 5, d_prime=0)
    with pytest.raises(ValueError):
        prefix_vector("embedding", 0)
