"""More-like-this (operators/mlt.py): term-selection gates, seed
exclusion, determinism.  Exactness vs DuckDB is the
``bm25_mlt_topk`` row in test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.mlt import (
    bm25_mlt_topk,
    mlt_select_terms,
)
from distributed_vector_search_system_spark.operators.sparse import sparse_encode


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana cherry apple"),
        (2, "apple banana durian"),
        (3, "cherry durian elderberry"),
        (4, "fig grape apple"),
        (5, "banana cherry fig unique"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _seeds(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "seed_id long")


def test_min_df_gate_drops_hapax(spark, corpus):
    enc = sparse_encode(corpus)
    # 'unique' appears in one doc only; min_df=2 must drop it
    sel = mlt_select_terms(enc, _seeds(spark, 5), min_df=2, max_query_terms=10)
    terms = {r["term"] for r in sel.collect()}
    assert "unique" not in terms
    assert terms  # the frequent terms survive


def test_max_df_gate_drops_stopword_frequency_terms(spark, corpus):
    enc = sparse_encode(corpus)
    # doc 2 = apple (df 3), banana (df 3), durian (df 2); max_df=2
    # keeps only durian
    sel = mlt_select_terms(
        enc, _seeds(spark, 2), min_df=1, max_df=2, max_query_terms=10
    )
    terms = {r["term"] for r in sel.collect()}
    assert terms == {"durian"}


def test_max_query_terms_caps_selection(spark, corpus):
    enc = sparse_encode(corpus)
    sel = mlt_select_terms(enc, _seeds(spark, 1), max_query_terms=1)
    assert sel.count() == 1


def test_selection_orders_by_weight_then_term(spark, corpus):
    enc = sparse_encode(corpus)
    sel = mlt_select_terms(enc, _seeds(spark, 1), max_query_terms=1)
    # doc 1: apple has tf=2 (sublinear boost) and is rarer-weighted
    # than nothing else in-doc with tf 2; top-1 must be deterministic
    top = sel.collect()[0]["term"]
    w = {
        r["term"]: round(r["weight"], 6)
        for r in enc.filter(F.col("id") == 1).collect()
    }
    assert w[top] == max(w.values())


def test_seed_excluded_from_own_results(spark, corpus):
    out = bm25_mlt_topk(corpus, _seeds(spark, 1, 2), 10, min_df=1)
    assert out.filter(F.col("id") == F.col("query_id")).count() == 0
    assert out.count() > 0


def test_include_seed_ranks_seed_first(spark, corpus):
    out = bm25_mlt_topk(
        corpus, _seeds(spark, 1), 10, min_df=1, include_seed=True
    )
    first = out.filter(F.col("rank") == 1).collect()[0]
    assert first["id"] == first["query_id"] == 1


def test_fully_gated_seed_returns_no_rows(spark, corpus):
    # every term of doc 3 has df >= 2 except elderberry; min_df high
    # enough gates everything away -> empty result, like an empty query
    out = bm25_mlt_topk(corpus, _seeds(spark, 3), 10, min_df=4)
    assert out.count() == 0


def test_validation():
    import pandas as pd  # noqa: F401  (no spark needed for raises)

    with pytest.raises(ValueError):
        mlt_select_terms(None, None, max_query_terms=0)
    with pytest.raises(ValueError):
        mlt_select_terms(None, None, min_df=0)
    with pytest.raises(ValueError):
        mlt_select_terms(None, None, min_df=5, max_df=3)


def test_smoke_fixture_end_to_end(spark, sf_smoke):
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    seeds = docs.filter(F.col("doc_id") % 200 == 7).select(
        F.col("doc_id").alias("seed_id")
    )
    out = bm25_mlt_topk(docs, seeds, 5, max_query_terms=8, min_df=2)
    assert out.columns == ["query_id", "id", "score", "rank"]
    assert out.filter(F.col("rank") > 5).count() == 0
    assert out.count() > 0
