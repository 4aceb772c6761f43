"""Synonym expansion (operators/synonyms.py): two-channel weights,
merge-into-original, weight=0 degradation.  Exactness vs DuckDB is
the ``sparse_synonym_topk`` row in test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.sparse import (
    sparse_encode,
    sparse_topk,
)
from distributed_vector_search_system_spark.operators.synonyms import (
    expand_query_terms,
    sparse_synonym_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "car road car"),
        (2, "automobile road"),
        (3, "banana split"),
        (4, "car automobile"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(spark, terms, qid=0):
    return spark.createDataFrame(
        [(qid, list(terms))], "query_id long, qterms array<string>"
    )


def _thesaurus(spark, rows):
    return spark.createDataFrame(rows, "term string, synonym string, weight double")


def test_expansion_adds_discounted_channel(spark):
    q = _q(spark, ["car"])
    th = _thesaurus(spark, [("car", "automobile", 1.0)])
    got = {
        r["term"]: r["weight"]
        for r in expand_query_terms(q, th, weight=0.5).collect()
    }
    assert got["car"] == pytest.approx(1.0)        # original channel
    assert got["automobile"] == pytest.approx(0.5)  # discounted


def test_synonym_that_is_original_merges(spark):
    q = _q(spark, ["car", "automobile"])
    th = _thesaurus(spark, [("car", "automobile", 1.0)])
    got = {
        r["term"]: r["weight"]
        for r in expand_query_terms(q, th, weight=0.5).collect()
    }
    assert got["automobile"] == pytest.approx(1.5)  # 1.0 orig + 0.5 exp
    assert len(got) == 2


def test_thesaurus_weight_scales_channel(spark):
    q = _q(spark, ["car"])
    th = _thesaurus(spark, [("car", "automobile", 0.4)])
    got = {
        r["term"]: r["weight"]
        for r in expand_query_terms(q, th, weight=0.5).collect()
    }
    assert got["automobile"] == pytest.approx(0.2)


def test_expansion_is_directional(spark):
    q = _q(spark, ["automobile"])
    th = _thesaurus(spark, [("car", "automobile", 1.0)])
    got = {
        r["term"] for r in expand_query_terms(q, th).collect()
    }
    assert got == {"automobile"}   # no reverse edge


def test_retrieval_admits_synonym_only_docs(spark, corpus):
    q = _q(spark, ["car"])
    th = _thesaurus(spark, [("car", "automobile", 1.0)])
    plain = {
        r["id"] for r in sparse_synonym_topk(corpus, q, th, 10, weight=0.0).collect()
    }
    expanded = {
        r["id"] for r in sparse_synonym_topk(corpus, q, th, 10, weight=0.5).collect()
    }
    assert 2 not in plain        # 'automobile road' invisible to 'car'
    assert 2 in expanded


def test_weight_zero_degrades_to_plain_sparse(spark, corpus):
    q = _q(spark, ["car", "road"])
    th = _thesaurus(spark, [("car", "automobile", 1.0)])
    got = sparse_synonym_topk(corpus, q, th, 10, weight=0.0)
    enc = sparse_encode(corpus)
    qp = q.select(
        "query_id", F.explode("qterms").alias("term"), F.lit(1.0).alias("weight")
    )
    plain = sparse_topk(enc, qp, 10)
    assert [
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in got.orderBy("rank").collect()
    ] == [
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in plain.orderBy("rank").collect()
    ]


def test_validation(spark, corpus):
    q = _q(spark, ["car"])
    th = _thesaurus(spark, [("car", "automobile", 1.0)])
    with pytest.raises(ValueError):
        expand_query_terms(q, th, weight=-0.1)


def test_composes_with_sparse_engine(spark, corpus):
    """The gated serving form is pure composition: expansion is
    query-side, so SparseEngine.search(expanded postings) equals the
    from-scratch operator over the same snapshot."""
    from distributed_vector_search_system_spark.operators.sparse import (
        collect_doc_vectors,
    )
    from distributed_vector_search_system_spark.sparse_engine import SparseEngine

    q = _q(spark, ["car"])
    th = _thesaurus(spark, [("car", "automobile", 1.0)])
    enc = sparse_encode(corpus)
    engine = SparseEngine(spark, collect_doc_vectors(enc))
    got = engine.search(expand_query_terms(q, th, weight=0.5), 10)
    ref = sparse_synonym_topk(corpus, q, th, 10, weight=0.5)
    assert [
        (r["query_id"], r["id"], round(r["score"], 6), r["rank"])
        for r in got.orderBy("rank").collect()
    ] == [
        (r["query_id"], r["id"], round(r["score"], 6), r["rank"])
        for r in ref.orderBy("rank").collect()
    ]
