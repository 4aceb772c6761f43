"""Query DSL (operators/querydsl.py): every node type must translate
to EXACTLY the direct operator call's result — the DSL adds no new
execution path, so equivalence IS its correctness contract (the
delegated operators carry the DuckDB oracles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.querydsl import search_dsl


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark table merge", 100),
        (2, "spark spark join", 400),
        (3, "table scan filter", 900),
        (4, "merge sort spark table", 250),
        (5, "filter only words", 50),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, pop long")


def _rows(df):
    return [
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


def _q(spark, terms):
    return spark.createDataFrame(
        [(0, terms)], "query_id long, qterms array<string>"
    )


def test_match_equals_bm25(spark, docs):
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk,
    )

    got = search_dsl(docs, {"match": {"terms": ["spark", "table"]}}, 3)
    want = bm25_topk(docs, _q(spark, ["spark", "table"]), 3)
    assert _rows(got) == _rows(want)


def test_bool_restricts_and_ranks(spark, docs):
    got = search_dsl(
        docs,
        {"bool": {"must": ["spark"], "must_not": ["join"]}},
        5,
    )
    ids = {r["id"] for r in got.collect()}
    assert ids == {1, 4}            # doc 2 vetoed, docs 3/5 lack spark
    should = search_dsl(
        docs, {"bool": {"should": ["scan", "sort"]}}, 5
    )
    assert {r["id"] for r in should.collect()} == {3, 4}


def test_fuzzy_and_wildcard_delegate(spark, docs):
    from distributed_vector_search_system_spark.operators.fuzzy import (
        bm25_fuzzy_topk,
        bm25_wildcard_topk,
    )

    got = search_dsl(docs, {"fuzzy": {"terms": ["sparkk"]}}, 3)
    want = bm25_fuzzy_topk(docs, _q(spark, ["sparkk"]), 3)
    assert _rows(got) == _rows(want)
    wq = spark.createDataFrame(
        [(0, ["ta*"])], "query_id long, qpatterns array<string>"
    )
    got_w = search_dsl(docs, {"wildcard": {"patterns": ["ta*"]}}, 3)
    assert _rows(got_w) == _rows(bm25_wildcard_topk(docs, wq, 3))
    # prefix is wildcard sugar
    got_p = search_dsl(docs, {"prefix": {"prefixes": ["ta"]}}, 3)
    assert _rows(got_p) == _rows(got_w)


def test_function_score_composition(spark, docs):
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk,
    )
    from distributed_vector_search_system_spark.operators.scoring import (
        field_value_factor,
        function_score,
    )

    dsl = {
        "function_score": {
            "query": {"match": {"terms": ["spark", "table"]}},
            "field_value_factor": {"field": "pop", "modifier": "log1p"},
            "boost_mode": "multiply",
        }
    }
    got = search_dsl(docs, dsl, 3)
    hits = bm25_topk(docs, _q(spark, ["spark", "table"]), 3).select(
        "query_id", "id", "score"
    )
    want = function_score(
        hits, field_value_factor(docs, "pop", modifier="log1p"), 3
    )
    assert _rows(got) == _rows(want)


def test_boosting_composition(spark, docs):
    dsl = {
        "boosting": {
            "positive": {"match": {"terms": ["spark", "table"]}},
            "negative": {"match": {"terms": ["join"]}},
            "negative_boost": 0.1,
        }
    }
    got = {r["id"]: r["score"] for r in search_dsl(docs, dsl, 5).collect()}
    plain = {
        r["id"]: r["score"]
        for r in search_dsl(
            docs, {"match": {"terms": ["spark", "table"]}}, 5
        ).collect()
    }
    assert got[2] == pytest.approx(plain[2] * 0.1, abs=2e-6)  # demoted
    assert got[1] == plain[1]                                  # untouched


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        search_dsl(docs, {"knn": {}}, 3)
    with pytest.raises(ValueError):
        search_dsl(docs, {"match": {}, "bool": {}}, 3)
    with pytest.raises(ValueError):
        search_dsl(docs, {"bool": {"must_not": ["x"]}}, 3)
    with pytest.raises(ValueError):
        search_dsl(
            docs,
            {"function_score": {"query": {"match": {"terms": ["a"]}}}},
            3,
        )
    with pytest.raises(ValueError):
        search_dsl(
            docs,
            {"boosting": {
                "positive": {"match": {"terms": ["a"]}},
                "negative": {"fuzzy": {"terms": ["a"]}},
            }},
            3,
        )


def test_match_phrase_delegates(spark, docs):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_topk,
    )

    got = search_dsl(
        docs, {"match_phrase": {"terms": ["spark", "table"]}}, 3
    )
    q = spark.createDataFrame(
        [(0, ["spark", "table"])], "query_id long, phrase array<string>"
    )
    want = phrase_topk(docs, q, 3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
