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


# -- full request composition (round 12, VERDICT r11 item 2) ----------------


def test_request_aggs_over_full_match_set(spark, docs):
    """Aggregations cover the query's ENTIRE match set, not the top-k
    page: size=1 returns one hit, but the terms agg still counts all
    three admissible docs."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {
            "query": {"match": {"terms": ["spark"]}},
            "size": 1,
            "aggs": {
                "by_pop": {"extended_stats": {"field": "pop"}},
                "n_docs": {"cardinality": {"field": "doc_id"}},
            },
        },
    )
    assert out["hits"].count() == 1
    stats = out["aggregations"]["by_pop"].collect()[0]
    assert stats["n"] == 3                       # docs 1, 2, 4 match
    assert stats["sum_v"] == 100.0 + 400.0 + 250.0
    assert out["aggregations"]["n_docs"].collect()[0]["n_distinct"] == 3


def test_request_terms_agg_order_and_size(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    docs2 = docs.withColumn(
        "cat", F.when(F.col("doc_id") <= 2, "a").otherwise("b")
    )
    out = search_request(
        docs2,
        {
            "query": {"match": {"terms": ["spark", "table", "filter"]}},
            "aggs": {"cats": {"terms": {"field": "cat", "size": 1}}},
        },
    )
    rows = out["aggregations"]["cats"].collect()
    assert len(rows) == 1
    assert rows[0]["value"] == "b" and rows[0]["n"] == 3


def test_request_post_filter_hits_only(spark, docs):
    """post_filter restricts HITS but never the aggregations, and the
    surviving hits keep their unfiltered scores (corpus-level
    statistics) — the ES faceted-navigation contract."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {
            "query": {"match": {"terms": ["spark"]}},
            "size": 5,
            "aggs": {"all": {"cardinality": {"field": "doc_id"}}},
            "post_filter": {"match": {"terms": ["join"]}},
        },
    )
    hits = {r["id"]: r["score"] for r in out["hits"].collect()}
    assert set(hits) == {2}                       # only doc 2 has join
    # aggs ignore the post_filter
    assert out["aggregations"]["all"].collect()[0]["n_distinct"] == 3
    # score unchanged vs the unfiltered query
    plain = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["spark"]}}, 5).collect()
    }
    assert hits[2] == plain[2]


def test_request_field_sort_replaces_scoring(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {
            "query": {"bool": {"should": ["spark", "filter"]}},
            "size": 2,
            "sort": [{"pop": "desc"}],
        },
    )
    rows = out["hits"].collect()
    assert [r["id"] for r in rows] == [3, 2]      # pop 900, 400
    assert [r["rank"] for r in rows] == [1, 2]
    assert "score" not in out["hits"].columns
    assert [r["pop"] for r in rows] == [900, 400]


def test_request_sort_plan_partial_topk(spark, docs):
    """The field-sort page must keep the partial top-k discipline:
    either WindowGroupLimit (per-partition truncation to k before the
    exchange) or — what Catalyst actually picks for the single-query
    constant partition key — TakeOrderedAndProject, the global
    partial top-k (map-side k-row heaps, driver merge of k)."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {
            "query": {"match": {"terms": ["spark"]}},
            "size": 2,
            "sort": [{"pop": "asc"}],
        },
    )
    plan = out["hits"]._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan


def test_request_validation(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    with pytest.raises(ValueError, match="query"):
        search_request(docs, {"aggs": {}})
    with pytest.raises(ValueError, match="unknown request keys"):
        search_request(
            docs, {"query": {"match": {"terms": ["a"]}}, "preference": 3}
        )
    with pytest.raises(ValueError, match="match-set"):
        search_request(
            docs,
            {"query": {"fuzzy": {"terms": ["sparkk"]}},
             "aggs": {"x": {"cardinality": {"field": "doc_id"}}}},
        )
    with pytest.raises(ValueError, match="agg node"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "aggs": {"x": {"geo_bounds": {"field": "pop"}}}},
        )
    with pytest.raises(ValueError, match="sort"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "sort": [{"pop": "down"}]},
        )


def test_engine_search_request_gated(spark):
    """The gated verb: hits and aggregations read ONE snapshot —
    STRONG folds the pending upsert into both halves."""
    from distributed_vector_search_system_spark.text_engine import TextEngine

    base = spark.createDataFrame(
        [(1, "spark merge", 10.0), (2, "spark join", 20.0)],
        "doc_id long, text string, pop double",
    )
    e = TextEngine(spark, base)
    e.upsert_doc(3, "spark spark", pop=30.0)
    req = {
        "query": {"match": {"terms": ["spark"]}},
        "size": 5,
        "aggs": {"n": {"cardinality": {"field": "doc_id"}}},
    }
    ev = e.search_request(req)
    assert ev["hits"].count() == 2
    assert ev["aggregations"]["n"].collect()[0]["n_distinct"] == 2
    st = e.search_request(req, consistency="strong")
    assert st["hits"].count() == 3
    assert st["aggregations"]["n"].collect()[0]["n_distinct"] == 3


def test_match_phrase_slop_delegates(spark, docs):
    from distributed_vector_search_system_spark.operators.phrase import (
        phrase_slop_topk,
    )

    got = search_dsl(
        docs, {"match_phrase": {"terms": ["spark", "merge"], "slop": 2}}, 3
    )
    q = spark.createDataFrame(
        [(0, ["spark", "merge"])], "query_id long, phrase array<string>"
    )
    want = phrase_slop_topk(docs, q, 3, slop=2)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0


# -- rescore (round 12) ------------------------------------------------------


def test_rescore_phrase_total_mode(spark, docs):
    """Phrase rescore promotes the window doc containing the exact
    phrase; non-matching window docs keep query_weight * original."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["spark", "table"]}},
        "size": 4,
        "rescore": {
            "window_size": 4,
            "query": {
                "rescore_query": {
                    "match_phrase": {"terms": ["spark", "table"]}
                },
                "query_weight": 1.0,
                "rescore_query_weight": 10.0,
            },
        },
    }
    got = {r["id"]: r for r in search_request(docs, req)["hits"].collect()}
    plain = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["spark", "table"]}}, 4).collect()
    }
    # doc 1 "spark table merge" contains the phrase once: +10.0
    assert got[1]["score"] == pytest.approx(plain[1] + 10.0, abs=2e-6)
    assert got[1]["rank"] == 1
    # doc 2 "spark spark join" has no phrase: original score kept
    assert got[2]["score"] == pytest.approx(plain[2], abs=2e-6)


def test_rescore_match_modes(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    plain = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["table"]}}, 5).collect()
    }
    sec = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["merge"]}}, 5).collect()
    }
    for mode, fn in (
        ("total", lambda p, s: p + s),
        ("multiply", lambda p, s: p * s),
        ("avg", lambda p, s: (p + s) / 2),
        ("max", max),
        ("min", min),
    ):
        req = {
            "query": {"match": {"terms": ["table"]}},
            "size": 5,
            "rescore": {
                "window_size": 5,
                "query": {
                    "rescore_query": {"match": {"terms": ["merge"]}},
                    "score_mode": mode,
                },
            },
        }
        got = {
            r["id"]: r["score"]
            for r in search_request(docs, req)["hits"].collect()
        }
        for did, p in plain.items():
            want = fn(p, sec[did]) if did in sec else p
            assert got[did] == pytest.approx(want, abs=5e-6), (mode, did)


def test_rescore_window_bounds_second_pass(spark, docs):
    """Only the window is rescored: with window_size=1 the phrase boost
    cannot reach a doc outside the top-1 relevance page."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    # first pass by "spark": doc 2 ("spark spark join") ranks 1
    req = {
        "query": {"match": {"terms": ["spark"]}},
        "size": 2,
        "rescore": {
            "window_size": 1,
            "query": {
                "rescore_query": {
                    "match_phrase": {"terms": ["spark", "table"]}
                },
                "rescore_query_weight": 100.0,
            },
        },
    }
    rows = sorted(search_request(docs, req)["hits"].collect(),
                  key=lambda r: r["rank"])
    # doc 2 (top-1 by "spark", no phrase) is the only rescored doc and
    # stays first; doc 1's phrase cannot leapfrog into the window, it
    # follows in original order with its original score
    assert [r["id"] for r in rows] == [2, 1]
    plain = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["spark"]}}, 2).collect()
    }
    assert rows[1]["score"] == plain[1]


def test_rescore_plan_broadcasts_window(spark, docs):
    """The window ids must broadcast into the secondary scorer's
    restriction (k-bounded build side, the function_score discipline)."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["spark"]}},
        "size": 2,
        "rescore": {
            "window_size": 2,
            "query": {"rescore_query": {"match": {"terms": ["merge"]}}},
        },
    }
    plan = (
        search_request(docs, req)["hits"]
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi, BuildRight" in plan


def test_rescore_validation(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    with pytest.raises(ValueError, match="field sort"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "sort": [{"pop": "asc"}],
             "rescore": {"window_size": 2, "query": {
                 "rescore_query": {"match": {"terms": ["a"]}}}}},
        )
    with pytest.raises(ValueError, match="score_mode"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "rescore": {"query": {
                 "rescore_query": {"match": {"terms": ["a"]}},
                 "score_mode": "sum"}}},
        )
    with pytest.raises(ValueError, match="match or match_phrase"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "rescore": {"query": {
                 "rescore_query": {"fuzzy": {"terms": ["a"]}}}}},
        )


# -- nested sub-aggregations (round 12) --------------------------------------


def test_terms_subaggs_one_aggregate(spark, docs):
    """ES nested metric aggs: per-bucket avg/min/max/value_count/
    cardinality computed in the bucket's SINGLE hash aggregate."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    docs2 = docs.withColumn(
        "cat", F.when(F.col("doc_id") <= 2, "a").otherwise("b")
    )
    out = search_request(
        docs2,
        {
            "query": {"match": {"terms": ["spark", "filter"]}},
            "aggs": {
                "cats": {
                    "terms": {"field": "cat"},
                    "aggs": {
                        "avg_pop": {"avg": {"field": "pop"}},
                        "max_pop": {"max": {"field": "pop"}},
                        "n_ids": {"cardinality": {"field": "doc_id"}},
                    },
                }
            },
        },
    )
    agg = out["aggregations"]["cats"]
    got = {r["value"]: r for r in agg.collect()}
    # match set: docs 1,2,4 (spark) + 3,5 (filter) = all five
    assert got["a"]["n"] == 2 and got["a"]["avg_pop"] == 250.0
    assert got["a"]["max_pop"] == 400.0 and got["a"]["n_ids"] == 2
    assert got["b"]["n"] == 3 and got["b"]["avg_pop"] == 400.0
    # one hash-aggregate pair (partial + final), no second shuffle
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(value") <= 1


def test_bucket_subaggs_histogram_and_date(spark):
    from datetime import datetime

    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark", datetime(2024, 1, 1), 10.0),
            (2, "spark", datetime(2024, 1, 1, 9), 30.0),
            (3, "spark", datetime(2024, 1, 2), 7.0),
        ],
        "doc_id long, text string, ts timestamp, v double",
    )
    out = search_request(
        docs,
        {
            "query": {"match": {"terms": ["spark"]}},
            "aggs": {
                "daily": {
                    "date_histogram": {"field": "ts"},
                    "aggs": {"sum_v": {"sum": {"field": "v"}}},
                },
                "by_v": {
                    "histogram": {"field": "v", "interval": 10.0},
                    "aggs": {"n_ids": {"value_count": {"field": "doc_id"}}},
                },
            },
        },
    )
    daily = {r["bucket"].day: r["sum_v"] for r in out["aggregations"]["daily"].collect()}
    assert daily == {1: 40.0, 2: 7.0}
    byv = {r["bucket"]: r["n_ids"] for r in out["aggregations"]["by_v"].collect()}
    assert byv == {0.0: 1, 10.0: 1, 30.0: 1}


def test_subaggs_validation(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    with pytest.raises(ValueError, match="bucket kinds only"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "aggs": {"x": {"cardinality": {"field": "doc_id"},
                            "aggs": {"y": {"avg": {"field": "pop"}}}}}},
        )
    with pytest.raises(ValueError, match="sub-agg"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "aggs": {"x": {"terms": {"field": "pop"},
                            "aggs": {"y": {"percentiles": {"field": "pop"}}}}}},
        )


# -- search_after on a field sort (round 12) ---------------------------------


def test_search_after_resumes_sorted_page(spark, docs):
    """Stateless sorted pagination: page 1's last (sort values, id)
    tuple fed back as search_after yields exactly the next rows of the
    full sorted list — asc and desc."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    for order, full_ids in (("asc", [5, 1, 4, 2, 3]), ("desc", [3, 2, 4, 1, 5])):
        base = {
            "query": {"match": {"terms": ["spark", "table", "filter", "words"]}},
            "sort": [{"pop": order}],
        }
        p1 = sorted(
            search_request(docs, {**base, "size": 2})["hits"].collect(),
            key=lambda r: r["rank"],
        )
        assert [r["id"] for r in p1] == full_ids[:2]
        cursor = [p1[-1]["pop"], p1[-1]["id"]]
        p2 = sorted(
            search_request(
                docs, {**base, "size": 2, "search_after": cursor}
            )["hits"].collect(),
            key=lambda r: r["rank"],
        )
        assert [r["id"] for r in p2] == full_ids[2:4], order


def test_search_after_tie_break_on_id(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    docs = spark.createDataFrame(
        [(i, "spark", 7) for i in range(1, 6)],
        "doc_id long, text string, pop long",
    )
    base = {"query": {"match": {"terms": ["spark"]}}, "sort": [{"pop": "asc"}]}
    p1 = sorted(
        search_request(docs, {**base, "size": 2})["hits"].collect(),
        key=lambda r: r["rank"],
    )
    assert [r["id"] for r in p1] == [1, 2]
    p2 = search_request(
        docs, {**base, "size": 2, "search_after": [7, 2]}
    )["hits"].collect()
    assert sorted(r["id"] for r in p2) == [3, 4]


def test_search_after_cursor_below_window(spark, docs):
    """The cursor predicate filters RAW rows below the top-k window —
    page N aggregates only rows past the cursor."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    hits = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "sort": [{"pop": "asc"}], "size": 2, "search_after": [100, 1]},
    )["hits"]
    plan = hits._jdf.queryExecution().optimizedPlan().toString()
    win_pos = plan.index("Window")
    # the lexicographic cursor filter must print BELOW the window
    assert "pop" in plan[win_pos:] and "100" in plan[win_pos:]


def test_search_after_validation(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    with pytest.raises(ValueError, match="requires a field sort"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "search_after": [100, 1]},
        )
    with pytest.raises(ValueError, match="one value per sort field"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "sort": [{"pop": "asc"}], "search_after": [100]},
        )


# -- top-level knn hybrid (round 12) -----------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [(i, [float(i), float(i)]) for i in range(1, 6)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_knn_fusion_sum_contract(spark, docs, vectors):
    """combined = bm25 + boost·(1/(1+d²)); one-leg docs keep the other
    contribution at zero — the ES sum contract."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["filter"]}},     # docs 3, 5
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 2, "boost": 2.0},
    }
    got = {
        r["id"]: r["score"]
        for r in search_request(docs, req, vectors=vectors)["hits"].collect()
    }
    bm25 = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["filter"]}}, 5).collect()
    }
    # knn top-2 for [1,1]: ids 1 (d=0) and 2 (d=2)
    assert got[1] == pytest.approx(2.0 * 1.0, abs=2e-6)          # knn only
    assert got[2] == pytest.approx(2.0 / 3.0, abs=2e-6)          # knn only
    assert got[3] == pytest.approx(bm25[3], abs=2e-6)            # bm25 only
    assert got[5] == pytest.approx(bm25[5], abs=2e-6)
    assert set(got) == {1, 2, 3, 5}


def test_knn_fusion_sums_shared_doc(spark, docs, vectors):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["spark"]}},      # docs 1, 2, 4
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 1},   # doc 1 exactly
    }
    got = {
        r["id"]: r["score"]
        for r in search_request(docs, req, vectors=vectors)["hits"].collect()
    }
    bm25 = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["spark"]}}, 5).collect()
    }
    assert got[1] == pytest.approx(bm25[1] + 1.0, abs=2e-6)      # both legs
    assert got[1] > got[2]


def test_knn_fusion_aggs_and_validation(spark, docs, vectors):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "knn": {"query_vector": [1.0, 1.0], "k": 1},
         "aggs": {"n": {"cardinality": {"field": "doc_id"}}}},
        vectors=vectors,
    )
    # aggs stay on the QUERY match set (docs 1, 2, 4)
    assert out["aggregations"]["n"].collect()[0]["n_distinct"] == 3
    with pytest.raises(ValueError, match="vectors="):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "knn": {"query_vector": [1.0, 1.0]}},
        )
    with pytest.raises(ValueError, match="sort / rescore"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "knn": {"query_vector": [1.0, 1.0]},
             "sort": [{"pop": "asc"}]},
            vectors=vectors,
        )
    with pytest.raises(ValueError, match="match-set"):
        search_request(
            docs,
            {"query": {"fuzzy": {"terms": ["sparkk"]}},
             "knn": {"query_vector": [1.0, 1.0]}},
            vectors=vectors,
        )


def test_knn_fusion_plan_partial_topk(spark, docs, vectors):
    """Both the knn leg's top-k and the fused page must execute as
    partial top-k (TakeOrderedAndProject / WindowGroupLimit), and the
    fusion is ONE hash aggregate over the unioned contributions — no
    full-outer join."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    hits = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "knn": {"query_vector": [1.0, 1.0], "k": 2}},
        vectors=vectors,
    )["hits"]
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") + plan.count(
        "WindowGroupLimit"
    ) >= 2
    assert "FullOuter" not in plan and "SortMergeJoin" not in plan


# -- from + highlight (round 12) ---------------------------------------------


def test_from_offset_slices_page(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    full = _rows(
        search_request(
            docs, {"query": {"match": {"terms": ["spark", "table"]}},
                   "size": 4}
        )["hits"]
    )
    page2 = _rows(
        search_request(
            docs, {"query": {"match": {"terms": ["spark", "table"]}},
                   "size": 2, "from": 2}
        )["hits"]
    )
    assert page2 == full[2:4]                 # global ranks 3, 4
    assert [r[3] for r in page2] == [3, 4]
    # from composes with a field sort too
    sorted_p2 = search_request(
        docs,
        {"query": {"match": {"terms": ["spark", "table", "filter", "words"]}},
         "sort": [{"pop": "asc"}], "size": 2, "from": 2},
    )["hits"].collect()
    assert sorted(r["id"] for r in sorted_p2) == [2, 4]   # pop 250, 400


def test_highlight_matches_snippets_operator(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )
    from distributed_vector_search_system_spark.operators.snippets import (
        best_window_snippets,
    )

    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark", "table"]}},
         "size": 3, "highlight": {"window": 3}},
    )
    want = best_window_snippets(
        docs, _q(spark, ["spark", "table"]), 3,
        hits=out["hits"].select("query_id", "id"),
    )
    got_rows = sorted(map(tuple, out["highlight"].collect()))
    assert got_rows == sorted(map(tuple, want.collect()))
    assert len(got_rows) == 3                 # one snippet per hit
    assert all("spark" in r[-1] or "table" in r[-1] for r in got_rows)


def test_from_and_highlight_validation(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    with pytest.raises(ValueError, match="cursor IS the offset"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "sort": [{"pop": "asc"}], "from": 2,
             "search_after": [100, 1]},
        )
    with pytest.raises(ValueError, match="from must be"):
        search_request(
            docs, {"query": {"match": {"terms": ["spark"]}}, "from": -1}
        )
    with pytest.raises(ValueError, match="highlight needs"):
        search_request(
            docs,
            {"query": {"fuzzy": {"terms": ["sparkk"]}},
             "highlight": {"window": 3}},
        )


# -- bool filter context (round 12) ------------------------------------------


def test_bool_filter_context_restricts_without_scoring(spark, docs):
    """range/term/exists metadata clauses restrict the admissible set;
    surviving docs keep their corpus-level BM25 scores (filter context
    never scores — the ES contract)."""
    got = search_dsl(
        docs,
        {"bool": {"must": ["spark"],
                  "filter": [{"range": {"pop": {"gte": 200}}}]}},
        5,
    )
    rows = {r["id"]: r["score"] for r in got.collect()}
    assert set(rows) == {2, 4}              # doc 1 (pop 100) filtered
    plain = {
        r["id"]: r["score"]
        for r in search_dsl(docs, {"match": {"terms": ["spark"]}}, 5).collect()
    }
    assert rows[2] == plain[2] and rows[4] == plain[4]
    # term + exists clauses AND together
    got2 = search_dsl(
        docs,
        {"bool": {"must": ["spark"],
                  "filter": [{"term": {"pop": 250}},
                             {"exists": {"field": "text"}}]}},
        5,
    )
    assert {r["id"] for r in got2.collect()} == {4}


def test_bool_filter_composes_with_request(spark, docs):
    """The filter clauses flow through the full request path: aggs
    aggregate the FILTERED match set."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"bool": {"should": ["spark", "filter"],
                            "filter": [{"range": {"pop": {"lt": 500}}}]}},
         "aggs": {"n": {"cardinality": {"field": "doc_id"}}}},
    )
    # match set: spark|filter docs {1,2,3,4,5} minus pop>=500 (doc 3)
    assert out["aggregations"]["n"].collect()[0]["n_distinct"] == 4


def test_bool_filter_pushes_to_scan(spark, tmp_path, docs):
    """The metadata predicate must reach the parquet scan as
    PushedFilters."""
    path = str(tmp_path / "docs_pq")
    docs.write.mode("overwrite").parquet(path)
    pdocs = spark.read.parquet(path)
    df = search_dsl(
        pdocs,
        {"bool": {"must": ["spark"],
                  "filter": [{"range": {"pop": {"gte": 200}}}]}},
        5,
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("GreaterThanOrEqual(pop,200)" in l for l in pushed), plan


def test_bool_filter_validation(spark, docs):
    with pytest.raises(ValueError, match="filter clause"):
        search_dsl(
            docs,
            {"bool": {"must": ["spark"], "filter": [{"geo": {}}]}},
            5,
        )
    with pytest.raises(ValueError, match="range takes"):
        search_dsl(
            docs,
            {"bool": {"must": ["spark"],
                      "filter": [{"range": {"pop": {"eq": 5}}}]}},
            5,
        )


def test_bool_minimum_should_match(spark, docs):
    """ES minimum_should_match: should requires >= N distinct matched
    terms; ranking unchanged (BM25 over all positive terms, restricted
    to the stricter admissible set)."""
    got1 = {
        r["id"]
        for r in search_dsl(
            docs, {"bool": {"should": ["spark", "table", "filter"]}}, 5
        ).collect()
    }
    assert got1 == {1, 2, 3, 4, 5}
    got2 = search_dsl(
        docs,
        {"bool": {"should": ["spark", "table", "filter"],
                  "minimum_should_match": 2}},
        5,
    )
    assert {r["id"] for r in got2.collect()} == {1, 3, 4}
    plain = {
        r["id"]: r["score"]
        for r in search_dsl(
            docs, {"bool": {"should": ["spark", "table", "filter"]}}, 5
        ).collect()
    }
    for r in got2.collect():
        assert r["score"] == plain[r["id"]]     # scores untouched


# -- multi_match (round 12, post-close) --------------------------------------


def test_multi_match_per_field_stats_and_boost(spark):
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark guide", "spark table merge words here"),
            (2, "other title", "spark spark join"),
            (3, "spark spark", "filter only words"),
        ],
        "doc_id long, title string, text string",
    )
    q = _q(spark, ["spark"])
    t_leg = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, q, text_col="title").collect()
    }
    b_leg = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, q, text_col="text").collect()
    }
    best = search_dsl(
        docs,
        {"multi_match": {"terms": ["spark"],
                         "fields": ["title^2", "text"]}},
        5,
    )
    got = {r["id"]: r["score"] for r in best.collect()}
    import pytest as _pt

    for did in (1, 2, 3):
        want = max(
            2.0 * t_leg.get(did, float("-inf")),
            b_leg.get(did, float("-inf")),
        )
        assert got[did] == _pt.approx(want, abs=2e-6), did
    most = search_dsl(
        docs,
        {"multi_match": {"terms": ["spark"],
                         "fields": ["title^2", "text"],
                         "type": "most_fields"}},
        5,
    )
    got_m = {r["id"]: r["score"] for r in most.collect()}
    for did in (1, 2, 3):
        want = 2.0 * t_leg.get(did, 0.0) + b_leg.get(did, 0.0)
        assert got_m[did] == _pt.approx(want, abs=2e-6), did


def test_multi_match_validation(spark, docs):
    with pytest.raises(ValueError, match="fields"):
        search_dsl(docs, {"multi_match": {"terms": ["a"], "fields": []}}, 3)
    with pytest.raises(ValueError, match="best_fields"):
        search_dsl(
            docs,
            {"multi_match": {"terms": ["a"], "fields": ["text"],
                             "type": "cross_fields"}},
            3,
        )


def test_constant_score_node(spark, docs):
    got = search_dsl(
        docs,
        {"constant_score": {
            "filter": {"bool": {"must": ["spark"], "must_not": ["join"]}},
            "boost": 1.5,
        }},
        5,
    )
    rows = sorted(got.collect(), key=lambda r: r["rank"])
    assert [r["id"] for r in rows] == [1, 4]        # id order (tie on score)
    assert all(r["score"] == 1.5 for r in rows)
    with pytest.raises(ValueError, match="match-set"):
        search_dsl(
            docs,
            {"constant_score": {"filter": {"fuzzy": {"terms": ["a"]}}}},
            5,
        )


def test_knn_fusion_prescored_leg(spark, docs, vectors):
    """A pre-scored (id, distance) frame — any ANN tier's output —
    plugs in as the knn leg; with exact distances the fusion equals
    the from-scratch form."""
    from distributed_vector_search_system_spark.functions.distance import (
        squared_l2,
    )
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["spark"]}},
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 2, "boost": 2.0},
    }
    exact = search_request(docs, req, vectors=vectors)["hits"]
    qv = F.array(F.lit(1.0), F.lit(1.0))
    pre = vectors.select(
        F.col("vec_id").alias("id"),
        squared_l2(F.col("embedding"), qv).alias("distance"),
    )
    served = search_request(docs, req, vectors=pre)["hits"]
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, served.collect())
    )


def test_fields_and_total_hits(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "size": 2, "fields": ["pop"],
         "track_total_hits": True},
    )
    rows = out["hits"].collect()
    assert len(rows) == 2
    got_fields = {(r["id"], r["pop"]) for r in rows}
    assert got_fields <= {(1, 100), (2, 400), (4, 250)}
    # the total counts the FULL match set, not the page
    assert out["total_hits"].collect()[0]["total_hits"] == 3
    plan = out["hits"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fields_compose_with_sort_and_knn(spark, docs, vectors):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    srt = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "sort": [{"pop": "desc"}], "size": 2, "fields": ["text"]},
    )["hits"].collect()
    assert all(r["text"] for r in srt)
    hyb = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "knn": {"query_vector": [1.0, 1.0], "k": 1},
         "size": 3, "fields": ["pop"]},
        vectors=vectors,
    )["hits"].collect()
    assert all(r["pop"] is not None for r in hyb)


def test_stats_and_significant_terms_aggs(spark, docs):
    from distributed_vector_search_system_spark.operators.facets import (
        significant_terms,
    )
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "aggs": {
             "pops": {"stats": {"field": "pop"}},
             "about": {"significant_terms": {"top_n": 3, "min_fg_df": 2}},
         }},
    )
    st = out["aggregations"]["pops"].collect()[0]
    assert st["n"] == 3 and st["sum_v"] == 750.0
    assert sorted(out["aggregations"]["pops"].columns) == sorted(
        ["n", "min_v", "max_v", "avg_v", "sum_v"]
    )
    got = out["aggregations"]["about"]
    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 4)], "query_id long, id long"
    )
    want = significant_terms(hits, docs, 3, min_fg_df=2)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0


# -- round 13: ADVICE r12 fixes + persist / highlight extensions -------------


def test_rescore_phrase_primary_maps_tf_to_score(spark, docs):
    """ADVICE r12 item 4: a match_phrase primary reaches rescore with
    phrase_tf — search_request must expose it as the first-pass score
    (not die in an AnalysisException) and the rescore math applies."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_scores,
    )

    out = search_request(
        docs,
        {"query": {"match_phrase": {"terms": ["spark", "table"]}},
         "size": 3,
         "rescore": {
             "window_size": 3,
             "query": {"rescore_query": {"match": {"terms": ["merge"]}}},
         }},
    )["hits"]
    got = {r["id"]: r["score"] for r in out.collect()}
    # docs 1 ("spark table merge") and 4 ("merge sort spark table")
    # contain the exact phrase once → first-pass score 1.0; both also
    # match the rescore query, so total mode adds their BM25 "merge"
    # score on top
    sec = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, _q(spark, ["merge"])).collect()
    }
    assert set(got) == {1, 4}
    for did in (1, 4):
        assert got[did] == pytest.approx(1.0 + sec[did], abs=1e-6)


def test_rescore_scoreless_frame_clear_error(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        _apply_rescore,
    )

    scoreless = docs.selectExpr(
        "cast(0 as long) as query_id", "doc_id as id",
        "cast(1 as long) as phrase_tf", "cast(1 as int) as rank",
    )
    with pytest.raises(ValueError, match="relevance-scored first pass"):
        _apply_rescore(
            docs, scoreless,
            {"window_size": 3,
             "query": {"rescore_query": {"match": {"terms": ["merge"]}}}},
            3, doc_id_col="doc_id", text_col="text",
        )


def test_request_agg_approximate_tiers(spark, docs):
    """ADVICE r12 item 2: the request body can pick the approximate
    tier — exact=False (GK / HLL++) and ES's precision_threshold both
    reach _one_agg; on this 3-value match set the sketches are exact,
    so the numbers must agree with the exact tier."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "aggs": {
             "card_hll": {"cardinality": {"field": "pop", "exact": False}},
             "card_pt": {"cardinality": {"field": "pop",
                                         "precision_threshold": 3000}},
             "p50_gk": {"percentiles": {"field": "pop",
                                        "percents": [50.0],
                                        "exact": False}},
         }},
    )["aggregations"]
    # match set = docs 1, 2, 4 → pop {100, 400, 250}
    assert out["card_hll"].collect()[0][0] == 3
    assert out["card_pt"].collect()[0][0] == 3
    assert out["p50_gk"].collect()[0]["p50"] == 250.0
    # the plans carry the sketch aggregates, not the exact ones
    hll_plan = out["card_hll"]._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_count_distinct" in hll_plan
    gk_plan = out["p50_gk"]._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in gk_plan


def test_highlight_multi_match_and_phrase(spark, docs):
    """VERDICT r12 item 6: multi_match / match_phrase queries carry
    terms, so they highlight — equivalently to the snippets operator
    called with those terms."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )
    from distributed_vector_search_system_spark.operators.snippets import (
        best_window_snippets,
    )

    mm = search_request(
        docs,
        {"query": {"multi_match": {"terms": ["spark", "merge"],
                                   "fields": ["text"]}},
         "size": 3, "highlight": {"window": 3}},
    )
    want = best_window_snippets(
        docs, _q(spark, ["merge", "spark"]), 3,
        hits=mm["hits"].select("query_id", "id"),
    )
    assert sorted(map(tuple, mm["highlight"].collect())) == sorted(
        map(tuple, want.collect())
    )
    mp = search_request(
        docs,
        {"query": {"match_phrase": {"terms": ["spark", "table"]}},
         "size": 3, "highlight": {"window": 3}},
    )
    snips = {r["id"]: r[-1] for r in mp["highlight"].collect()}
    assert set(snips) == {r["id"] for r in mp["hits"].collect()}
    assert all("spark" in s and "table" in s for s in snips.values())


def test_persist_match_set_computes_once(spark, docs):
    """VERDICT r12 item 5: persist_match_set=True caches the match-set
    id frame — every aggregation and total_hits read one
    InMemoryRelation instead of re-evaluating the match subtree — with
    identical results, and the release handle unpersists."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"bool": {"must": ["spark"], "must_not": ["join"]}},
        "size": 3,
        "track_total_hits": True,
        "aggs": {
            "by_pop": {"terms": {"field": "pop"}},
            "pops": {"stats": {"field": "pop"}},
        },
    }
    plain = search_request(docs, req)
    cached = search_request(docs, req, persist_match_set=True)
    try:
        for name in ("by_pop", "pops"):
            plan = (
                cached["aggregations"][name]
                ._jdf.queryExecution().optimizedPlan().toString()
            )
            assert "InMemoryRelation" in plan, name
            assert sorted(map(tuple, cached["aggregations"][name].collect())) \
                == sorted(map(tuple, plain["aggregations"][name].collect()))
        th_plan = (
            cached["total_hits"]._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "InMemoryRelation" in th_plan
        assert cached["total_hits"].collect()[0][0] \
            == plain["total_hits"].collect()[0][0] == 2
        assert _rows(cached["hits"]) == _rows(plain["hits"])
    finally:
        cached["release"]()
    assert "release" not in plain


# -- round 13: pre-filtered kNN + post_filter over hybrid hits ---------------


@pytest.fixture(scope="module")
def lvectors(spark):
    rows = [(i, [float(i), float(i)], i % 2) for i in range(1, 6)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_knn_prefilter_restricts_before_topk(spark, docs, lvectors):
    """VERDICT r12 item 2: knn.filter restricts candidates BEFORE the
    top-k cut — the page refills from below, it does not shrink."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["filter"]}},     # docs 3, 5
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 2, "boost": 2.0,
                "filter": [{"term": {"label": 0}}]},   # even vec_ids
    }
    got = {
        r["id"]: r["score"]
        for r in search_request(docs, req, vectors=lvectors)["hits"].collect()
    }
    # unfiltered knn top-2 would be {1, 2}; label=0 keeps {2, 4} and
    # the cut refills with 4 (d = 18) instead of shrinking to one row
    assert got[2] == pytest.approx(2.0 / 3.0, abs=2e-6)
    assert got[4] > 0.0 and 1 not in got
    assert set(got) == {2, 3, 4, 5}


def test_knn_prefilter_docs_metadata_and_node(spark, docs, lvectors):
    """Filter fields that live on the DOCS frame (and full match/bool
    nodes) restrict the candidates via an id semi-join."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["filter"]}},
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 2, "boost": 2.0,
                "filter": [{"range": {"pop": {"gte": 200}}}]},
    }
    got = search_request(docs, req, vectors=lvectors)["hits"]
    ids = {r["id"] for r in got.collect()}
    # pop >= 200 keeps docs 2 (400), 3 (900), 4 (250) → knn top-2 of
    # {2, 3, 4} is {2, 3}; text leg adds 3, 5
    assert ids == {2, 3, 5}
    node_req = {
        "query": {"match": {"terms": ["filter"]}},
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 2, "boost": 2.0,
                "filter": {"match": {"terms": ["spark"]}}},
    }
    node_ids = {
        r["id"]
        for r in search_request(docs, node_req, vectors=lvectors)[
            "hits"
        ].collect()
    }
    # "spark" matches docs 1, 2, 4 → knn top-2 = {1, 2}
    assert node_ids == {1, 2, 3, 5}


def test_knn_post_filter_restricts_hits_only(spark, docs, lvectors):
    """VERDICT r12 item 3: post_filter now composes with knn — the
    fused hit list is restricted by the post_filter's own match set
    (scores unchanged, knn-only docs admissible), aggs unaffected."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    base = {
        "query": {"match": {"terms": ["filter"]}},     # docs 3, 5
        "size": 5,
        "aggs": {"pops": {"stats": {"field": "pop"}}},
        "knn": {"query_vector": [1.0, 1.0], "k": 2, "boost": 2.0},
    }
    plain = search_request(docs, base, vectors=lvectors)
    pf = search_request(
        docs,
        {**base, "post_filter": {"bool": {"must_not": ["scan"]}}},
        vectors=lvectors,
    )
    plain_scores = {r["id"]: r["score"] for r in plain["hits"].collect()}
    pf_scores = {r["id"]: r["score"] for r in pf["hits"].collect()}
    # doc 3 ("table scan filter") drops; everything else keeps its
    # fused score — including knn-only docs 1 and 2
    assert set(plain_scores) == {1, 2, 3, 5}
    assert set(pf_scores) == {1, 2, 5}
    for did, s in pf_scores.items():
        assert s == pytest.approx(plain_scores[did], abs=1e-9)
    # aggs still describe the UNfiltered match set
    assert sorted(map(tuple, pf["aggregations"]["pops"].collect())) == sorted(
        map(tuple, plain["aggregations"]["pops"].collect())
    )
    # sort / rescore still refuse
    with pytest.raises(ValueError, match="sort / rescore"):
        search_request(
            docs, {**base, "sort": [{"pop": "asc"}]}, vectors=lvectors
        )


def test_knn_prefilter_pushes_to_vector_scan(spark, docs, lvectors, tmp_path):
    """The vector-frame half of knn.filter must reach the parquet scan
    as PushedFilters — the plan shape that composes with partition
    pruning on the IVF tier."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    path = str(tmp_path / "vecs")
    lvectors.write.parquet(path)
    pv = spark.read.parquet(path)
    req = {
        "query": {"match": {"terms": ["filter"]}},
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 2,
                "filter": [{"term": {"label": 0}}]},
    }
    hits = search_request(docs, req, vectors=pv)["hits"]
    plan = hits._jdf.queryExecution().executedPlan().toString()
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("label" in p for p in pushed), plan


# -- round 13: bucket-in-bucket sub-aggregations -----------------------------


def test_nested_terms_in_terms(spark, docs):
    """VERDICT r12 item 3: a terms agg nested inside a terms parent —
    one hash aggregate over the composite key, long-format output."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [
        (1, "spark a", "s1", "en", 10), (2, "spark b", "s1", "en", 20),
        (3, "spark c", "s1", "de", 30), (4, "spark d", "s2", "en", 40),
        (5, "other", "s3", "fr", 50),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, src string, lang string, nc long"
    )
    out = search_request(
        d,
        {"query": {"match": {"terms": ["spark"]}},
         "aggs": {"by_src": {
             "terms": {"field": "src"},
             "aggs": {"by_lang": {
                 "terms": {"field": "lang"},
                 "aggs": {"avg_nc": {"avg": {"field": "nc"}}},
             }},
         }}},
        doc_id_col="doc_id",
    )["aggregations"]["by_src"]
    assert out.columns == ["value", "by_lang", "n", "avg_nc"]
    got = {(r["value"], r["by_lang"]): (r["n"], r["avg_nc"])
           for r in out.collect()}
    assert got == {
        ("s1", "en"): (2, 15.0), ("s1", "de"): (1, 30.0),
        ("s2", "en"): (1, 40.0),
    }
    # ONE hash-aggregate pass over the data: the composite aggregate
    # plus nothing re-scanning the corpus (shaping aggregates read the
    # composite output only — no parent size here, so exactly one)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2       # partial + final


def test_nested_parent_and_child_size_shaping(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [
        (i, "x", f"s{i % 4}", f"l{i % 3}", i) for i in range(1, 25)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, src string, lang string, nc long"
    )
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {"a": {
             "terms": {"field": "src", "size": 2},
             "aggs": {"l": {"terms": {"field": "lang", "size": 1}}},
         }}},
    )["aggregations"]["a"].collect()
    parents = {r["value"] for r in out}
    assert len(parents) == 2                 # parent top-2 by total
    assert len(out) == 2                     # child top-1 per parent
    for r in out:
        assert r["n"] >= 1


def test_nested_date_histogram_in_terms(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [
        (1, "x", "a", "2024-01-01 05:00:00"),
        (2, "x", "a", "2024-01-01 09:00:00"),
        (3, "x", "a", "2024-01-02 05:00:00"),
        (4, "x", "b", "2024-01-02 06:00:00"),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, g string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {"daily": {
             "terms": {"field": "g"},
             "aggs": {"day": {"date_histogram": {
                 "field": "ts", "calendar_interval": "day"}}},
         }}},
    )["aggregations"]["daily"]
    got = {(r["value"], str(r["day"])[:10]): r["n"] for r in out.collect()}
    assert got == {
        ("a", "2024-01-01"): 2, ("a", "2024-01-02"): 1,
        ("b", "2024-01-02"): 1,
    }


def test_nested_bucket_validation(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    base = {"query": {"match": {"terms": ["spark"]}}}
    with pytest.raises(ValueError, match="terms parent only"):
        search_request(
            docs,
            {**base, "aggs": {"h": {
                "histogram": {"field": "pop", "interval": 100.0},
                "aggs": {"t": {"terms": {"field": "pop"}}},
            }}},
        )
    with pytest.raises(ValueError, match="ONLY sub-agg"):
        search_request(
            docs,
            {**base, "aggs": {"a": {
                "terms": {"field": "pop"},
                "aggs": {"t": {"terms": {"field": "pop"}},
                         "m": {"avg": {"field": "pop"}}},
            }}},
        )
    with pytest.raises(ValueError, match="third bucket level"):
        search_request(
            docs,
            {**base, "aggs": {"a": {
                "terms": {"field": "pop"},
                "aggs": {"t": {"terms": {"field": "pop"},
                               "aggs": {"u": {"terms": {"field": "pop"}}}}},
            }}},
        )


# -- round 13: batch msearch -------------------------------------------------


def test_msearch_equals_per_request_pages(spark, docs):
    """Each request's page must equal the single-request search_dsl
    result with its own size — heterogeneous match / bool / min_should
    bodies through one plan."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        msearch,
    )

    requests = [
        {"query": {"match": {"terms": ["spark", "table"]}}, "size": 3},
        {"query": {"bool": {"must": ["spark"], "must_not": ["join"]}},
         "size": 2},
        {"query": {"bool": {"should": ["scan", "sort", "filter"],
                            "minimum_should_match": 2}}, "size": 5},
    ]
    got = msearch(docs, requests)["hits"]
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for i, req in enumerate(requests):
        want = search_dsl(docs, req["query"], req["size"])
        w = sorted(
            (r["rank"], r["id"], r["score"]) for r in want.collect()
        )
        assert sorted(by_q.get(i, [])) == w, f"request {i}"


def test_msearch_one_plan_scan_count_independent_of_n(spark, docs):
    """The batch thesis: adding requests must not add corpus scans —
    the plan for 3 heterogeneous requests reads the docs relation
    exactly as often as the plan for 1."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        msearch,
    )

    one = msearch(
        docs, [{"query": {"match": {"terms": ["spark"]}}, "size": 3}]
    )["hits"]._jdf.queryExecution().optimizedPlan().toString()
    three = msearch(
        docs,
        [
            {"query": {"match": {"terms": ["spark"]}}, "size": 3},
            {"query": {"bool": {"must": ["table"], "must_not": ["join"]}},
             "size": 2},
            {"query": {"bool": {"should": ["scan", "sort"]}}, "size": 4},
        ],
    )["hits"]._jdf.queryExecution().optimizedPlan().toString()
    import re

    def scans(plan):
        return len(re.findall(r"LogicalRDD|Relation\b", plan))

    assert scans(three) == scans(one)


def test_msearch_labeled_aggs(spark, docs):
    """Same-named aggs across requests run as ONE grouped aggregate
    labeled by query_id; per-request values equal the single-request
    search_request aggs."""
    from distributed_vector_search_system_spark.operators.querydsl import (
        msearch,
        search_request,
    )

    docs2 = docs.withColumn(
        "cat", F.when(F.col("doc_id") <= 2, "a").otherwise("b")
    )
    agg = {"cats": {"terms": {"field": "cat"}},
           "pops": {"stats": {"field": "pop"}}}
    requests = [
        {"query": {"match": {"terms": ["spark"]}}, "aggs": agg},
        {"query": {"match": {"terms": ["filter"]}}, "aggs": agg},
    ]
    out = msearch(docs2, requests)
    cats = out["aggregations"]["cats"]
    assert set(cats.columns) == {"query_id", "value", "n"}
    # one grouped aggregate regardless of request count — the labeled
    # plan's aggregate count matches the single-request plan's
    solo = msearch(docs2, requests[:1])["aggregations"]["cats"]
    plan = cats._jdf.queryExecution().optimizedPlan().toString()
    solo_plan = solo._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == solo_plan.count("Aggregate")
    for i, req in enumerate(requests):
        single = search_request(
            docs2, {"query": req["query"], "aggs": agg}
        )["aggregations"]
        got_c = sorted(
            (r["value"], r["n"])
            for r in cats.filter(F.col("query_id") == i).collect()
        )
        want_c = sorted(
            (r["value"], r["n"]) for r in single["cats"].collect()
        )
        assert got_c == want_c, f"request {i} cats"
        got_p = (
            out["aggregations"]["pops"]
            .filter(F.col("query_id") == i)
            .drop("query_id")
            .collect()[0]
        )
        want_p = single["pops"].collect()[0]
        assert tuple(got_p) == tuple(want_p), f"request {i} pops"


def test_msearch_validation(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        msearch,
    )

    with pytest.raises(ValueError, match="at least one request"):
        msearch(docs, [])
    with pytest.raises(ValueError, match="query/size/aggs/from only"):
        msearch(
            docs,
            [{"query": {"match": {"terms": ["a"]}}, "sort": [{"pop": "asc"}]}],
        )
    with pytest.raises(ValueError, match="match-set node"):
        msearch(docs, [{"query": {"fuzzy": {"terms": ["a"]}}}])
    with pytest.raises(ValueError, match="single-request"):
        msearch(
            docs,
            [{"query": {"bool": {
                "must": ["spark"],
                "filter": [{"range": {"pop": {"gte": 1}}}]}}}],
        )
    with pytest.raises(ValueError, match="positive clause"):
        msearch(docs, [{"query": {"bool": {"must_not": ["spark"]}}}])
    with pytest.raises(ValueError, match="two different bodies"):
        msearch(
            docs,
            [
                {"query": {"match": {"terms": ["spark"]}},
                 "aggs": {"a": {"terms": {"field": "pop"}}}},
                {"query": {"match": {"terms": ["table"]}},
                 "aggs": {"a": {"terms": {"field": "doc_id"}}}},
            ],
        )


# -- round 13: range / filters / missing aggs + top_hits sub-agg -------------


def test_range_agg_overlapping_buckets(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [(1, "x", 50), (2, "x", 150), (3, "x", 250), (4, "x", 350),
            (5, "x", None)]
    d = spark.createDataFrame(rows, "doc_id long, text string, pop long")
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {"r": {
             "range": {"field": "pop",
                       "ranges": [{"to": 200},
                                  {"from": 100, "to": 300},
                                  {"from": 200, "key": "big"}]},
             "aggs": {"avg_pop": {"avg": {"field": "pop"}}},
         }}},
    )["aggregations"]["r"]
    got = {r["key"]: (r["n"], r["avg_pop"]) for r in out.collect()}
    # overlap: doc 2 (150) is in both the first two ranges; null drops
    assert got["*-200.0"] == (2, 100.0)
    assert got["100.0-300.0"] == (2, 200.0)
    assert got["big"] == (2, 300.0)


def test_filters_and_missing_aggs(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [(1, "x", 50, "a"), (2, "x", 150, "b"), (3, "x", 250, None),
            (4, "x", None, "a")]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, pop long, cat string"
    )
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {
             "f": {"filters": {"filters": {
                 "cheap": {"range": {"pop": {"lt": 200}}},
                 "tagged": [{"exists": {"field": "cat"}},
                            {"range": {"pop": {"gte": 100}}}],
             }}},
             "no_cat": {"missing": {"field": "cat"},
                        "aggs": {"max_pop": {"max": {"field": "pop"}}}},
         }},
    )["aggregations"]
    got = {r["key"]: r["n"] for r in out["f"].collect()}
    assert got == {"cheap": 2, "tagged": 1}
    miss = out["no_cat"].collect()[0]
    assert miss["n"] == 1 and miss["max_pop"] == 250.0


def test_top_hits_sub_agg_in_terms(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [(1, "x", 50, "a"), (2, "x", 150, "a"), (3, "x", 250, "b"),
            (4, "x", 70, "b"), (5, "x", 70, "b")]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, pop long, cat string"
    )
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {"per_cat": {
             "terms": {"field": "cat"},
             "aggs": {"top": {"top_hits": {
                 "size": 2, "sort": [{"pop": "desc"}]}}},
         }}},
    )["aggregations"]["per_cat"]
    assert out.columns == ["value", "doc_id", "pop", "rank"]
    got = sorted(map(tuple, out.collect()))
    assert got == [("a", 1, 50, 2), ("a", 2, 150, 1),
                   ("b", 3, 250, 1), ("b", 4, 70, 2)]
    with pytest.raises(ValueError, match="only sub-agg"):
        search_request(
            d,
            {"query": {"match": {"terms": ["x"]}},
             "aggs": {"p": {
                 "terms": {"field": "cat"},
                 "aggs": {"top": {"top_hits": {"size": 1,
                                               "sort": [{"pop": "desc"}]}},
                          "m": {"avg": {"field": "pop"}}},
             }}},
        )


def test_engine_msearch_gated(spark):
    """The batch verb reads ONE gated snapshot: STRONG folds the
    pending upsert into every request of the batch."""
    from distributed_vector_search_system_spark.text_engine import TextEngine

    base = spark.createDataFrame(
        [(1, "spark merge", 10.0), (2, "spark join", 20.0)],
        "doc_id long, text string, pop double",
    )
    e = TextEngine(spark, base)
    e.upsert_doc(3, "spark spark merge", pop=30.0)
    reqs = [
        {"query": {"match": {"terms": ["spark"]}}, "size": 5},
        {"query": {"bool": {"must": ["merge"]}}, "size": 5},
    ]
    ev = e.msearch(reqs)["hits"]
    assert {(r["query_id"], r["id"]) for r in ev.collect()} == {
        (0, 1), (0, 2), (1, 1)
    }
    st = e.msearch(reqs, consistency="strong")["hits"]
    assert {(r["query_id"], r["id"]) for r in st.collect()} == {
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 3)
    }


# -- round 13: dis_max + collapse --------------------------------------------


def test_dis_max_best_clause_and_tie_breaker(spark, docs):
    """dis_max = max leg score + tie_breaker × the rest — verified
    against the legs' own bm25_scores."""
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_scores,
    )

    legs = [
        {"match": {"terms": ["table"]}},
        {"bool": {"must": ["spark"], "must_not": ["join"]}},
    ]
    got = {
        r["id"]: r["score"]
        for r in search_dsl(
            docs, {"dis_max": {"queries": legs, "tie_breaker": 0.3}}, 5
        ).collect()
    }
    l1 = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, _q(spark, ["table"])).collect()
    }
    adm = {1, 4}                    # spark present, join absent
    l2 = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, _q(spark, ["spark"])).collect()
        if r["id"] in adm
    }
    for did in set(l1) | set(l2):
        scores = [s for s in (l1.get(did), l2.get(did)) if s is not None]
        want = max(scores) + 0.3 * (sum(scores) - max(scores))
        assert got[did] == pytest.approx(want, abs=2e-6), did
    # tie_breaker=0: pure max
    got0 = {
        r["id"]: r["score"]
        for r in search_dsl(
            docs, {"dis_max": {"queries": legs, "tie_breaker": 0.0}}, 5
        ).collect()
    }
    for did in got0:
        scores = [s for s in (l1.get(did), l2.get(did)) if s is not None]
        assert got0[did] == pytest.approx(max(scores), abs=2e-6)
    with pytest.raises(ValueError, match="tie_breaker"):
        search_dsl(docs, {"dis_max": {"queries": legs, "tie_breaker": 2}}, 5)
    with pytest.raises(ValueError, match="non-empty"):
        search_dsl(docs, {"dis_max": {"queries": []}}, 5)


def test_collapse_one_best_hit_per_group(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )
    from distributed_vector_search_system_spark.operators.collapse import (
        collapse_topk,
    )
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_scores,
    )

    rows = [
        (1, "spark spark merge", "a"), (2, "spark", "a"),
        (3, "spark table", "b"), (4, "spark spark spark", "b"),
        (5, "other", "c"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = search_request(
        d,
        {"query": {"match": {"terms": ["spark"]}},
         "size": 3, "collapse": {"field": "src"}},
    )["hits"]
    assert out.columns == ["query_id", "id", "group", "score", "rank"]
    # equivalence with the oracled collapse operator over the full
    # scored set (small here, so its broadcast contract holds)
    scored = bm25_scores(d, _q(spark, ["spark"])).withColumn(
        "score", F.round("score", 6)
    )
    want = collapse_topk(scored, d, "src", 3)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, want.collect())
    )
    groups = [r["group"] for r in out.collect()]
    assert len(groups) == len(set(groups)) == 2      # one per group a/b
    with pytest.raises(ValueError, match="relevance page only"):
        search_request(
            d,
            {"query": {"match": {"terms": ["spark"]}},
             "collapse": {"field": "src"}, "sort": [{"doc_id": "asc"}]},
        )


def test_collapse_with_post_filter_and_per_group(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [
        (1, "spark spark merge", "a"), (2, "spark", "a"),
        (3, "spark table", "b"), (4, "spark spark spark", "b"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = search_request(
        d,
        {"query": {"match": {"terms": ["spark"]}}, "size": 4,
         "collapse": {"field": "src", "per_group": 2},
         "post_filter": {"bool": {"must": ["spark"],
                                  "must_not": ["table"]}}},
    )["hits"]
    ids = {r["id"] for r in out.collect()}
    assert ids == {1, 2, 4}          # doc 3 post-filtered; 2 per group


# -- round 13 addendum: terms clause, ids node, filter/global/metric aggs ----


def test_terms_filter_clause_in_list(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"bool": {
            "must": ["spark"],
            "filter": [{"terms": {"pop": [100, 250]}}]}},
         "size": 5},
    )["hits"]
    assert {r["id"] for r in out.collect()} == {1, 4}
    with pytest.raises(ValueError, match="non-empty value list"):
        search_request(
            docs,
            {"query": {"bool": {"must": ["spark"],
                                "filter": [{"terms": {"pop": []}}]}}},
        )


def test_terms_clause_in_knn_filter(spark, docs, lvectors):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    req = {
        "query": {"match": {"terms": ["filter"]}},
        "size": 5,
        "knn": {"query_vector": [1.0, 1.0], "k": 2, "boost": 2.0,
                "filter": [{"terms": {"label": [0]}}]},
    }
    got = {
        r["id"]
        for r in search_request(docs, req, vectors=lvectors)["hits"].collect()
    }
    assert got == {2, 3, 4, 5}       # same as the term-clause test


def test_ids_query_node(spark, docs):
    got = search_dsl(docs, {"ids": {"values": [4, 2, 99]}}, 5)
    rows = [(r["id"], r["score"], r["rank"]) for r in got.collect()]
    assert sorted(rows) == [(2, 1.0, 1), (4, 1.0, 2)]   # 99 absent, id order
    with pytest.raises(ValueError, match="non-empty 'values'"):
        search_dsl(docs, {"ids": {"values": []}}, 5)


def test_filter_global_and_metric_aggs(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},     # docs 1, 2, 4
         "aggs": {
             "big": {"filter": [{"range": {"pop": {"gte": 200}}}],
                     "aggs": {"avg_pop": {"avg": {"field": "pop"}}}},
             "corpus": {"global": {},
                        "aggs": {"avg_pop": {"avg": {"field": "pop"}}}},
             "mean_pop": {"avg": {"field": "pop"}},
             "n_pop": {"value_count": {"field": "pop"}},
         }},
    )["aggregations"]
    big = out["big"].collect()[0]
    assert big["n"] == 2 and big["avg_pop"] == 325.0    # docs 2, 4
    corpus = out["corpus"].collect()[0]
    assert corpus["n"] == 5 and corpus["avg_pop"] == 340.0
    assert out["mean_pop"].columns == ["value"]
    assert out["mean_pop"].collect()[0]["value"] == 250.0
    assert out["n_pop"].collect()[0]["value"] == 3


# -- round 13 addendum: min_score / explain / suggest ------------------------


def test_min_score_floors_page_and_total(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    base = {"query": {"match": {"terms": ["spark", "table"]}}, "size": 5,
            "track_total_hits": True}
    plain = search_request(docs, base)
    scores = sorted(
        (r["score"] for r in plain["hits"].collect()), reverse=True
    )
    assert len(scores) >= 3
    cut = scores[1]                              # keep the top two
    floored = search_request(docs, {**base, "min_score": cut})
    kept = [(r["rank"], r["score"]) for r in floored["hits"].collect()]
    assert len(kept) == 2
    assert sorted(r for r, _ in kept) == [1, 2]  # contiguous prefix ranks
    assert all(s >= cut for _, s in kept)
    assert plain["total_hits"].collect()[0][0] == len(scores)
    assert floored["total_hits"].collect()[0][0] == 2
    with pytest.raises(ValueError, match="field sort"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "sort": [{"pop": "asc"}], "min_score": 1.0},
        )


def test_explain_decomposes_page_scores(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    out = search_request(
        docs,
        {"query": {"bool": {"must": ["spark"], "should": ["table"]}},
         "size": 3, "explain": True},
    )
    hits = {r["id"]: r["score"] for r in out["hits"].collect()}
    expl = {}
    for r in out["explanation"].collect():
        expl.setdefault(r["id"], 0.0)
        expl[r["id"]] += r["weight"]
    assert set(expl) == set(hits)
    for did, s in hits.items():
        assert expl[did] == pytest.approx(s, abs=1e-5), did
    with pytest.raises(ValueError, match="match-set query node"):
        search_request(
            docs,
            {"query": {"fuzzy": {"terms": ["sparkk"]}}, "explain": True},
        )


def test_suggest_term_suggester(spark, docs):
    from distributed_vector_search_system_spark.operators.fuzzy import (
        corpus_vocabulary,
    )
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )
    from distributed_vector_search_system_spark.operators.spell import (
        spell_suggestions,
    )

    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "suggest": {"fix": {"text": "sperk tabel",
                             "term": {"max_edits": 2, "size": 2}}}},
    )
    got = out["suggest"]["fix"]
    q = spark.createDataFrame(
        [(0, ["sperk", "tabel"])], "query_id long, qterms array<string>"
    )
    want = spell_suggestions(
        corpus_vocabulary(docs), q, max_edits=2, top_n=2
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    sugg = {(r["source_term"], r["suggestion"]) for r in got.collect()}
    assert ("sperk", "spark") in sugg and ("tabel", "table") in sugg
    with pytest.raises(ValueError, match="term"):
        search_request(
            docs,
            {"query": {"match": {"terms": ["spark"]}},
             "suggest": {"p": {"text": "x", "phrase": {}}}},
        )


# -- round 13 addendum: boxplot / weighted_avg / percentile_ranks / sampler --


def test_boxplot_weighted_avg_percentile_ranks(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [(i, "x", float(i), float(i % 3 + 1)) for i in range(1, 9)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, v double, w double"
    )
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {
             "box": {"boxplot": {"field": "v"}},
             "wavg": {"weighted_avg": {"value": {"field": "v"},
                                       "weight": {"field": "w"}}},
             "ranks": {"percentile_ranks": {"field": "v",
                                            "values": [2.0, 6.5]}},
         }},
    )["aggregations"]
    box = out["box"].collect()[0]
    # v = 1..8: q1 = 2.75, q2 = 4.5, q3 = 6.25 (linear interpolation)
    assert (box["min_v"], box["q1"], box["q2"], box["q3"], box["max_v"]) \
        == (1.0, 2.75, 4.5, 6.25, 8.0)
    wavg = out["wavg"].collect()[0]["value"]
    vals = [(float(i), float(i % 3 + 1)) for i in range(1, 9)]
    want = round(sum(v * w for v, w in vals) / sum(w for _, w in vals), 6)
    assert wavg == pytest.approx(want, abs=1e-6)
    ranks = out["ranks"].collect()[0]
    assert ranks["r2"] == 25.0                  # 2 of 8 values <= 2.0
    assert ranks["r6_5"] == 75.0                # 6 of 8 values <= 6.5


def test_sampler_agg_top_scored_only(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    # "spark" scores: doc 2 (spark spark join, short) ranks best, then
    # 1, then 4 — a sampler of 2 must aggregate docs {2, 1} only
    out = search_request(
        docs,
        {"query": {"match": {"terms": ["spark"]}},
         "aggs": {
             "best": {"sampler": {"shard_size": 2},
                      "aggs": {"max_pop": {"max": {"field": "pop"}}}},
             "all": {"max": {"field": "pop"}},
         }},
    )["aggregations"]
    hits = search_dsl(docs, {"match": {"terms": ["spark"]}}, 5)
    top2 = {r["id"] for r in hits.filter(F.col("rank") <= 2).collect()}
    best = out["best"].collect()[0]
    assert best["n"] == 2
    pops = {1: 100.0, 2: 400.0, 4: 250.0}
    assert best["max_pop"] == max(pops[i] for i in top2)
    assert out["all"].collect()[0]["value"] == 400.0
    with pytest.raises(ValueError, match="match-set query node"):
        search_request(
            docs,
            {"query": {"constant_score": {
                "filter": {"match": {"terms": ["spark"]}}}},
             "aggs": {"s": {"sampler": {"shard_size": 2}}}},
        )


def test_msearch_per_request_from(spark, docs):
    from distributed_vector_search_system_spark.operators.querydsl import (
        msearch,
    )

    full = msearch(
        docs, [{"query": {"match": {"terms": ["spark", "table"]}},
                "size": 10}]
    )["hits"]
    want = [
        (r["rank"], r["id"])
        for r in full.collect()
        if 2 < r["rank"] <= 4
    ]
    page2 = msearch(
        docs,
        [{"query": {"match": {"terms": ["spark", "table"]}},
          "from": 2, "size": 2}],
    )["hits"]
    got = sorted((r["rank"], r["id"]) for r in page2.collect())
    assert got == sorted(want) and len(got) == 2
    with pytest.raises(ValueError, match="from must be"):
        msearch(docs, [{"query": {"match": {"terms": ["a"]}}, "from": -1}])


# -- round 13 addendum: more_like_this node, multi_terms, pipeline aggs ------


def test_more_like_this_node_delegates(spark, docs):
    from distributed_vector_search_system_spark.operators.mlt import (
        bm25_mlt_topk,
    )

    got = search_dsl(
        docs,
        {"more_like_this": {"like_ids": [1], "max_query_terms": 5}},
        3,
    )
    seeds = spark.createDataFrame([(1,)], "seed_id long")
    want = bm25_mlt_topk(docs, seeds, 3, max_query_terms=5)
    assert sorted((r["id"], r["rank"]) for r in got.collect()) == sorted(
        (r["id"], r["rank"]) for r in want.collect()
    )
    assert all(r["query_id"] == 0 for r in got.collect())
    assert 1 not in {r["id"] for r in got.collect()}   # seed excluded
    with pytest.raises(ValueError, match="exactly one like id"):
        search_dsl(docs, {"more_like_this": {"like_ids": [1, 2]}}, 3)


def test_multi_terms_agg(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [(1, "x", "a", "p"), (2, "x", "a", "p"), (3, "x", "a", "q"),
            (4, "x", "b", "p"), (5, "x", "b", "p"), (6, "x", "b", "p")]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, s string, l string"
    )
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {"sl": {"multi_terms": {
             "terms": [{"field": "s"}, {"field": "l"}], "size": 2}}}},
    )["aggregations"]["sl"]
    got = [(r["s"], r["l"], r["n"]) for r in out.collect()]
    assert sorted(got, key=lambda t: (-t[2], t[0], t[1])) == [
        ("b", "p", 3), ("a", "p", 2)
    ]
    with pytest.raises(ValueError, match="at least two fields"):
        search_request(
            d,
            {"query": {"match": {"terms": ["x"]}},
             "aggs": {"sl": {"multi_terms": {"terms": [{"field": "s"}]}}}},
        )


def test_histogram_pipeline_aggs(spark):
    from distributed_vector_search_system_spark.operators.querydsl import (
        search_request,
    )

    rows = [(i, "x", v) for i, v in enumerate([5, 15, 15, 25, 25, 25])]
    d = spark.createDataFrame(rows, "doc_id long, text string, v long")
    out = search_request(
        d,
        {"query": {"match": {"terms": ["x"]}},
         "aggs": {"h": {"histogram": {"field": "v", "interval": 10.0},
                        "pipeline": {"window": 2}}}},
    )["aggregations"]["h"]
    got = {r["bucket"]: (r["count"], r["cum_sum"], r["deriv"],
                         r["moving_avg"]) for r in out.collect()}
    assert got[0.0] == (1, 1.0, None, 1.0)
    assert got[10.0] == (2, 3.0, 1.0, 1.5)
    assert got[20.0] == (3, 6.0, 1.0, 2.5)
    with pytest.raises(ValueError, match="histogram / date_histogram"):
        search_request(
            d,
            {"query": {"match": {"terms": ["x"]}},
             "aggs": {"t": {"terms": {"field": "v"},
                            "pipeline": {"window": 2}}}},
        )
