"""Field collapsing (operators/collapse.py): best-per-group selection,
per_group > 1, the null-group bucket, re-rank determinism, validation.
Oracle parity of the registry row runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest

from distributed_vector_search_system_spark.operators.collapse import (
    collapse_topk,
)


def _docs(spark):
    rows = [
        (1, "web"), (2, "web"), (3, "news"), (4, None), (5, "news"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string")


def _hits(spark):
    rows = [
        (0, 1, 9.0), (0, 2, 8.0), (0, 3, 7.0), (0, 4, 6.0), (0, 5, 7.0),
        (1, 2, 5.0), (1, 1, 5.0),
    ]
    return spark.createDataFrame(rows, "query_id long, id long, score double")


def test_collapse_best_per_group_and_rerank(spark):
    got = [
        (r["query_id"], r["id"], r["group"], r["rank"])
        for r in collapse_topk(_hits(spark), _docs(spark), "source", 10)
        .orderBy("query_id", "rank").collect()
    ]
    # q0: web→1 (9.0 beats 2), news→3 (7.0 ties 5, id asc), null→4
    # q1: score tie 5.0 breaks by id → web keeps 1
    assert got == [
        (0, 1, "web", 1), (0, 3, "news", 2), (0, 4, "null", 3),
        (1, 1, "web", 1),
    ]


def test_per_group_two_keeps_runner_up(spark):
    got = [
        (r["id"], r["group"], r["rank"])
        for r in collapse_topk(
            _hits(spark).filter("query_id = 0"), _docs(spark), "source", 10,
            per_group=2,
        ).orderBy("rank").collect()
    ]
    assert got == [
        (1, "web", 1), (2, "web", 2), (3, "news", 3), (5, "news", 4),
        (4, "null", 5),
    ]


def test_k_cut_and_validation(spark):
    out = collapse_topk(_hits(spark), _docs(spark), "source", 1)
    assert {(r["query_id"], r["id"]) for r in out.collect()} == {(0, 1), (1, 1)}
    with pytest.raises(ValueError):
        collapse_topk(_hits(spark), _docs(spark), "source", 0)
    with pytest.raises(ValueError):
        collapse_topk(_hits(spark), _docs(spark), "source", 5, per_group=0)


def test_plan_broadcasts_never_sort_merges(spark, sf_smoke):
    """VERDICT r10 item 3: the attribute join must stay broadcast-
    shaped — corpus-side attrs semi-restricted by the broadcast hit
    ids, surviving sliver broadcast into the equi join (the scoring.py
    discipline) — never a sort-merge join or cartesian product."""
    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk, queries_from_docs,
    )
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7)
    hits = bm25_topk(docs, q, 10).select("query_id", "id", "score")
    out = collapse_topk(hits, docs, "lang", 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
