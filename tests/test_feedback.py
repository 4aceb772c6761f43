"""Pseudo-relevance feedback (operators/feedback.py): expansion-term
selection (centroid weights, original-term exclusion, deterministic
cut), the beta=0 degeneration to a plain weighted first-principles
query, coverage fallback, validation.  Oracle parity of the registry
row runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.feedback import (
    bm25_prf_topk,
    prf_expansion_terms,
)
from distributed_vector_search_system_spark.operators.retrieval import (
    _score_ranked,
    bm25_topk,
)
from distributed_vector_search_system_spark.operators.sparse import (
    sparse_encode,
    sparse_scores,
)


def _docs(spark):
    rows = [
        (1, "solar panel efficiency report"),
        (2, "solar panel installation guide"),
        (3, "panel discussion transcript notes"),
        (4, "wind turbine efficiency report"),
        (5, "cooking recipes and kitchen tips"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(spark, terms, qid=0):
    return spark.createDataFrame(
        [(qid, list(terms))], "query_id long, qterms array<string>"
    )


def test_expansion_excludes_originals_and_ranks_centroid(spark):
    docs = _docs(spark)
    q = _q(spark, ["solar"])
    fb = bm25_topk(docs, q, 2).select("query_id", "id")  # docs 1, 2
    enc = sparse_encode(docs)
    got = prf_expansion_terms(enc, fb, q, fb_terms=3).collect()
    terms = {r["term"] for r in got}
    assert "solar" not in terms  # originals never re-selected
    assert "panel" in terms  # shared by both feedback docs
    # deterministic weights: mean over the fb set, rounded
    for r in got:
        assert r["fb_weight"] == round(r["fb_weight"], 6)
    with pytest.raises(ValueError):
        prf_expansion_terms(enc, fb, q, fb_terms=0)


def test_beta_zero_degenerates_to_alpha_query(spark):
    """With beta=0 the second pass scores the alpha-weighted original
    terms only — a pure weighted dot product, independently buildable."""
    docs = _docs(spark)
    q = _q(spark, ["solar", "efficiency"])
    got = sorted(map(tuple, bm25_prf_topk(
        docs, q, 5, fb_docs=2, fb_terms=3, alpha=1.0, beta=0.0
    ).collect()))
    enc = sparse_encode(docs)
    qp = spark.createDataFrame(
        [(0, "solar", 1.0), (0, "efficiency", 1.0)],
        "query_id long, term string, weight double",
    )
    want = sorted(map(tuple, _score_ranked(
        sparse_scores(enc, qp), 5, "score").collect()))
    assert got == want and got


def test_feedback_changes_ranking_toward_fb_vocabulary(spark):
    """The expanded query must surface a doc sharing NO original term
    but sharing the feedback docs' vocabulary (the point of PRF)."""
    docs = _docs(spark)
    q = _q(spark, ["solar"])
    plain_ids = {r["id"] for r in bm25_topk(docs, q, 5).collect()}
    assert 3 not in plain_ids  # "panel discussion" shares no query term
    prf_ids = {
        r["id"]
        for r in bm25_prf_topk(docs, q, 5, fb_docs=2, fb_terms=3).collect()
    }
    assert 3 in prf_ids


def test_no_match_query_stays_empty(spark):
    docs = _docs(spark)
    out = bm25_prf_topk(docs, _q(spark, ["zzzz"]), 5)
    assert out.count() == 0


def test_plan_broadcasts_never_sort_merges(spark, sf_smoke):
    """VERDICT r10 item 3: the feedback join must broadcast the
    fb_docs-by-queries hit frame into the corpus-sized posting scan —
    never a sort-merge join or cartesian product."""
    from distributed_vector_search_system_spark.operators.retrieval import (
        queries_from_docs,
    )
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7)
    out = bm25_prf_topk(docs, q, 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
