"""search_after pagination (operators/pagination.py): page chaining,
cursor semantics, short result sets, cross-leg portability.
Exactness vs DuckDB is the ``bm25_page2`` row in test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.pagination import (
    page_cursor,
    search_after,
)
from distributed_vector_search_system_spark.operators.retrieval import (
    _score_ranked,
)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        (0, i, float(100 - i)) for i in range(1, 13)
    ] + [(1, i, 5.0) for i in range(1, 8)]   # query 1: all ties
    return spark.createDataFrame(rows, "query_id long, id long, score double")


def _page(df):
    return [
        (r["query_id"], r["id"], r["rank"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_walk_pages_covers_everything_once(spark, scored):
    p1 = _score_ranked(scored, 5, "score")
    p2 = search_after(scored, page_cursor(p1), 5)
    p3 = search_after(scored, page_cursor(p2), 5)
    seen = [
        (r["query_id"], r["id"])
        for p in (p1, p2, p3)
        for r in p.collect()
    ]
    assert len(seen) == len(set(seen))            # no row served twice
    assert len(seen) == 12 + 7                    # every row served once
    # within-page ranks restart
    assert {r["rank"] for r in p2.collect()} <= {1, 2, 3, 4, 5}


def test_tie_pages_advance_by_id(spark, scored):
    ties = scored.filter(F.col("query_id") == 1)
    p1 = _score_ranked(ties, 3, "score")
    p2 = search_after(ties, page_cursor(p1), 3)
    assert _page(p2) == [(1, 4, 1), (1, 5, 2), (1, 6, 3)]


def test_missing_cursor_serves_first_page(spark, scored):
    empty = spark.createDataFrame(
        [], "query_id long, after_score double, after_id long"
    )
    got = search_after(scored, empty, 5)
    assert _page(got) == _page(_score_ranked(scored, 5, "score"))


def test_page2_equals_skipped_topk(spark, scored):
    """search_after page 2 == rows 6..10 of a k=10 ranking."""
    p1 = _score_ranked(scored, 5, "score")
    p2 = search_after(scored, page_cursor(p1), 5)
    top10 = _score_ranked(scored, 10, "score").filter(F.col("rank") > 5)
    assert [
        (r["query_id"], r["id"]) for r in p2.orderBy("query_id", "rank").collect()
    ] == [
        (r["query_id"], r["id"]) for r in top10.orderBy("query_id", "rank").collect()
    ]


def test_exhausted_queries_return_no_rows(spark, scored):
    short = scored.filter(
        (F.col("query_id") == 0) & (F.col("id") <= 3)
    )
    p1 = _score_ranked(short, 5, "score")   # only 3 rows exist
    p2 = search_after(short, page_cursor(p1), 5)
    assert p2.count() == 0


def test_cursor_portable_across_legs(spark, sf_smoke):
    """The cursor keys on the repo's shared (rounded score, id) order,
    so a cursor captured from bm25_topk resumes bm25_scores exactly."""
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_scores, bm25_topk, queries_from_docs,
    )
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7)
    p1 = bm25_topk(docs, q, 5)
    p2 = search_after(bm25_scores(docs, q), page_cursor(p1), 5)
    both = p1.select("query_id", "id").intersect(p2.select("query_id", "id"))
    assert both.count() == 0
    assert p2.count() > 0


def test_empty_page_carries_cursor_forward(spark, scored):
    """ADVICE r10: an exhausted query's empty page yields no cursor
    row, and a cursor-absent query gets its FIRST page — so a naive
    walk loop would re-serve page 1 forever.  Passing the previous
    cursors to page_cursor carries exhausted queries' cursors forward
    and their pages stay empty."""
    short = scored.filter((F.col("query_id") == 0) & (F.col("id") <= 3))
    p1 = _score_ranked(short, 5, "score")
    c1 = page_cursor(p1)
    p2 = search_after(short, c1, 5)
    assert p2.count() == 0
    c2 = page_cursor(p2, prev=c1)
    # the carried cursor is the previous one, verbatim
    assert sorted(map(tuple, c2.collect())) == sorted(map(tuple, c1.collect()))
    p3 = search_after(short, c2, 5)
    assert p3.count() == 0              # stays exhausted, no wraparound


def test_carried_cursor_only_fills_empty_queries(spark, scored):
    """Queries that DID get rows advance their cursor; only empty ones
    carry the old cursor."""
    p1 = _score_ranked(scored, 5, "score")
    c1 = page_cursor(p1)
    p2 = search_after(scored, c1, 5)            # q0: rows 6-10, q1: 6-7
    c2 = page_cursor(p2, prev=c1)
    by_q = {r["query_id"]: r["after_id"] for r in c2.collect()}
    assert by_q[0] == 10 and by_q[1] == 7       # both advanced
    p3 = search_after(scored, c2, 5)            # q0: 11-12, q1 exhausted
    c3 = page_cursor(p3, prev=c2)
    by_q3 = {r["query_id"]: r["after_id"] for r in c3.collect()}
    assert by_q3[0] == 12                        # advanced
    assert by_q3[1] == 7                         # carried forward
    assert search_after(scored, c3, 5).count() == 0
