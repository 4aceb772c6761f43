"""Percolation (operators/percolate.py): match semantics, min_match
clamp, negative veto, the streaming sink, plan shape.  Exactness vs
DuckDB is the ``percolate_matches`` row in test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.percolate import (
    percolate,
    percolate_stream,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta"),
        (3, "gamma delta epsilon"),
        (4, "alpha epsilon zeta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stored(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, qterms array<string>, none_terms array<string>"
    )


def test_conjunctive_all_match(spark, corpus):
    stored = _stored(spark, [(10, ["alpha", "beta"], [])])
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(corpus, stored).collect()
    }
    assert got == {(1, 10), (2, 10)}


def test_min_match_threshold(spark, corpus):
    stored = _stored(spark, [(10, ["alpha", "beta", "epsilon"], [])])
    # all three: nobody qualifies
    assert percolate(corpus, stored).count() == 0
    got = {
        (r["doc_id"], r["query_id"], r["matched"], r["required"])
        for r in percolate(corpus, stored, min_match=2).collect()
    }
    assert got == {(1, 10, 2, 2), (2, 10, 2, 2), (4, 10, 2, 2)}


def test_min_match_clamps_to_term_count(spark, corpus):
    # threshold 5 > |terms| = 1: clamped, matching the single term wins
    stored = _stored(spark, [(11, ["zeta"], [])])
    got = {
        (r["doc_id"], r["required"])
        for r in percolate(corpus, stored, min_match=5).collect()
    }
    assert got == {(4, 1)}


def test_negative_term_vetoes(spark, corpus):
    stored = _stored(spark, [(12, ["alpha"], ["zeta"])])
    got = {
        r["doc_id"]
        for r in percolate(
            corpus, stored, none_terms_col="none_terms"
        ).collect()
    }
    assert got == {1, 2}   # doc 4 has alpha but is vetoed by zeta


def test_duplicate_terms_count_once(spark, corpus):
    stored = _stored(spark, [(13, ["alpha", "alpha", "beta"], [])])
    got = {
        (r["doc_id"], r["matched"], r["required"])
        for r in percolate(corpus, stored).collect()
    }
    # distinct terms = {alpha, beta}: required 2, matched counts distinct
    assert got == {(1, 2, 2), (2, 2, 2)}


def test_empty_positive_terms_match_nothing(spark, corpus):
    stored = _stored(spark, [(14, [], ["alpha"])])
    assert percolate(corpus, stored, none_terms_col="none_terms").count() == 0


def test_validation(spark, corpus):
    stored = _stored(spark, [(15, ["alpha"], [])])
    with pytest.raises(ValueError):
        percolate(corpus, stored, min_match=0)
    with pytest.raises(ValueError):
        percolate(corpus, stored, min_match="any")


def test_stream_appends_matches(spark, corpus, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    corpus.write.parquet(src)
    stored = _stored(spark, [(10, ["alpha", "beta"], [])])
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    qh = percolate_stream(stream, stored, out, checkpoint=ckpt)
    qh.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10), (2, 10)}


def test_plan_broadcasts_registry_never_self_joins(spark, sf_smoke):
    from distributed_vector_search_system_spark.functions.text import tokens
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    stored = docs.filter(F.col("doc_id") % 101 == 5).select(
        F.col("doc_id").alias("query_id"),
        F.slice(tokens("text"), 1, 4).alias("qterms"),
        F.slice(tokens("text"), 6, 1).alias("none_terms"),
    )
    out = percolate(docs, stored, min_match=2, none_terms_col="none_terms")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_percolate_scored_attaches_bm25_and_keeps_pairs(spark, corpus):
    from distributed_vector_search_system_spark.operators.percolate import (
        percolate_scored,
    )
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_scores,
    )
    from pyspark.sql import functions as F

    stored = _stored(spark, [(10, ["alpha", "beta"], []), (11, ["zeta"], [])])
    got = percolate_scored(corpus, stored)
    pairs = {(r["doc_id"], r["query_id"]) for r in got.collect()}
    assert pairs == {(1, 10), (2, 10), (4, 11)}
    # the score equals the unmodified BM25 of the stored query's terms
    q = stored.select("query_id", "qterms")
    ref = {
        (r["id"], r["query_id"]): round(r["score"], 6)
        for r in bm25_scores(corpus, q).collect()
    }
    for r in got.collect():
        assert r["score"] == ref[(r["doc_id"], r["query_id"])]
    # vetoed pairs stay out even though BM25 would score them
    stored_v = _stored(spark, [(12, ["alpha"], ["zeta"])])
    got_v = percolate_scored(
        corpus, stored_v, none_terms_col="none_terms"
    )
    assert {r["doc_id"] for r in got_v.collect()} == {1, 2}
    assert got_v.filter(F.col("score").isNull()).count() == 0
