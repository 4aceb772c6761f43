"""Offline ranking evaluation (operators/rank_eval.py): hand-computed
metric values, edge semantics, macro averaging.  Exactness vs DuckDB
is the ``bm25_rank_eval`` row in test_oracle_parity."""

from __future__ import annotations

import math

import pytest

from distributed_vector_search_system_spark.operators.rank_eval import (
    mean_rank_eval,
    rank_eval,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, "query_id long, id long, rank int")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id long, id long, rel double")


def test_hand_computed_metrics(spark):
    # query 0: ranked [1, 2, 3]; judged: 1->2 (rank 1), 3->1 (rank 3),
    # 9->3 (missed)
    res = _results(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    qr = _qrels(spark, [(0, 1, 2.0), (0, 3, 1.0), (0, 9, 3.0)])
    row = rank_eval(res, qr, 3).collect()[0]
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (
        (2**3 - 1) / math.log2(2)
        + (2**2 - 1) / math.log2(3)
        + (2**1 - 1) / math.log2(4)
    )
    assert row["ndcg"] == pytest.approx(round(dcg / idcg, 6))
    assert row["mrr"] == pytest.approx(1.0)
    assert row["precision"] == pytest.approx(round(2 / 3, 6))
    assert row["recall"] == pytest.approx(round(2 / 3, 6))


def test_first_relevant_not_at_rank_one(spark):
    res = _results(spark, [(0, 5, 1), (0, 6, 2), (0, 7, 3)])
    qr = _qrels(spark, [(0, 7, 1.0)])
    row = rank_eval(res, qr, 3).collect()[0]
    assert row["mrr"] == pytest.approx(round(1 / 3, 6))


def test_judged_query_missing_from_results_scores_zero(spark):
    res = _results(spark, [(0, 1, 1)])
    qr = _qrels(spark, [(0, 1, 1.0), (5, 2, 2.0)])
    rows = {r["query_id"]: r for r in rank_eval(res, qr, 3).collect()}
    assert set(rows) == {0, 5}   # one row per JUDGED query
    z = rows[5]
    assert (z["ndcg"], z["mrr"], z["precision"], z["recall"]) == (0, 0, 0, 0)


def test_no_relevant_docs_defines_zero_not_null(spark):
    res = _results(spark, [(0, 1, 1)])
    qr = _qrels(spark, [(0, 9, 0.0)])   # judged but nothing relevant
    row = rank_eval(res, qr, 3).collect()[0]
    assert (row["ndcg"], row["mrr"], row["recall"]) == (0, 0, 0)


def test_rank_cut_applies(spark):
    # the relevant doc sits at rank 4: invisible at k=3
    res = _results(spark, [(0, i, i) for i in range(1, 5)])
    qr = _qrels(spark, [(0, 4, 2.0)])
    row = rank_eval(res, qr, 3).collect()[0]
    assert row["ndcg"] == 0 and row["precision"] == 0
    row4 = rank_eval(res, qr, 4).collect()[0]
    assert row4["ndcg"] > 0


def test_perfect_ranking_scores_one(spark):
    res = _results(spark, [(0, 1, 1), (0, 2, 2)])
    qr = _qrels(spark, [(0, 1, 2.0), (0, 2, 1.0)])
    row = rank_eval(res, qr, 2).collect()[0]
    assert row["ndcg"] == pytest.approx(1.0)
    assert row["precision"] == pytest.approx(1.0)
    assert row["recall"] == pytest.approx(1.0)


def test_mean_rank_eval_macro_averages(spark):
    res = _results(spark, [(0, 1, 1), (1, 2, 1)])
    qr = _qrels(spark, [(0, 1, 1.0), (1, 9, 1.0)])
    m = mean_rank_eval(rank_eval(res, qr, 1)).collect()[0]
    assert m["n_queries"] == 2
    assert m["precision"] == pytest.approx(0.5)   # (1.0 + 0.0) / 2
    assert m["mrr"] == pytest.approx(0.5)


def test_validation(spark):
    res = _results(spark, [(0, 1, 1)])
    with pytest.raises(ValueError):
        rank_eval(res, res, 0)
