"""Offline ranking evaluation (``rank_eval``), round 10.

A retrieval stack is tuned by MEASURING it: given graded relevance
judgments (qrels — TREC's format, ES's ``_rank_eval`` endpoint), score
any ranked result set with the standard offline metrics.  This is the
operator the repo's own recall curves (binary / champion / Matryoshka
sizing rules) hand-rolled per-tier; here it is first-class, over any
leg that emits the repo's ``(query_id, id, rank)`` shape.

Metrics (per query, all @k over the ranked page):

- ``ndcg``      — DCG@k / ideal-DCG@k with the exponential gain
  ``(2^rel − 1)/log2(i+1)`` (the TREC/ES convention); 0.0 when the
  query has no relevant docs (IDCG 0).
- ``mrr``       — 1 / rank of the first relevant hit, 0.0 when none.
- ``precision`` — relevant-in-page / k (the FIXED k denominator, so
  a short result list is penalized — the standard contract).
- ``recall``    — relevant-in-page / total relevant, 0.0 when the
  query has no relevant docs.

Deterministic arithmetic on joined frames → exactly SQL-replayable.

Scale: results are k-bounded per query and qrels are eval-set-sized
by contract (thousands of judged pairs — TREC tracks judge hundreds
of queries × pool depth) — both broadcast; every aggregate keys on
query_id over k-bounded rows.  The only frame that could be large is
the results of MANY queries at once, and the plan is one broadcast
join + two hash aggregates over it — embarrassingly parallel in
query_id.  Evaluating a 100 TB corpus's retrieval quality costs the
RETRIEVAL, never the scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    *,
    query_id_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query metrics — ``(query_id, ndcg, mrr, precision,
    recall)``, one row per query PRESENT IN QRELS (unjudged queries
    have no defined metrics; judged queries missing from ``results``
    score 0 across the board).  ``qrels`` carries graded relevance
    ``(query_id, id, rel)`` with ``rel > 0`` meaning relevant;
    result docs absent from qrels count as rel 0 (the pooling
    convention)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    res = results.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rank_col).alias("_rnk"),
    ).filter(F.col("_rnk") <= k)
    qr = qrels.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    # page gains: result rows with their judged gain (absent -> 0)
    page = res.join(F.broadcast(qr), ["query_id", "id"], "left").select(
        "query_id",
        "_rnk",
        F.coalesce(F.col("_rel"), F.lit(0.0)).alias("_rel"),
    )
    got = page.groupBy("query_id").agg(
        F.sum(
            (F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0))
            / F.log2(F.col("_rnk") + F.lit(1.0))
        ).alias("_dcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rnk"))).alias("_first"),
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0)).alias("_hits"),
    )
    # ideal DCG: each query's top-k judgments by (rel desc, id asc)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_rel").desc(), F.col("id").asc()
    )
    ideal = (
        qr.filter(F.col("_rel") > 0)
        .withColumn("_irnk", F.row_number().over(w))
        .filter(F.col("_irnk") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0))
                / F.log2(F.col("_irnk") + F.lit(1.0))
            ).alias("_idcg")
        )
    )
    n_rel = (
        qr.filter(F.col("_rel") > 0)
        .groupBy("query_id")
        .agg(F.count("*").alias("_nrel"))
    )
    judged = qr.select("query_id").distinct()
    out = (
        judged.join(got, "query_id", "left")
        .join(ideal, "query_id", "left")
        .join(n_rel, "query_id", "left")
    )
    z = F.lit(0.0)
    return out.select(
        "query_id",
        F.round(
            F.when(
                F.col("_idcg").isNotNull() & (F.col("_idcg") > 0),
                F.coalesce(F.col("_dcg"), z) / F.col("_idcg"),
            ).otherwise(z),
            6,
        ).alias("ndcg"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("_first"), z), 6
        ).alias("mrr"),
        F.round(
            F.coalesce(F.col("_hits"), F.lit(0)) / F.lit(float(k)), 6
        ).alias("precision"),
        F.round(
            F.when(
                F.col("_nrel").isNotNull(),
                F.coalesce(F.col("_hits"), F.lit(0)) / F.col("_nrel"),
            ).otherwise(z),
            6,
        ).alias("recall"),
    )


def mean_rank_eval(per_query: DataFrame) -> DataFrame:
    """Macro-averaged summary of :func:`rank_eval` output — one row
    ``(n_queries, ndcg, mrr, precision, recall)`` (every judged query
    weighs equally, the TREC convention)."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
    )
