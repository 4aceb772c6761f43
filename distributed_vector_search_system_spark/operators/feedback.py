"""Pseudo-relevance feedback (Rocchio / RM3-style query expansion),
round 10 — the third query-understanding verb: reshape the QUERY from
the corpus' own evidence instead of the user's literal terms.

Classic two-pass plan (Rocchio 1971; RM3 as the modern LM form):

1. first pass — rank with BM25, keep the top ``fb_docs`` per query as
   the pseudo-relevant set;
2. expansion — score every term of the pseudo-relevant docs by its
   mean learned-sparse weight over that set (the Rocchio centroid in
   tf–idf space; ``operators.sparse.sparse_encode`` weights, so the
   expansion space and the second-pass scorer share one convention),
   keep the top ``fb_terms`` NEW terms per query (original terms are
   handled by the α channel, not re-selected);
3. second pass — weighted dot-product retrieval with the expanded
   query: original terms at weight α·(query-side sublinear tf),
   expansion terms at β·centroid-weight — ``sparse_topk`` over the
   encoded corpus.

Spark-first shape: pass 1 is the unmodified BM25 plan (k-bounded
output); the expansion aggregate touches only the pseudo-relevant
docs' postings (semi-join on the fb hit list — fb_docs·|queries|
rows, broadcastable); pass 2 is the unmodified sparse plan whose
query side grew by ``fb_terms`` rows per query.  No new shuffle shape
anywhere — the operator is pure composition, which is also why it is
exactly SQL-replayable (selection ranks on 6-decimal rounded weights,
the repo convention for summed-double ordering).

At serving scale both passes read the SAME persisted indexes the
plain tiers use (posting index for pass 1, sparse index for pass 2);
the from-scratch form here exists to carry the oracle, like
``bm25_topk`` vs ``bm25_index_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .retrieval import _score_ranked, bm25_topk
from .sparse import sparse_encode, sparse_scores


def prf_expansion_terms(
    doc_postings: DataFrame,
    fb_hits: DataFrame,
    queries: DataFrame,
    *,
    fb_terms: int = 5,
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """Top expansion terms per query from the pseudo-relevant set.

    ``doc_postings``: encoded ``(id, term, weight)``; ``fb_hits``:
    pass-1 ``(query_id, id)`` (already k-bounded).  Scores each term
    by its MEAN weight over the query's feedback docs (absent = 0,
    i.e. sum / fb-set size), drops the query's original terms, keeps
    the per-query top ``fb_terms`` by (rounded weight desc, term asc).
    Returns ``(query_id, term, fb_weight)``.
    """
    if fb_terms < 1:
        raise ValueError("fb_terms must be >= 1")
    fb = fb_hits.select("query_id", "id")
    fb_sizes = fb.groupBy("query_id").agg(F.count("*").alias("_nfb"))
    # fb is fb_docs·|queries| rows by contract — BROADCAST it so the
    # corpus-sized posting scan flows map-side through the join
    # deterministically (VERDICT r10 item 3) instead of relying on AQE
    # to demote a sort-merge join.
    summed = (
        doc_postings.join(F.broadcast(fb), "id")
        .groupBy("query_id", "term")
        .agg(F.sum("weight").alias("_w"))
        .join(F.broadcast(fb_sizes), "query_id")
        .select(
            "query_id", "term",
            F.round(F.col("_w") / F.col("_nfb"), 6).alias("fb_weight"),
        )
    )
    orig = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("term"),
    )
    fresh = summed.join(orig, ["query_id", "term"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("fb_weight").desc(), F.col("term").asc()
    )
    return (
        fresh.withColumn("_frn", F.row_number().over(w))
        .filter(F.col("_frn") <= fb_terms)
        .select("query_id", "term", "fb_weight")
    )


def bm25_prf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    fb_docs: int = 5,
    fb_terms: int = 5,
    alpha: float = 1.0,
    beta: float = 0.5,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """Two-pass pseudo-relevance-feedback retrieval —
    ``(query_id, id, score, rank)`` (see module docstring).

    Queries whose first pass matched nothing fall back to their
    original terms alone (expansion is empty, the α channel still
    scores) — a PRF query can never do worse than "no feedback" in
    coverage.
    """
    first = bm25_topk(
        docs, queries, fb_docs,
        doc_id_col=doc_id_col, text_col=text_col,
        query_id_col=query_id_col, query_terms_col=query_terms_col,
    ).select("query_id", "id")
    enc = sparse_encode(docs, doc_id_col=doc_id_col, text_col=text_col)
    expansion = prf_expansion_terms(
        enc, first, queries,
        fb_terms=fb_terms,
        query_id_col=query_id_col, query_terms_col=query_terms_col,
    )
    # α channel: the original query's sublinear-tf weights (distinct
    # terms of a short query → 1.0 each); β channel: centroid weights
    orig = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.col(query_terms_col)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(
            (
                F.lit(float(alpha))
                * (F.lit(1.0) + F.log(F.count("*").cast("double")))
            ).alias("weight")
        )
    )
    exp = expansion.select(
        "query_id", "term",
        (F.lit(float(beta)) * F.col("fb_weight")).alias("weight"),
    )
    # zero-weight terms contribute nothing to any score but would
    # still ADMIT documents sharing only them (score-0 hits) — drop
    # them so β=0 degrades exactly to the α-only query
    qp = (
        orig.unionByName(exp)
        .groupBy("query_id", "term")
        .agg(F.sum("weight").alias("weight"))
        .filter(F.col("weight") != 0.0)
    )
    return _score_ranked(sparse_scores(enc, qp), k, "score")
