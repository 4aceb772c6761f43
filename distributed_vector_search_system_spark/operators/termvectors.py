"""Term vectors (ES ``_termvectors``), round 11: per-document term
statistics — term frequency, 0-based positions, and corpus document
frequency — for a requested id set.

Reference parity note: the reference exposes no text statistics at
all (vector-only service, ``src/rpc/search_service_impl.cc``); this
is the introspection verb search users reach for when a ranking
surprises them ("what does the engine THINK is in this doc"), and the
building block for client-side MoreLikeThis / highlighting /
relevance debugging.

Spark-first shape: the requested ids are an RPC-sized frame by
contract — they BROADCAST into a left-semi restriction of the corpus
scan, so tokenize + posexplode run over the requested docs only.
The corpus-level df aggregate is the one corpus-sized pass and it is
(a) semi-restricted to the requested docs' terms BEFORE the distinct
count (the ``bm25_scores`` discipline), (b) a projection of the
posting index's stored term stats at serving scale — pass
``df_source=`` to serve it from any ``(term, df)`` frame (e.g.
``fuzzy.corpus_vocabulary`` persisted beside the index) and skip the
corpus pass entirely.

Positions are serialized to a comma-joined string (the repo's
array-output convention — the driver's canonicalizer cannot hash
array cells).  Deterministic → exact SQL replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def term_vectors(
    docs: DataFrame,
    doc_ids: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    id_col: str = "id",
    df_source: DataFrame | None = None,
) -> DataFrame:
    """Per-(doc, term) stats for the requested ids —
    ``(doc_id, term, tf, positions, df)`` with ``positions`` the
    0-based token offsets comma-joined in order.  Ids absent from the
    corpus (or tokenizing to nothing) emit no rows, the ES behavior.

    ``df_source``: optional ``(term, df)`` frame replacing the corpus
    df pass (the persisted-index path).
    """
    ids = doc_ids.select(F.col(id_col).alias("_rid")).distinct()
    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).join(F.broadcast(ids), F.col("doc_id") == F.col("_rid"), "left_semi")
    pos = toks.select(
        "doc_id", F.posexplode("_toks").alias("pos", "term")
    )
    tv = pos.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("pos")),
                lambda p: p.cast("string"),
            ),
            ",",
        ).alias("positions"),
    )
    if df_source is None:
        df_source = (
            docs.select(
                F.col(doc_id_col).alias("_did"),
                F.explode(tokens(text_col)).alias("term"),
            )
            .join(
                F.broadcast(tv.select("term").distinct()),
                "term",
                "left_semi",
            )
            .groupBy("term")
            .agg(F.count_distinct("_did").alias("df"))
        )
    return tv.join(
        F.broadcast(df_source.select("term", "df")), "term", "left"
    ).select("doc_id", "term", "tf", "positions", "df")


def bm25_explain(
    docs: DataFrame,
    queries: DataFrame,
    pairs: DataFrame,
    *,
    k1: float | None = None,
    b: float | None = None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """ES ``_explain`` for BM25: the per-TERM score decomposition of
    requested (query, doc) pairs —
    ``(query_id, id, term, tf, df, dl, idf, weight)`` where ``weight``
    is the term's additive contribution: a pair's weights sum to its
    ranked score up to the per-term 6-decimal rounding (≤ 1e-6 per
    term — asserted in tests).  This is
    the relevance-debugging verb next to :func:`term_vectors`: "WHY
    does this doc score what it scores for this query".

    ``pairs``: the requested ``(query_id, id)`` frame — RPC-sized by
    contract (typically one row: the hit a user clicked "explain"
    on), broadcast into a semi-restriction of the scorer's plan.  The
    corpus-level stats (df / N / avgdl) are computed exactly as
    ``bm25_scores`` computes them, so the decomposition reproduces
    the ranked score exactly before rounding.
    """
    from .retrieval import BM25_B, BM25_K1

    k1 = BM25_K1 if k1 is None else k1
    b = BM25_B if b is None else b
    req = pairs.select(
        F.col(query_id_col).alias("query_id"), F.col("id")
    ).distinct()
    toks = docs.select(
        F.col(doc_id_col).alias("id"), tokens(text_col).alias("_toks")
    )
    stats = toks.agg(
        F.count("*").alias("_n_docs"),
        F.avg(F.size("_toks").cast("double")).alias("_avgdl"),
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("term"),
    ).join(F.broadcast(req.select("query_id").distinct()), "query_id", "left_semi")
    posting = (
        toks.join(F.broadcast(req.select("id").distinct()), "id", "left_semi")
        .select(
            "id", F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        .join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # df is CORPUS-level (restricted to the explained terms first —
    # the bm25_scores discipline), not requested-doc-level
    dfreq = (
        toks.select("id", F.explode("_toks").alias("term"))
        .join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count_distinct("id").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("_avgdl"))
    )
    return (
        posting.join(F.broadcast(qt), "term")
        .join(F.broadcast(req), ["query_id", "id"], "left_semi")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "id",
            "term",
            "tf",
            "df",
            "dl",
            F.round(idf, 6).alias("idf"),
            F.round(idf * tf_part, 6).alias("weight"),
        )
    )
