"""Fuzzy term matching: edit-distance query expansion over the corpus
vocabulary (round 10 — the query-understanding layer every serving
stack puts in front of ranked retrieval; Lucene's FuzzyQuery, typo
tolerance in every search UI).

A misspelled query term matches nothing in exact-term retrieval.  The
fix is vocabulary-side: expand each query term to the corpus terms
within ``max_edits`` Levenshtein edits, then rank with the EXISTING
scorer over the expanded term set — expansion composes with BM25 (or
any term-set leg) instead of forking it.

Spark-first shape, and why it scales:

- the corpus VOCABULARY (distinct terms + df) is the only thing
  scanned beyond the scorer's own plan — one distinct aggregate whose
  output is corpus-SUBLINEAR (vocabulary grows ~Heaps' law, |V| ≈
  k·n^0.5), reusable across queries;
- query terms are broadcast; ``levenshtein`` is evaluated MAP-SIDE on
  the vocabulary scan (no shuffle, no cartesian materialization —
  Spark's builtin, JVM codegen) behind two cheap prefilters that kill
  most pairs before the DP: the LENGTH BAND (|len(v)−len(q)| ≤ d —
  necessary for distance ≤ d) and Spark's own ``levenshtein(…, d)``
  threshold form which abandons the DP row early;
- ``max_expansions`` caps the per-term expansion DETERMINISTICALLY
  (df desc, term asc — prefer common spellings, the Lucene default) so
  a 1-edit neighborhood of a short term cannot blow up the downstream
  OR; the cap is a row_number over the (tiny) expansion set.

Everything is deterministic → exactly SQL-replayable (DuckDB ships
``levenshtein``), so the approximate-looking tier keeps an exact
oracle, the repo's standing discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def corpus_vocabulary(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(term, df)`` over the analysis tokenization — the reusable
    expansion target (persist it beside the posting index at real
    scale; it is a projection of the index's term stats)."""
    return (
        docs.select(
            F.col(doc_id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
        )
        .groupBy("term")
        .agg(F.count_distinct("id").alias("df"))
    )


def fuzzy_expand_terms(
    vocab: DataFrame,
    queries: DataFrame,
    *,
    max_edits: int = 1,
    max_expansions: int | None = 10,
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """Expand each query term to vocabulary terms within ``max_edits``.

    ``vocab`` is ``(term, df)`` (:func:`corpus_vocabulary` or the
    posting index's term stats).  Returns ``(query_id, term)`` — the
    DISTINCT expanded term set per query, exact matches included when
    they exist in the vocabulary (distance 0).  ``max_expansions``
    keeps the top-N neighbors per (query, source term) by (df desc,
    term asc); None disables the cap.
    """
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("_qterm"),
    )
    # broadcast the (tiny) query side; length-band + thresholded
    # levenshtein run map-side over the vocabulary scan
    cand = vocab.select("term", "df").join(
        F.broadcast(qt),
        (
            F.abs(F.length("term") - F.length("_qterm")) <= max_edits
        ) & (F.levenshtein("term", "_qterm", max_edits) >= 0),
        # levenshtein(l, r, threshold) returns -1 when distance exceeds
        # the threshold — the early-abandoning form
        "inner",
    )
    if max_expansions is not None:
        if max_expansions < 1:
            raise ValueError("max_expansions must be >= 1 (or None)")
        w = Window.partitionBy("query_id", "_qterm").orderBy(
            F.col("df").desc(), F.col("term").asc()
        )
        cand = (
            cand.withColumn("_xrn", F.row_number().over(w))
            .filter(F.col("_xrn") <= max_expansions)
        )
    return cand.select("query_id", "term").distinct()


def bm25_fuzzy_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    max_edits: int = 1,
    max_expansions: int | None = 10,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
    **bm25_kwargs,
) -> DataFrame:
    """Typo-tolerant BM25: expand query terms through the corpus
    vocabulary, then rank with the unmodified scorer over the expanded
    per-query term sets — ``(query_id, id, score, rank)``.

    Expansion happens BEFORE scoring, so the scorer's plan (semi-join
    below the tf aggregate, broadcast query side, corpus-level idf) is
    untouched; a query whose every term missed the vocabulary simply
    has no expanded terms and returns no rows, like any non-matching
    query.
    """
    from .retrieval import bm25_topk

    vocab = corpus_vocabulary(
        docs, doc_id_col=doc_id_col, text_col=text_col
    )
    expanded = fuzzy_expand_terms(
        vocab, queries,
        max_edits=max_edits, max_expansions=max_expansions,
        query_id_col=query_id_col, query_terms_col=query_terms_col,
    )
    eq = expanded.groupBy("query_id").agg(
        F.sort_array(F.collect_set("term")).alias("qterms")
    )
    return bm25_topk(
        docs, eq, k,
        doc_id_col=doc_id_col, text_col=text_col,
        **bm25_kwargs,
    )


def wildcard_expand_terms(
    vocab: DataFrame,
    queries: DataFrame,
    *,
    max_expansions: int | None = 10,
    query_id_col: str = "query_id",
    query_patterns_col: str = "qpatterns",
) -> DataFrame:
    """Expand per-query WILDCARD patterns against the vocabulary —
    Lucene/ES ``wildcard`` query semantics: ``*`` matches any run,
    ``?`` exactly one character, anchored to the whole term (round
    11, the fourth term-level query type next to exact/fuzzy/prefix).

    Patterns live in the analysis alphabet ``[a-z0-9*?]`` (terms are
    lowercase alphanumeric runs by the tokenizer contract), so the
    regex translation is two literal replacements — no escaping, and
    the SAME translation renders in the oracle.  Like the fuzzy
    expansion: the vocabulary is the only scanned side (corpus-
    sublinear), patterns broadcast, the match predicate runs map-side
    over the vocabulary scan, and ``max_expansions`` caps each
    pattern's neighborhood deterministically (df desc, term asc —
    prefer common terms, the Lucene default).  Returns the distinct
    ``(query_id, term)`` expansion set.
    """
    qp = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_patterns_col))).alias("_pat"),
    ).withColumn(
        "_rx",
        F.concat(
            F.lit("^"),
            F.regexp_replace(
                F.regexp_replace("_pat", r"\*", ".*"), r"\?", "."
            ),
            F.lit("$"),
        ),
    )
    cand = vocab.select("term", "df").join(
        F.broadcast(qp), F.rlike(F.col("term"), F.col("_rx")), "inner"
    )
    if max_expansions is not None:
        if max_expansions < 1:
            raise ValueError("max_expansions must be >= 1 (or None)")
        w = Window.partitionBy("query_id", "_pat").orderBy(
            F.col("df").desc(), F.col("term").asc()
        )
        cand = (
            cand.withColumn("_wrn", F.row_number().over(w))
            .filter(F.col("_wrn") <= max_expansions)
        )
    return cand.select("query_id", "term").distinct()


def bm25_wildcard_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    max_expansions: int | None = 10,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_patterns_col: str = "qpatterns",
    **bm25_kwargs,
) -> DataFrame:
    """Wildcard retrieval: expand patterns through the vocabulary,
    rank with the unmodified BM25 over the expanded term sets — the
    :func:`bm25_fuzzy_topk` composition with wildcard expansion."""
    from .retrieval import bm25_topk

    vocab = corpus_vocabulary(
        docs, doc_id_col=doc_id_col, text_col=text_col
    )
    expanded = wildcard_expand_terms(
        vocab, queries,
        max_expansions=max_expansions,
        query_id_col=query_id_col, query_patterns_col=query_patterns_col,
    )
    eq = expanded.groupBy("query_id").agg(
        F.sort_array(F.collect_set("term")).alias("qterms")
    )
    return bm25_topk(
        docs, eq, k,
        doc_id_col=doc_id_col, text_col=text_col,
        **bm25_kwargs,
    )
