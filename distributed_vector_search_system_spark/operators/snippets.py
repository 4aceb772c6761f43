"""Snippet generation (highlighting): the best token window per hit.

The last mile of a search serving surface: given a ranked (query, doc)
hit list, show WHERE the document matched — the length-``W`` token
window covering the most distinct query terms (count desc, earliest
window on ties — the deterministic convention every other ranked
surface here uses).  Lucene calls this the unified highlighter's
passage selection; the repo's primitive is positions over the standard
analysis segmentation (``functions.text.tokens``), the same coordinate
system the phrase/proximity operators use (operators/phrase.py — a
snippet window is literally a proximity window scored by coverage).

Spark-first shape, per stage:

1. positions  — ``posexplode`` of the tokenized text, immediately
   INNER-joined to the broadcast query vocabulary: only match
   positions survive the map side (per (query, doc) that's a handful
   of rows — query terms only, never the document length).
2. windows    — every match position is a candidate window START
   (the optimal window's left edge can be moved right to a match
   without losing coverage, so starts ≠ matches never win: the
   classic smallest-window argument).  A self-join per (query, doc)
   pairs starts with the matches they cover (``start ≤ pos <
   start + W``) — the join keys on (query_id, id) whose groups are
   match-bounded, so the pairing is quadratic only in the per-doc
   MATCH count, not the document.
3. select     — ``count_distinct(term)`` per window, one
   ``row_number`` per (query, doc) over (coverage desc, start asc).
4. render     — the winner joins the corpus once more to slice the
   window's tokens (column-pruned scan; the text column moves only
   for winning (doc) rows, and only ``W`` tokens of it leave).

``hits=`` restricts snippet generation to an upstream leg's ranked
result (the normal serving composition: rank first with BM25/sparse/
hybrid, then highlight the page).  Without it, every (query, matching
doc) pair is snippeted — the oracle-friendly exhaustive form.

Scale notes (100 TB): stage 1 is the one corpus-wide scan (map-side
semi-restriction to query terms, the bm25_scores discipline); stages
2-3 touch only match rows; stage 4 re-reads text for winner docs only
(id-equi join, DPP-prunable when the corpus is id-bucketed).  The
snippet is assembled from the ANALYSIS tokens (lowercased, punctuation
stripped) — display-fidelity snippets over the original text would
swap ``tokens`` for ``ws_tokens`` + a lowercase match column, same
plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


#: default per-(query, doc, term) match-position cap — the start×match
#: pairing below is quadratic in the per-doc match count, and LLM
#: training corpora contain exactly the docs that inflate it (one query
#: term repeated 10k times → 10⁸ pairs for that doc; VERDICT r09).  64
#: positions per term bounds any (query, doc) pairing at
#: (64·|qterms|)² rows while staying far above real per-doc term
#: repetition in ranked-page snippeting.
MAX_POSITIONS_PER_TERM = 64


def best_window_snippets(
    docs: DataFrame,
    queries: DataFrame,
    window: int = 8,
    *,
    hits: DataFrame | None = None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
    max_positions_per_term: int | None = MAX_POSITIONS_PER_TERM,
) -> DataFrame:
    """Per (query, matching doc): the best length-``window`` snippet.

    Returns ``(query_id, id, win_start, n_matched, snippet)`` —
    ``win_start`` 0-based into the token stream, ``n_matched`` the
    distinct query terms covered, ``snippet`` the window's tokens
    space-joined.  Docs sharing no term with the query are absent
    (nothing to highlight).  ``hits`` (optional ``(query_id, id)``
    frame) restricts to an upstream ranked page.

    ``max_positions_per_term`` (default 64) keeps only the EARLIEST
    ``M`` match positions per (query, doc, term) before the start×match
    pairing — the repetition-spam bound: a doc spamming one query term
    10k times would otherwise generate 10⁸ candidate pairs.  The result
    is EXACT whenever every (query, doc, term) has ≤ M matches (any
    realistic page); above that it is a bounded approximation that
    still finds a window over the term's earliest occurrences (the
    deterministic choice — same tie-break direction as the winner
    selection).  ``None`` disables the cap (the exhaustive
    oracle-replay form).
    """
    if window <= 0:
        raise ValueError("window must be positive")
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("term"),
    )
    positions = docs.select(
        F.col(doc_id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    ).join(F.broadcast(qt), "term")
    if hits is not None:
        positions = positions.join(
            hits.select("query_id", "id").distinct(), ["query_id", "id"], "left_semi"
        )
    if max_positions_per_term is not None:
        if max_positions_per_term < 1:
            raise ValueError("max_positions_per_term must be >= 1 (or None)")
        pw = Window.partitionBy("query_id", "id", "term").orderBy(
            F.col("pos").asc()
        )
        positions = (
            positions.withColumn("_prn", F.row_number().over(pw))
            .filter(F.col("_prn") <= max_positions_per_term)
            .drop("_prn")
        )
    starts = positions.select(
        "query_id", "id", F.col("pos").alias("_start")
    ).distinct()
    covered = starts.join(
        positions.withColumnRenamed("pos", "_mpos"),
        ["query_id", "id"],
    ).filter(
        (F.col("_mpos") >= F.col("_start"))
        & (F.col("_mpos") < F.col("_start") + window)
    )
    scored = covered.groupBy("query_id", "id", "_start").agg(
        F.count_distinct("term").alias("n_matched")
    )
    w = Window.partitionBy("query_id", "id").orderBy(
        F.col("n_matched").desc(), F.col("_start").asc()
    )
    winners = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    rendered = winners.join(
        docs.select(F.col(doc_id_col).alias("id"), tokens(text_col).alias("_toks")),
        "id",
    ).select(
        "query_id",
        "id",
        F.col("_start").cast("int").alias("win_start"),
        F.col("n_matched").cast("int").alias("n_matched"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("_start") + 1, window), " "
        ).alias("snippet"),
    )
    return rendered
