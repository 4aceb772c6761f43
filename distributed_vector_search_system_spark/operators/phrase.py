"""Exact phrase search: positional token intersection.

BM25 and the posting stores treat a document as a bag of terms; a
phrase query ("vector search engine", quoted) additionally requires the
terms to be CONTIGUOUS and IN ORDER.  The classic inverted-index answer
(Lucene/ES ``match_phrase``) intersects positional posting lists; the
relational re-expression here is one join + one aggregate:

    every (phrase slot i, document position p) hit votes for the
    ANCHOR ``a = p − i``; a document contains the phrase at anchor
    ``a`` iff all ``m`` slots voted for ``a``.

Spark shape:

- the query side (phrase slots) is RPC-bounded → broadcast;
- document token positions stream through ONE scan (from-scratch
  form) or a term-restricted pruned read of the POSITIONAL index
  (indexed form — only the phrase's terms' postings are read, pushed
  down to the parquet scan);
- one hash aggregate per (query, doc, anchor) with map-side combine —
  for a fixed (anchor, slot) at most one position can match, so
  ``count(*) == m`` IS the full-phrase test — then a count of anchors
  gives the phrase frequency and the standard rounded top-k cut.

A slot is ``posexplode`` 0-based; anchors are therefore 0-based
document positions, and a full match forces ``anchor ≥ 0``
automatically (slot 0 must land on the anchor itself).

The reference has no text tier at all; this extends the engine's
lexical family (BM25 / hybrid / stores) with the third classic query
class, sharing ``functions.text.tokens`` so phrase semantics agree
with every other lexical operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

#: positional postings are term-clustered like the BM25 index
POSITIONAL_PARTITIONS = 8


def _phrase_slots(queries: DataFrame, query_id_col: str, phrase_col: str):
    """(query_id, _slot, term) + broadcastable per-query slot count."""
    qslot = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.size(F.col(phrase_col)).alias("_m"),
        F.posexplode(F.col(phrase_col)).alias("_slot", "term"),
    )
    return qslot


def _anchor_topk(
    qslot: DataFrame, positions: DataFrame, k: int
) -> DataFrame:
    """Shared back half: anchor votes → full-phrase anchors → phrase
    frequency → top-k.  ``positions`` is ``(id, pos, term)``."""
    hit = positions.join(F.broadcast(qslot), "term").select(
        "query_id",
        "id",
        (F.col("pos") - F.col("_slot")).alias("_anchor"),
        "_m",
    )
    anchors = hit.groupBy("query_id", "id", "_anchor", "_m").agg(
        F.count("*").alias("_ns")
    )
    freq = (
        anchors.filter(F.col("_ns") == F.col("_m"))
        .groupBy("query_id", "id")
        .agg(F.count("*").alias("phrase_tf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("phrase_tf").desc(), F.col("id").asc()
    )
    return freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def phrase_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Top-k documents by exact-phrase frequency, from scratch (one
    corpus tokenize per query batch).

    ``queries``: one row per query, the phrase as an ORDERED token
    array ``(query_id_col, phrase_col: array<string>)`` — tokens as
    produced by ``functions.text.tokens`` (lowercase, [a-z0-9]+).
    Documents with zero occurrences are absent (no zero-score rows);
    a single-token phrase degrades to term search ranked by tf.
    Returns ``(query_id, id, phrase_tf, rank)``, rank by (phrase_tf
    desc, id)."""
    positions = docs.select(
        F.col(doc_id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    return _anchor_topk(
        _phrase_slots(queries, query_id_col, phrase_col), positions, k
    )


def write_positional_index(
    docs: DataFrame,
    path: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist positional postings ``(term, id, pos)``, term-clustered
    (repartition + sortWithinPartitions on ``term``) so a phrase
    query's ``term IN (…)`` pushdown skips row groups — the same
    layout discipline as ``write_posting_index``, with positions
    instead of term frequencies.  Index size is one row per TOKEN
    (vs one per distinct (term, doc) for BM25) — the classic
    positional-index storage trade."""
    (
        docs.select(
            F.col(doc_id_col).alias("id"),
            F.posexplode(tokens(text_col)).alias("pos", "term"),
        )
        .repartition(POSITIONAL_PARTITIONS, "term")
        .sortWithinPartitions("term")
        .write.mode(mode)
        .parquet(path)
    )


def phrase_search_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    *,
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Top-k by exact-phrase frequency served from a
    ``write_positional_index`` layout: only the phrase terms' posting
    rows are read (the term restriction reaches the parquet scan as
    PushedFilters over the term-clustered files — plan-locked in
    tests/test_phrase.py), then the same anchor intersection as
    :func:`phrase_topk`.  Results are identical by construction (the
    index stores exactly the from-scratch tokenization)."""
    qslot = _phrase_slots(queries, query_id_col, phrase_col)
    terms = sorted(
        {r["term"] for r in qslot.select("term").distinct().collect()}
    )
    positions = spark.read.parquet(path).filter(F.col("term").isin(terms))
    return _anchor_topk(qslot, positions, k)


def _slop_pair_reqs(qslot: DataFrame) -> DataFrame:
    """Hall-condition requirement table for one query batch (round 13,
    ADVICE r12 item 1): per ``(query_id, term)``, every ordered slot
    pair ``(_lo ≤ _hi)`` of that term's slots with ``_req`` = how many
    of the term's slots fall inside ``[_lo, _hi]``.  Query-side only —
    three joins over the RPC-bounded slot frame, broadcast downstream;
    the pair count is ``Σ_t r_t(r_t+1)/2`` (``r_t`` = repeats of term
    ``t``), a query constant."""
    ts = qslot.select("query_id", "term", "_slot")
    pairs = (
        ts.select("query_id", "term", F.col("_slot").alias("_lo"))
        .join(
            ts.select("query_id", "term", F.col("_slot").alias("_hi")),
            ["query_id", "term"],
        )
        .filter(F.col("_lo") <= F.col("_hi"))
    )
    return (
        pairs.join(ts, ["query_id", "term"])
        .filter(F.col("_slot").between(F.col("_lo"), F.col("_hi")))
        .groupBy("query_id", "term", "_lo", "_hi")
        .agg(F.count("*").alias("_req"))
    )


def _slop_anchor_topk(
    qslot: DataFrame, positions: DataFrame, k: int, slop: int
) -> DataFrame:
    """Sloppy back half (round 12, VERDICT r11 item 3): slot ``i`` at
    document position ``p`` votes the ADJUSTED anchor ``a = p − i``
    (Lucene's ``pos − offset``); the sloppy phrase matches at window
    start ``s`` iff the slots admit an INJECTIVE assignment to
    document positions with every adjusted anchor in ``[s, s+slop]``
    — the Lucene SloppyPhraseScorer acceptance test (``end − start ≤
    slop`` over adjusted positions, no two slots sharing one token
    occurrence), under which an adjacent transposition costs 2 and
    ``slop=0`` degenerates to the exact-anchor intersection.

    Repeated query terms (round 13, ADVICE r12 item 1): requiring one
    anchor per slot lets a SINGLE token occurrence satisfy several
    slots of a repeated term (doc ``xx aa yy`` would match ``"aa
    aa"``); injectivity is what rules that out.  Slot ``i``'s feasible
    positions for start ``s`` form the interval ``[s+i, s+slop+i]`` —
    a STAIRCASE family over the term's slots (both endpoints increase
    with ``i``), for which Hall's matching condition reduces exactly
    to its contiguous-subrange instances: an injective assignment
    exists iff for EVERY slot pair ``lo ≤ hi`` of every term, the
    document has at least ``req`` (= the term's slots inside
    ``[lo, hi]``) distinct positions of that term in ``[s+lo,
    s+slop+hi]``.  (Span-counting is exact for the binding pairs —
    consecutive slot gaps ≤ slop+1 make the union of the slot
    intervals one gap-free span — and over-counting on non-binding
    pairs is harmless because their constraint is implied by their
    connected sub-runs.)  Singleton pairs subsume the old
    every-slot-present test; phrases with no repeated term reduce to
    it exactly, so non-repeat results are unchanged.

    ``phrase_tf`` counts the COVERING WINDOW STARTS (each start ``s``
    whose window admits a full injective match counts): a match with
    anchor spread ``d`` is covered by ``slop + 1 − d`` starts, so
    tighter matches score higher — the monotone stand-in for Lucene's
    ``1/(1+matchLength)`` sloppy weight, and the same overlap
    convention as :func:`proximity_topk`.  The start explode is
    bounded by the constant ``slop + 1`` and the pair fan-out by the
    constant ``Σ_t r_t(r_t+1)/2`` — never data-sized."""
    qterms = qslot.select("query_id", "term").distinct()
    tpos = positions.join(F.broadcast(qterms), "term").select(
        "query_id", "id", "term", "pos"
    )
    cand = (
        positions.join(F.broadcast(qslot), "term")
        .select(
            "query_id",
            "id",
            F.explode(
                F.sequence(
                    F.col("pos") - F.col("_slot") - slop,
                    F.col("pos") - F.col("_slot"),
                )
            ).alias("_start"),
        )
        .distinct()
    )
    reqs = _slop_pair_reqs(qslot)
    npairs = reqs.groupBy("query_id").agg(F.count("*").alias("_np"))
    have = (
        cand.join(F.broadcast(reqs), "query_id")
        .join(tpos, ["query_id", "id", "term"])
        .filter(
            F.col("pos").between(
                F.col("_start") + F.col("_lo"),
                F.col("_start") + F.lit(slop) + F.col("_hi"),
            )
        )
        .groupBy("query_id", "id", "_start", "term", "_lo", "_hi", "_req")
        .agg(F.count_distinct("pos").alias("_have"))
    )
    sat = (
        have.filter(F.col("_have") >= F.col("_req"))
        .groupBy("query_id", "id", "_start")
        .agg(F.count("*").alias("_sat"))
    )
    freq = (
        sat.join(F.broadcast(npairs), "query_id")
        .filter(F.col("_sat") == F.col("_np"))
        .groupBy("query_id", "id")
        .agg(F.count("*").alias("phrase_tf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("phrase_tf").desc(), F.col("id").asc()
    )
    return freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def phrase_slop_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    slop: int = 0,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """ES ``match_phrase`` with ``slop`` (round 12): top-k documents by
    sloppy-phrase frequency — terms may sit up to ``slop`` adjusted
    positions apart (``slop ≥ 2`` admits an adjacent transposition,
    the ES/Lucene contract), with repeated query terms requiring
    DISTINCT token occurrences (the injective-assignment acceptance
    test — see :func:`_slop_anchor_topk`; round 13, ADVICE r12
    item 1).  ``slop=0`` returns exactly :func:`phrase_topk`'s rows.
    Input/output schemas match :func:`phrase_topk`."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    positions = docs.select(
        F.col(doc_id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    return _slop_anchor_topk(
        _phrase_slots(queries, query_id_col, phrase_col), positions, k, slop
    )


def phrase_slop_search_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    *,
    slop: int = 0,
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Sloppy phrase served from a :func:`write_positional_index`
    layout — the same term-``IN`` pushdown as
    :func:`phrase_search_index` (only the phrase terms' posting rows
    are read), then the sloppy anchor-window intersection.  Identical
    rows to :func:`phrase_slop_topk` over the same corpus."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    qslot = _phrase_slots(queries, query_id_col, phrase_col)
    terms = sorted(
        {r["term"] for r in qslot.select("term").distinct().collect()}
    )
    positions = spark.read.parquet(path).filter(F.col("term").isin(terms))
    return _slop_anchor_topk(qslot, positions, k, slop)


def proximity_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    window: int = 8,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Top-k documents by PROXIMITY: how many length-``window`` sliding
    token windows contain ALL the query's terms (unordered — the
    Elasticsearch ``match`` + proximity / Galago ``#uw`` family, where
    :func:`phrase_topk` is the ordered/contiguous special case).

    Same anchor-voting shape as the phrase operator, widened: a hit of
    term t at position p supports every window START ``s ∈ (p−window,
    p]`` (a bounded ``explode`` of ``window`` starts per hit — the
    blow-up factor is the constant ``window``, never data-sized), and a
    start with ``count_distinct(term) == m`` contains all terms.  Score
    = number of such starts (overlapping windows each count — a run
    where the terms stay near each other scores higher, which is the
    point of proximity ranking); rank by (window_count desc, id).

    Duplicate terms in ``terms_col`` are collapsed — proximity is a
    SET test, unlike the phrase's ordered slots.  Windows are clipped
    to starts ≥ 0 so a hit near the document head cannot vote for
    out-of-range starts.  Returns ``(query_id, id, window_count,
    rank)``; documents with no qualifying window are absent."""
    if window < 1:
        raise ValueError("window must be >= 1")
    qterm = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.size(F.array_distinct(F.col(terms_col))).alias("_m"),
        F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
    )
    positions = docs.select(
        F.col(doc_id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    starts = (
        positions.join(F.broadcast(qterm), "term")
        .select(
            "query_id",
            "id",
            "_m",
            "term",
            F.explode(
                F.sequence(
                    F.greatest(F.col("pos") - (window - 1), F.lit(0)),
                    F.col("pos"),
                )
            ).alias("_start"),
        )
    )
    wins = starts.groupBy("query_id", "id", "_start", "_m").agg(
        F.count_distinct("term").alias("_nt")
    )
    freq = (
        wins.filter(F.col("_nt") == F.col("_m"))
        .groupBy("query_id", "id")
        .agg(F.count("*").alias("window_count"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("window_count").desc(), F.col("id").asc()
    )
    return freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def phrase_prefix_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    max_expansions: int = 10,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """ES ``match_phrase_prefix`` (round 13 addendum) — the
    search-as-you-type phrase: the phrase's LAST element is a PREFIX,
    expanded to the alphabetically-first ``max_expansions`` vocabulary
    terms (the Lucene first-in-term-dictionary contract), and a
    document matches where the fixed slots plus ANY completion form
    the exact contiguous phrase.  Exact (slop=0) only — the
    autocomplete case; a sloppy prefix phrase has no clean Lucene
    contract to replay.

    The disjunction costs NOTHING extra in the anchor intersection:
    the expanded slot becomes one broadcast (slot, term) row per
    completion, and at a fixed (doc, anchor) the last slot's position
    holds ONE token, which equals at most one completion — so the
    per-anchor vote count test ``count(*) == m`` from
    :func:`_anchor_topk` is unchanged (any completion satisfies the
    slot, two cannot double-vote).

    Scale: the vocabulary scan shares the corpus tokenize the
    from-scratch phrase pays anyway; the expansion is per-query
    top-``max_expansions`` over the PREFIX-matched vocabulary only (a
    ranked window over a vocabulary-restricted frame, then broadcast
    like every slot frame).  ``phrase_tf`` counts anchors of the
    completed phrase, the :func:`phrase_topk` convention; single-slot
    phrases degrade to prefix term search ranked by tf.

    Returns ``(query_id, id, phrase_tf, rank)``."""
    if max_expansions < 1:
        raise ValueError("max_expansions must be >= 1")
    positions = docs.select(
        F.col(doc_id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    qfix = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.size(F.col(phrase_col)).alias("_m"),
        F.posexplode(F.expr(f"slice({phrase_col}, 1, size({phrase_col}) - 1)"))
        .alias("_slot", "term"),
    )
    qpre = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.size(F.col(phrase_col)).alias("_m"),
        (F.size(F.col(phrase_col)) - 1).alias("_slot"),
        F.element_at(F.col(phrase_col), -1).alias("_prefix"),
    )
    vocab = positions.select("term").distinct()
    expanded = (
        vocab.join(
            F.broadcast(qpre),
            F.col("term").startswith(F.col("_prefix")),
        )
        .withColumn(
            "_xr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("term").asc())
            ),
        )
        .filter(F.col("_xr") <= max_expansions)
        .select("query_id", "_m", "_slot", "term")
    )
    qslot = qfix.unionByName(expanded)
    return _anchor_topk(qslot, positions, k)
