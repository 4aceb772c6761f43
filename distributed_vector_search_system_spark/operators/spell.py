"""Spell suggestion ("did you mean"), round 11 — the sixth
query-understanding verb, closing the family (fuzzy retrieval,
autocomplete, PRF, more-like-this, synonyms — rounds 10; this one is
ES's term suggester / Lucene's DirectSpellChecker).

Fuzzy retrieval (operators/fuzzy.py) silently ranks over the expanded
term set; a suggester instead REPORTS the best corrections so the UI
can ask "did you mean …?" and the client can re-issue the corrected
query.  The semantics are ES's term-suggester contract:

- ``suggest_mode="missing"`` (the ES default): suggest only for terms
  absent from the corpus vocabulary — a term users actually type
  correctly never gets "corrected";
- ``"popular"``: suggest only corrections with HIGHER document
  frequency than the source term (fix plausible-but-rare spellings);
- ``"always"``: suggest for every term.

Candidates are vocabulary terms within ``max_edits`` Levenshtein
edits, ranked by (edit distance asc, df desc, term asc) — closest
first, then most attested, then the deterministic tie-break; ES ranks
by score-then-frequency the same way.  ``did_you_mean`` composes the
per-term winners back into one corrected term array per query — the
string a UI renders.

Spark-first shape (inherited from the fuzzy layer and why it scales):
the only scan beyond the query side is the corpus VOCABULARY (corpus-
SUBLINEAR by Heaps' law; a projection of the posting index's term
stats at serving scale), query terms broadcast, the length-band +
early-abandoning ``levenshtein(…, d)`` prefilters run map-side, and
the per-term cut is a window over the (tiny) candidate set.
Deterministic → exactly SQL-replayable (DuckDB ships ``levenshtein``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MODES = ("missing", "popular", "always")


def spell_suggestions(
    vocab: DataFrame,
    queries: DataFrame,
    *,
    max_edits: int = 2,
    top_n: int = 3,
    min_df: int = 1,
    suggest_mode: str = "missing",
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """Per-(query, term) correction candidates —
    ``(query_id, source_term, suggestion, distance, df, srank)``.

    ``vocab`` is ``(term, df)`` (``operators.fuzzy.corpus_vocabulary``
    or the posting index's term stats).  A suggestion is never the
    source term itself (distance ≥ 1); ``min_df`` drops noise terms
    from candidacy; terms with no admissible candidate emit no rows
    (the "no suggestion" answer).
    """
    if suggest_mode not in _MODES:
        raise ValueError(f"suggest_mode must be one of {_MODES}")
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("source_term"),
    ).distinct()
    # one broadcast pass over the vocabulary computes BOTH the
    # candidate set (distance in [1, max_edits]) and the source term's
    # own df (distance 0) — the mode gates below need the latter
    cand = vocab.filter(F.col("df") >= min_df).join(
        F.broadcast(qt),
        (
            F.abs(F.length("term") - F.length("source_term")) <= max_edits
        ) & (F.levenshtein("term", "source_term", max_edits) >= 0),
        "inner",
    ).select(
        "query_id",
        "source_term",
        F.col("term").alias("suggestion"),
        F.levenshtein("term", "source_term").alias("distance"),
        "df",
    )
    grp = Window.partitionBy("query_id", "source_term")
    cand = (
        cand.withColumn(
            "_src_df",
            F.max(F.when(F.col("distance") == 0, F.col("df"))).over(grp),
        )
        .filter(F.col("distance") >= 1)
    )
    if suggest_mode == "missing":
        cand = cand.filter(F.col("_src_df").isNull())
    elif suggest_mode == "popular":
        cand = cand.filter(
            F.col("_src_df").isNull() | (F.col("df") > F.col("_src_df"))
        )
    w = Window.partitionBy("query_id", "source_term").orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc()
    )
    return (
        cand.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= top_n)
        .select("query_id", "source_term", "suggestion", "distance", "df", "srank")
    )


def did_you_mean(
    vocab: DataFrame,
    queries: DataFrame,
    *,
    max_edits: int = 2,
    min_df: int = 1,
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """The corrected query per input query —
    ``(query_id, qterms array<string>)``: each term replaced by its
    top ``missing``-mode suggestion when it has one, kept verbatim
    otherwise (in-vocabulary terms and unsalvageable ones).  Term
    order and multiplicity follow the input array (positional
    rewrite), so the output feeds any term-set leg directly — the
    "did you mean" query IS a query.
    """
    pos = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(F.col(query_terms_col)).alias("_pos", "source_term"),
    )
    best = spell_suggestions(
        vocab, queries,
        max_edits=max_edits, top_n=1, min_df=min_df,
        suggest_mode="missing",
        query_id_col=query_id_col, query_terms_col=query_terms_col,
    ).select("query_id", "source_term", "suggestion")
    fixed = pos.join(F.broadcast(best), ["query_id", "source_term"], "left")
    return (
        fixed.select(
            "query_id",
            "_pos",
            F.coalesce("suggestion", "source_term").alias("_term"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_term"))
                ),
                lambda s: s["_term"],
            ).alias("qterms")
        )
    )
