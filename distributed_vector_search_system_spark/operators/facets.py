"""Faceted search: value-count aggregations beside a ranked result.

Every serving stack pairing ranked retrieval with navigation (search
UIs, corpus dashboards, curation consoles) needs facets: for the set
of documents MATCHING a query or filter, the count of each value of
each chosen attribute — lang, source, bucketed length — computed over
ALL matches, not just the returned top-k page.  The reference has no
lexical tier at all; this completes the repo's serving surface the way
operators/retrieval.py completed ranking.

Spark-first shape: facets are one map-side-combinable aggregate.

- ``facet_counts``      — corpus/filter facets: one scan of the
  admissible set, one ``explode`` of the (facet, value) pairs built
  IN the projection (so N facet columns still cost one scan, not N),
  one hash aggregate.  Output ``(facet, value, count)``.
- ``topn_facet_counts`` — the UI form: only the ``top_n`` most
  frequent values per facet (count desc, value asc tie-break — the
  deterministic-oracle convention), via a per-facet window over the
  ALREADY-AGGREGATED counts (cardinality = distinct values, never
  rows).
- ``facets_for_hits``   — per-query facets: given a retrieval leg's
  MATCH SET ``(query_id, id)`` (the scored candidates before the
  top-k cut — what a search UI shows counts for), join the document
  attributes and count per ``(query_id, facet, value)``.  The join is
  id-equi (shuffle bounded by the match set, or broadcast when the
  match set is query-bounded); document attributes come from a
  column-pruned scan — the text column never moves.

Scale notes (100 TB): ``facet_counts`` is scan + partial agg + one
exchange keyed on (facet, value) — cardinality is the facet
vocabulary, thousands at most, so the exchange is trivially small;
skewed values are absorbed by map-side combine.  ``facets_for_hits``
never touches the corpus beyond the pruned attribute columns of
matched ids.  Values are stringified in the projection (facet columns
of mixed types share one schema); bucket numeric columns BEFORE
faceting (``F.floor(col/width)*width`` or a CASE ladder) — raw
high-cardinality numerics as facets are a modeling error, not an
engine path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pairs(facet_cols: Sequence[str]):
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    return F.array(
        *[
            F.struct(
                F.lit(c).alias("facet"),
                F.col(c).cast("string").alias("value"),
            )
            for c in facet_cols
        ]
    )


def facet_counts(
    docs: DataFrame,
    facet_cols: Sequence[str],
    *,
    where=None,
) -> DataFrame:
    """Value counts per facet column over the admissible set.

    ``where`` (Column or SQL string) restricts the set first — the
    filter sits under the aggregate, so Catalyst pushes it into the
    scan.  NULL attribute values are kept as the string "null" bucket
    (a missing attribute is a real navigation category).
    Returns ``(facet, value, count)``.
    """
    base = docs
    if where is not None:
        base = base.filter(F.expr(where) if isinstance(where, str) else where)
    exploded = base.select(
        F.explode(_pairs(facet_cols)).alias("_p")
    ).select(
        F.col("_p.facet").alias("facet"),
        F.coalesce(F.col("_p.value"), F.lit("null")).alias("value"),
    )
    return exploded.groupBy("facet", "value").agg(F.count("*").alias("count"))


def topn_facet_counts(
    docs: DataFrame,
    facet_cols: Sequence[str],
    top_n: int,
    *,
    where=None,
) -> DataFrame:
    """The ``top_n`` most frequent values per facet (count desc, value
    asc — deterministic across engines).  The window runs over the
    aggregated counts, so its input cardinality is the facet
    vocabulary, not the corpus."""
    counts = facet_counts(docs, facet_cols, where=where)
    w = Window.partitionBy("facet").orderBy(
        F.col("count").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("frank", F.row_number().over(w))
        .filter(F.col("frank") <= top_n)
        .select("facet", "value", "count", "frank")
    )


def facets_for_hits(
    hits: DataFrame,
    docs: DataFrame,
    facet_cols: Sequence[str],
    *,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Per-query facet counts over a retrieval leg's match set.

    ``hits`` carries ``(query_id, id)`` — typically the SCORED
    candidate set of a lexical/sparse leg (every doc sharing a term),
    i.e. the set a search UI's facet sidebar describes.  Duplicate
    ``(query_id, id)`` rows are deduplicated first so each matched doc
    counts once (ADVICE r09 — the same contract
    ``best_window_snippets`` applies to its ``hits``).  Returns
    ``(query_id, facet, value, count)``.
    """
    attrs = docs.select(
        F.col(doc_id_col).alias("id"), _pairs(facet_cols).alias("_ps")
    )
    joined = hits.select("query_id", "id").distinct().join(attrs, "id")
    exploded = joined.select(
        "query_id", F.explode("_ps").alias("_p")
    ).select(
        "query_id",
        F.col("_p.facet").alias("facet"),
        F.coalesce(F.col("_p.value"), F.lit("null")).alias("value"),
    )
    return exploded.groupBy("query_id", "facet", "value").agg(
        F.count("*").alias("count")
    )


def histogram_facet(
    docs: DataFrame,
    value_col: str,
    *,
    width: float,
    origin: float = 0.0,
    extra_aggs=None,
) -> DataFrame:
    """Fixed-interval histogram over a numeric column (round 10 — the
    ES ``histogram`` / ``date_histogram`` aggregation; timestamps are
    pre-projected to a numeric epoch column, the repo's unit-agnostic
    stance).  Bucket key = ``origin + floor((v − origin)/width) ·
    width``; empty buckets are absent (min_doc_count=1, the default
    UIs want) and NULL values emit no row.  Returns
    ``(bucket, count)`` with ``bucket`` the inclusive lower bound.

    Scale: a pure map-side bucket expression + one hash aggregate
    whose exchange cardinality is the BUCKET COUNT — map-side combine
    absorbs any value skew, the same shape as ``facet_counts``.

    ``extra_aggs`` (round 12): pre-aliased aggregate Columns computed
    per bucket IN THE SAME hash aggregate — ES sub-aggregations cost
    no extra shuffle here (Catalyst prunes the untouched columns).
    """
    if width <= 0:
        raise ValueError("width must be > 0")
    v = F.col(value_col).cast("double")
    bucket = F.lit(float(origin)) + F.floor(
        (v - F.lit(float(origin))) / F.lit(float(width))
    ) * F.lit(float(width))
    return (
        docs.filter(v.isNotNull())
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("count"), *(extra_aggs or ()))
    )


def histogram_for_hits(
    hits: DataFrame,
    docs: DataFrame,
    value_col: str,
    *,
    width: float,
    origin: float = 0.0,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Per-query histogram over a retrieval leg's match set —
    ``(query_id, bucket, count)``; the ``facets_for_hits`` contract
    (dedup on ``(query_id, id)``, column-pruned attribute scan)."""
    if width <= 0:
        raise ValueError("width must be > 0")
    v = F.col(value_col).cast("double")
    bucket = F.lit(float(origin)) + F.floor(
        (v - F.lit(float(origin))) / F.lit(float(width))
    ) * F.lit(float(width))
    attrs = docs.filter(v.isNotNull()).select(
        F.col(doc_id_col).alias("id"), bucket.alias("bucket")
    )
    return (
        hits.select("query_id", "id").distinct()
        .join(attrs, "id")
        .groupBy("query_id", "bucket")
        .agg(F.count("*").alias("count"))
    )


def significant_terms(
    hits: DataFrame,
    docs: DataFrame,
    top_n: int,
    *,
    min_fg_df: int = 2,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Terms OVERREPRESENTED in each query's match set vs the corpus
    background (round 10 — the ES ``significant_terms`` aggregation,
    JLH heuristic): for term t with foreground share ``fg = df_fg /
    |match set|`` and background share ``bg = df_corpus / N``,
    ``jlh = (fg − bg) · fg / bg`` — the "what is this result set
    ABOUT" verb corpus exploration and query-intent dashboards run
    beside facets.  Terms must appear in ≥ ``min_fg_df`` matched docs
    (the noise gate); per query the top ``top_n`` by (6-decimal
    rounded jlh desc, term asc — the determinism convention).
    Returns ``(query_id, term, fg_df, bg_df, jlh, rank)``.

    Scale: the foreground side is match-set-bounded (hits broadcast
    into the tokenize of matched docs — the ``facets_for_hits``
    discipline); the background df aggregate is LEFT-SEMI restricted
    to the foreground's candidate terms BEFORE it runs (the
    ``bm25_scores`` plan shape), so its exchange carries only those
    terms' postings.  At serving scale bg df reads the posting
    index's per-term stats instead of re-aggregating — this
    from-scratch form carries the oracle, the ``bm25_topk`` stance.
    """
    from ..functions.text import tokens

    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    if min_fg_df < 1:
        raise ValueError("min_fg_df must be >= 1")
    h = hits.select("query_id", "id").distinct()
    sizes = h.groupBy("query_id").agg(F.count("*").alias("_m"))
    toks = docs.select(
        F.col(doc_id_col).alias("id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    n_docs = docs.select(F.count("*").alias("_n"))
    fg = (
        toks.join(F.broadcast(h), "id")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("fg_df"))
        .filter(F.col("fg_df") >= min_fg_df)
    )
    bg = (
        toks.join(
            F.broadcast(fg.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.count("*").alias("bg_df"))
    )
    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(sizes), "query_id")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "query_id",
            "term",
            "fg_df",
            "bg_df",
            F.round(
                (
                    F.col("fg_df") / F.col("_m")
                    - F.col("bg_df") / F.col("_n")
                )
                * (F.col("fg_df") / F.col("_m"))
                / (F.col("bg_df") / F.col("_n")),
                6,
            ).alias("jlh"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("jlh").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )


def rare_terms(
    docs: DataFrame,
    max_doc_count: int,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``rare_terms``: vocabulary terms whose document frequency is
    at most ``max_doc_count`` — the long-tail complement of the terms
    facet (typo mining, contamination canaries, PII-ish token audit).
    Returns ``(term, df)``.

    Scale: one distinct-count aggregate over the exploded tokens with
    the HAVING filter applied post-aggregate — the output is the
    vocabulary's long tail, which is most of a Zipfian vocabulary by
    TYPE count but tiny by mass; at serving scale read it off the
    posting index's term stats (df is a stored column there) instead
    of re-tokenizing (the ``corpus_vocabulary`` note applies).
    """
    if max_doc_count < 1:
        raise ValueError("max_doc_count must be >= 1")
    from ..functions.text import tokens

    return (
        docs.select(
            F.col(doc_id_col).alias("id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("term")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") <= max_doc_count)
    )
