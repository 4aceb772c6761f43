"""Percolation: reverse search — match documents against STORED
queries, round 10.

Every operator so far answers "given a query, which documents?";
production search stacks also need the inverse (Elasticsearch's
percolator, Lucene's Monitor): REGISTER standing queries — alerts,
saved searches, routing rules, content filters — and for each
arriving document report which of them it satisfies.  The reference
has no analog (its only read path is vector top-k,
`src/rpc/search_service_impl.cc`); this is the operator that makes a
corpus-scale pipeline push-capable — "tell me when a doc matching
THIS lands".

Semantics (the boolean subset — the deterministic core of ES's
percolator): a stored query is a set of positive terms plus an
optional set of negative terms; a document matches when at least
``min_match`` DISTINCT positive terms occur in it (``"all"`` =
conjunctive, the default) and NO negative term does.  Scoring
percolation composes separately: feed the matched pairs to any
scorer as a ``(query, doc)`` restriction.

Spark-first shape: stored queries are the SMALL side by contract
(alert registries are thousands of rows) — their exploded term table
broadcasts; the corpus tokenize+explode is map-side and LEFT-SEMI
restricted to the registry's union vocabulary BEFORE the only
aggregate, which keys on (doc, query) pairs that share ≥1 term.  The
negative clause is a second broadcast join reduced to a per-(doc,
query) anti set.  Nothing corpus-sized shuffles; no corpus self-join
exists — the same asymmetric-pair discipline as
``operators/contamination.py``.

At streaming cadence the same plan runs per micro-batch over the
arriving docs (``streaming/`` foreachBatch precedent) — each batch is
tiny, the broadcast registry is reused, and matches append to an
alerts sink.  Deterministic set arithmetic → exactly SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def percolate(
    docs: DataFrame,
    stored: DataFrame,
    *,
    min_match: int | str = "all",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "qterms",
    none_terms_col: str | None = None,
    min_match_col: str | None = None,
) -> DataFrame:
    """Match documents against the stored-query registry —
    ``(doc_id, query_id, matched, required)``, one row per satisfied
    (document, stored query) pair.

    ``stored``: ``(query_id, qterms array<string>[, none_terms])``.
    ``matched`` counts DISTINCT positive terms present in the doc;
    ``required`` is the per-query threshold — ``size(distinct
    qterms)`` when ``min_match="all"``, else ``least(min_match,
    n_terms)`` (an integer threshold above a query's term count must
    still be satisfiable by matching every term — ES's
    minimum_should_match clamp).  A query with no positive terms
    matches nothing (a pure-negative standing alert would match the
    whole corpus stream — rejected, like the boolean layer).

    ``min_match_col`` (round 11, the mutable-registry form): a PER-
    QUERY integer threshold column on ``stored`` — NULL means "all"
    (conjunctive), integers take the same ES clamp as the global form
    (upper ``least(·, n_terms)``, lower ``greatest(1, ·)``).  The
    global ``min_match`` is ignored when the column is given — the
    registry row, not the call site, owns its threshold (ES stores
    minimum_should_match inside the percolator document).
    """
    if min_match != "all":
        if not isinstance(min_match, int) or min_match < 1:
            raise ValueError('min_match must be "all" or an int >= 1')
    sel = [
        F.col(query_id_col).alias("query_id"),
        F.array_distinct(F.col(terms_col)).alias("_terms"),
    ]
    if min_match_col is not None:
        sel.append(F.col(min_match_col).cast("int").alias("_mm"))
    pos = stored.select(*sel).withColumn("_n_terms", F.size("_terms"))
    if min_match_col is not None:
        # explicit null branch: Spark's greatest/least IGNORE nulls
        # (greatest(1, NULL) = 1), so a coalesce over them would turn
        # NULL ("all") into threshold 1
        required = F.when(
            F.col("_mm").isNull(), F.col("_n_terms")
        ).otherwise(
            F.least(F.greatest(F.lit(1), F.col("_mm")), F.col("_n_terms"))
        )
    elif min_match == "all":
        required = F.col("_n_terms")
    else:
        required = F.least(F.lit(min_match), F.col("_n_terms"))
    pos = pos.withColumn("required", required).filter(F.col("_n_terms") >= 1)
    pterms = pos.select(
        "query_id", "required", F.explode("_terms").alias("term")
    )
    dtoks = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    ).join(
        F.broadcast(pterms.select("term").distinct()), "term", "left_semi"
    )
    matched = (
        dtoks.join(F.broadcast(pterms), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").alias("matched"),
            F.first("required").alias("required"),
        )
        .filter(F.col("matched") >= F.col("required"))
    )
    if none_terms_col is not None:
        nterms = stored.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(F.col(none_terms_col))).alias("term"),
        )
        ndtoks = docs.select(
            F.col(doc_id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokens(text_col))).alias("term"),
        ).join(F.broadcast(nterms.select("term").distinct()), "term", "left_semi")
        veto = (
            ndtoks.join(F.broadcast(nterms), "term")
            .select("doc_id", "query_id")
            .distinct()
        )
        matched = matched.join(
            F.broadcast(veto), ["doc_id", "query_id"], "left_anti"
        )
    return matched.select("doc_id", "query_id", "matched", "required")


def percolate_scored(
    docs: DataFrame,
    stored: DataFrame,
    *,
    min_match: int | str = "all",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "qterms",
    none_terms_col: str | None = None,
    min_match_col: str | None = None,
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """Scored percolation — the boolean match set with each pair's
    BM25 relevance attached: ``(doc_id, query_id, matched, required,
    score)``.  ES's percolator returns matches SCORED so consumers
    can prioritize alerts (which standing query does this doc satisfy
    BEST); here the admissible pairs come from :func:`percolate` and
    the score is the unmodified corpus-stats BM25 of the stored
    query's terms against the doc — one inner join between two
    already-restricted frames, no new shuffle shape.  Rank per doc or
    per query downstream as the alerting policy needs.

    The scorer's doc side is SEMI-RESTRICTED to the matched pairs' doc
    ids (``bm25_scores(filter_ids=...)`` — results restricted, idf /
    N / avgdl stay corpus-level, so scores are unchanged): without it
    the second pass scores every doc sharing ≥1 registry term, and for
    conjunctive registries (``min_match="all"``) the matched set can
    be far smaller than the ≥1-term set (VERDICT r10 item 6).  The
    match subtree is evaluated once more for the id set — map-side
    broadcast joins over the tokenize scan, cheap by construction —
    making the scoring pass O(matches)."""
    from .retrieval import BM25_B, BM25_K1, bm25_scores

    pairs = percolate(
        docs, stored,
        min_match=min_match,
        doc_id_col=doc_id_col, text_col=text_col,
        query_id_col=query_id_col, terms_col=terms_col,
        none_terms_col=none_terms_col, min_match_col=min_match_col,
    )
    queries = stored.select(
        F.col(query_id_col).alias("query_id"),
        F.array_distinct(F.col(terms_col)).alias("qterms"),
    )
    scored = bm25_scores(
        docs, queries,
        k1=BM25_K1 if k1 is None else k1,
        b=BM25_B if b is None else b,
        doc_id_col=doc_id_col, text_col=text_col,
        filter_ids=pairs.select(F.col("doc_id").alias("id")).distinct(),
    ).select("query_id", F.col("id").alias("doc_id"), "score")
    return pairs.join(scored, ["doc_id", "query_id"], "inner").select(
        "doc_id",
        "query_id",
        "matched",
        "required",
        F.round("score", 6).alias("score"),
    )


def percolate_stream(
    stream_docs: DataFrame,
    stored,
    out_path: str,
    *,
    checkpoint: str,
    min_match: int | str = "all",
    **cols,
):
    """Standing-query alerting: percolate each arriving micro-batch
    against the registry and APPEND satisfied pairs to the alerts
    sink — the push-capable form of the same plan.  Returns the
    started ``StreamingQuery``.

    ``stored`` is either a plain registry DataFrame (static for the
    stream's lifetime — the round-10 form) or a
    ``sources.percolator_store.PercolatorStore`` (round 11): with a
    store, each micro-batch re-resolves the FOLDED registry view, so
    queries registered/updated/unregistered between batches take
    effect on the next batch and a restart from the checkpoint
    percolates only new docs — against the registry as it stands.
    A store-backed stream should pass the store's ``min_match``
    column through ``min_match_col="min_match"``.
    """

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        registry = (
            stored.registry_view(batch.sparkSession)
            if hasattr(stored, "registry_view")
            else stored
        )
        percolate(
            batch, registry, min_match=min_match, **cols
        ).write.mode("append").parquet(out_path)

    return (
        stream_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
