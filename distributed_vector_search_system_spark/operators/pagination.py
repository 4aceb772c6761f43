"""Stateless deep pagination (``search_after``), round 10.

Offset pagination ranks and discards ``offset`` rows per page — at
page N the window sorts N·k rows per query, and a crawler walking a
million-doc result set makes the engine re-rank everything it has
already served (the classic deep-paging pathology; ES caps ``from``
at 10k for exactly this reason and points users at ``search_after``).
The stateless fix: the client passes the LAST ROW's sort key — here
``(rounded score, id)``, the repo's total order — and the engine
filters strictly past it BEFORE ranking, so every page costs the
same: one map-side cursor predicate + one top-k window over what
survives.

Spark-first shape: the cursor is a per-query ``(query_id,
after_score, after_id)`` frame (broadcast — one row per query);
the predicate composes into the scored frame ahead of the partial
top-k, so Catalyst pushes it below everything pushable and the
rank window never sees served rows.  Works downstream of ANY leg
that emits ``(query_id, id, score)`` — BM25, sparse, fused, boosted
— because it keys on the shared determinism convention (6-decimal
round, id tie-break): the SAME convention that makes results
SQL-replayable makes cursors portable across engines.

``rank`` restarts at 1 on every page (it is the within-page rank;
the client's absolute position is its own business — stateless means
the engine holds nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import _score_ranked


def page_cursor(
    page: DataFrame,
    *,
    score_col: str = "score",
    prev: DataFrame | None = None,
) -> DataFrame:
    """The cursor for the NEXT page: each query's last-ranked row's
    ``(query_id, after_score, after_id)`` — feed to
    :func:`search_after`.  ``page`` is any ranked page in the repo
    convention (``rank`` present, score already rounded).

    ``prev``: the cursor frame this page was fetched with.  A query
    whose page came back EMPTY has no last row, so without carrying
    its previous cursor forward the next :func:`search_after` would
    treat it as cursor-absent and re-serve its FIRST page — an
    infinite loop for a naive walk (ADVICE r10).  Pass the previous
    cursors and exhausted queries keep yielding empty pages instead;
    page-1 callers (no previous cursor) may omit it, and then MUST
    drop a query after its first empty page.
    """
    mx = page.groupBy("query_id").agg(F.max("rank").alias("_last"))
    nxt = (
        page.join(F.broadcast(mx), "query_id")
        .filter(F.col("rank") == F.col("_last"))
        .select(
            "query_id",
            F.col(score_col).alias("after_score"),
            F.col("id").alias("after_id"),
        )
    )
    if prev is None:
        return nxt
    carried = prev.select(
        "query_id", "after_score", "after_id"
    ).join(F.broadcast(nxt.select("query_id")), "query_id", "left_anti")
    return nxt.unionByName(carried)


def search_after(
    scored: DataFrame,
    cursors: DataFrame,
    k: int,
    *,
    score_col: str = "score",
) -> DataFrame:
    """The page strictly after each query's cursor —
    ``(query_id, id, <score_col>, rank)`` with ``rank`` restarting
    at 1.

    ``scored``: any ``(query_id, id, score)`` frame (UNranked — the
    leg's full scored output, exactly what the first page ranked).
    ``cursors``: ``(query_id, after_score, after_id)``; a query
    absent from the cursor frame gets its FIRST page (the natural
    "no cursor yet" semantics), and the cursor score is compared on
    the 6-decimal rounded key so cursors captured from served pages
    resume exactly.
    """
    cur = cursors.select(
        "query_id",
        F.col("after_score").cast("double").alias("_as"),
        F.col("after_id").alias("_ai"),
    )
    joined = scored.join(F.broadcast(cur), "query_id", "left")
    r = F.round(F.col(score_col), 6)
    past_cursor = (
        F.col("_as").isNull()
        | (r < F.col("_as"))
        | ((r == F.col("_as")) & (F.col("id") > F.col("_ai")))
    )
    return _score_ranked(
        joined.filter(past_cursor).drop("_as", "_ai"), k, score_col
    )
