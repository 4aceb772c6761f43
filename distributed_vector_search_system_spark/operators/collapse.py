"""Result grouping (field collapsing): best hit(s) per group value in
a ranked result (round 10 — Elasticsearch ``collapse``, Solr result
grouping, SERP host-dedup).

A ranked page dominated by near-identical results from one source is
a bad page; collapsing keeps the best ``per_group`` hits per group
value (source, domain, near-dup cluster id, …) and re-ranks the
survivors.  This composes DOWNSTREAM of any leg — BM25, sparse,
dense, hybrid — because it only consumes ``(query_id, id, score)``.

Spark-first shape: one id-equi join from the (k-bounded) hit list to
the column-pruned group attribute, one window per (query, group) over
the HIT LIST (input cardinality = hits, never the corpus), one
re-rank window per query.  All windows are partitioned (the repo's
no-unpartitioned-windows lock applies) and their inputs are bounded
by the upstream leg's k.

Deterministic (score desc, id asc at both levels) → exact SQL replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_topk(
    hits: DataFrame,
    docs: DataFrame,
    group_col: str,
    k: int,
    *,
    per_group: int = 1,
    doc_id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Collapse ``hits`` (``query_id, id, <score_col>``) on the group
    attribute and return the per-query top-``k`` survivors —
    ``(query_id, id, group, score, rank)`` (``group`` stringified,
    NULL group values form their own "null" bucket, the facet
    convention).

    Within a (query, group): keep the ``per_group`` best by (score
    desc, id asc).  Survivors re-rank per query by the same key —
    so the output is the ranked page a UI shows after collapsing.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if per_group < 1:
        raise ValueError("per_group must be >= 1")
    attrs = docs.select(
        F.col(doc_id_col).alias("id"),
        F.coalesce(F.col(group_col).cast("string"), F.lit("null")).alias("group"),
    )
    h = hits.select("query_id", "id", F.col(score_col).alias("score"))
    # hits are k-bounded by contract: semi-restrict the corpus-side
    # attribute scan to hit ids with the ids BROADCAST, then broadcast
    # the surviving sliver (≤ distinct hit ids rows) into the equi
    # join — the scoring.py / facets_for_hits discipline (VERDICT r10
    # item 3): nothing corpus-sized ever shuffles, deterministically,
    # instead of relying on AQE to rescue a sort-merge join.
    attrs_sub = attrs.join(
        F.broadcast(h.select("id").distinct()), "id", "left_semi"
    )
    joined = h.join(F.broadcast(attrs_sub), "id")
    gw = Window.partitionBy("query_id", "group").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    kept = (
        joined.withColumn("_grn", F.row_number().over(gw))
        .filter(F.col("_grn") <= per_group)
        .drop("_grn")
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        kept.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "group", "score", "rank")
    )
