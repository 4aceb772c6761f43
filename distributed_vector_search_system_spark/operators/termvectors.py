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
