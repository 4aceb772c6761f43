"""Late-interaction (multi-vector) retrieval: ColBERT-style MaxSim.

Single-vector retrieval collapses a document to one embedding before
scoring; late interaction keeps one vector PER TOKEN (or chunk) on both
sides and scores

    MaxSim(q, d) = Σ_{i ∈ q}  max_{j ∈ d}  sim(q_i, d_j)

(Khattab & Zaharia, "ColBERT", SIGIR 2020) — each query token is
matched against its best-matching document token, so fine-grained term
interactions survive that a pooled single vector averages away.  This
is the third retrieval scoring family next to BM25 (lexical) and
cosine/L2 (dense single-vector), and the natural consumer of the
chunking operators: embed chunks, keep them as multi-vector docs,
retrieve with MaxSim.

Spark shape — the exact tier, mirroring ``cosine_topk``'s contract:

- the query batch is RPC-bounded (broadcast after ``posexplode`` to
  one row per query token);
- document token vectors stream through ONE scan (no self-join, no
  shuffle of the corpus before aggregation);
- two hash aggregates, both with map-side partial combine:
  ``max`` per (query token, doc), then ``sum`` per (query, doc);
- the standard partial-top-k window cut.

At 100 TB the corpus side scales like every exact tier here — one scan
× |query tokens| arithmetic — and the scale path is the same as for
single vectors: route each query TOKEN through an IVF index to bound
its candidate docs, then MaxSim only the gathered candidates (the
ColBERT two-stage serving shape).  The exact operator below is both
the baseline and the re-scoring stage of that composition.

Determinism: the per-(query, doc) sum is rounded to ``round_scores``
decimals BEFORE ranking (the BM25 score-space convention — FP addition
order across engines must not flip top-k membership), id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import cosine_similarity, dot_product


def maxsim_topk(
    doc_vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    doc_id_col: str = "doc_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vectors_col: str = "qvecs",
    metric: str = "cosine",
    round_scores: int = 6,
) -> DataFrame:
    """Top-k documents by MaxSim.

    ``doc_vectors``: one row per (document, token vector) —
    ``(doc_id_col, vector_col)``; a document's vectors need not be
    contiguous or ordered (max/sum are permutation-invariant).

    ``queries``: one row per query with the token vectors as an array
    column ``(query_id_col, query_vectors_col: array<array<double>>)``.

    ``metric``: ``"cosine"`` (default) or ``"dot"`` (ColBERT's choice
    when both sides are pre-normalized — then the two coincide).

    Returns ``(query_id, id, maxsim, rank)``, rank by (maxsim desc,
    id) on the rounded score."""
    if metric == "cosine":
        sim = cosine_similarity
    elif metric == "dot":
        sim = dot_product
    else:
        raise ValueError(f"metric must be 'cosine' or 'dot', got {metric!r}")
    qtok = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(F.col(query_vectors_col)).alias("_qpos", "_qv"),
    )
    scored = doc_vectors.join(F.broadcast(qtok), how="cross").select(
        "query_id",
        "_qpos",
        F.col(doc_id_col).alias("id"),
        sim(F.col(vector_col), F.col("_qv")).alias("_s"),
    )
    per_token = scored.groupBy("query_id", "_qpos", "id").agg(
        F.max("_s").alias("_ms")
    )
    agg = per_token.groupBy("query_id", "id").agg(
        F.round(F.sum("_ms"), round_scores).alias("maxsim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("id").asc()
    )
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
