"""Matryoshka (truncated-prefix) two-stage ANN, round 10 — the
adaptive-dimension rung of the compression ladder.

The ladder so far trades PRECISION for IO (int8 → SQ8 → PQ → binary:
fewer bits per component); Matryoshka-style embeddings (Kusupati et
al., "Matryoshka Representation Learning", NeurIPS 2022) open the
orthogonal axis: fewer COMPONENTS.  MRL-trained encoders concentrate
semantic mass in the leading dimensions, so the first d′ components
of a d-dim vector are themselves a usable embedding — the standard
serving pattern ("adaptive retrieval" in the paper) is a coarse pass
over the d′-prefix followed by exact full-dimension rescoring of the
shortlist.  The reference serves one fixed dimension
(`src/index/vector_shard.cc` scans the full flat matrix every time);
this rung makes dimension a QUERY-TIME knob on the same stored
vectors — no retraining, no second copy of the corpus.

Operators:

- ``prefix_cosine_topk`` — the coarse pass alone: cosine over the
  renormalized d′-prefix (slice + renorm are pure expressions, so
  the coarse score is deterministic and the tier is exactly
  SQL-replayable — the approximate rung keeps an exact oracle, like
  SQ8/PQ/champion lists).
- ``matryoshka_topk`` — coarse shortlist → exact full-dim cosine
  rescore → top-k.  With ``shortlist ≥ corpus`` this degrades to
  exact ``cosine_topk`` (tested); recall-vs-(d′, shortlist) is
  measured in the bench detail next to the other approximate rungs'
  curves.

Scale (100 TB): the win is IO-shaped, like the binary rung — store
the renormalized prefix as its OWN column (or index file): parquet
column pruning then reads d′/d of the vector bytes for the coarse
pass (plan-locked in tests: the coarse scan's ReadSchema carries the
prefix column only when the caller passes a materialized prefix), and
the rescore gathers full vectors for shortlist·|queries| rows only —
the same DPP-bounded-gather discipline as every coarse→fine tier
here.  Both stages are the proven crossJoin(broadcast queries) →
partial-top-k shape; nothing corpus-sized shuffles.

The in-container fixtures are NOT MRL-trained (no model runs here),
so prefix recall on them is the honest WORST case — components carry
i.i.d.-ish information and the d′/d recall curve is the floor an MRL
encoder lifts.  Measured floor at sf0.1 (bench ``matryoshka_recall5``,
d=64 fixtures): recall@5 = 0.24/0.36/0.47 at d′=8/16/32 with
shortlist 20, rising to 0.49/0.72/0.84 at shortlist 200 — i.e. on
UNTRAINED embeddings even d′=d/2 needs a ~40× shortlist to approach
0.85, so this rung is strictly for MRL-trained corpora (where the
paper reports ≥0.98 relative accuracy at d/8); deploy it only with a
measured per-model curve, the champion-list sizing discipline.  The
COST side of the claim is measured where it matters — at the
reference's width d=768 (bench ``d768`` section): the d′=96
two-stage rung runs 1.23 s vs 2.79 s full-dim expression kNN on the
same corpus (2.3×, and faster than the GEMM path's 1.38 s), and the
10× scale anchor (``matryoshka_fixedq``) reads ratio 2.74 —
sublinear, the coarse pass's d′/d flop discount compounding with
cache effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.distance import cosine_from_norms, l2_norm, l2_normalize
from .similarity import _cosine_ranked, cosine_topk


def prefix_vector(vector_col, d_prime: int):
    """Renormalized d′-prefix expression (double array) — the column
    to MATERIALIZE at index build so coarse scans prune to d′/d of
    the vector bytes."""
    if d_prime < 1:
        raise ValueError("d_prime must be >= 1")
    v = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    return l2_normalize(F.slice(v, 1, d_prime))


def prefix_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    d_prime: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    prefix_col: str | None = None,
) -> DataFrame:
    """Coarse pass: cosine top-k over the renormalized d′-prefix —
    ``(query_id, id, cosine, rank)`` (``cosine`` is the PREFIX
    similarity).  ``prefix_col`` names a pre-materialized prefix
    column on ``vectors`` (the index-build form — column pruning
    then never touches the full vector); absent, the prefix is
    sliced on the fly (the from-scratch form that carries the
    oracle)."""
    if d_prime < 1:
        raise ValueError("d_prime must be >= 1")
    # cosine is scale-invariant, so the from-scratch path slices WITHOUT
    # renormalizing — the ranking is identical and the expression stays
    # minimal (fewer double ops for the oracle to replay bit-exactly).
    # A materialized prefix_col is normalized (prefix_vector) so dot
    # products over it are cosines, but cosine_similarity is correct on
    # it either way (its norms are ~1).
    doc_prefix = (
        F.col(prefix_col)
        if prefix_col is not None
        else F.slice(F.col(vector_col), 1, d_prime)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.slice(F.col(query_vector_col), 1, d_prime).alias("_qp"),
    ).withColumn("_qn", l2_norm(F.col("_qp")))
    scored = vectors.select(
        F.col(id_col).alias("id"), doc_prefix.alias("_vp"),
        l2_norm(doc_prefix).alias("_vn"),
    ).join(F.broadcast(q), how="cross").select(
        "query_id",
        "id",
        cosine_from_norms(
            F.col("_vp"), F.col("_qp"), F.col("_vn"), F.col("_qn")
        ).alias("cosine"),
    )
    return _cosine_ranked(scored, k)


def matryoshka_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    d_prime: int,
    shortlist: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vector_col: str = "qvec",
    prefix_col: str | None = None,
) -> DataFrame:
    """Two-stage adaptive retrieval: d′-prefix coarse shortlist →
    exact full-dimension cosine rescore → ``(query_id, id, cosine,
    rank)`` (``cosine`` is the FULL-dim similarity; ranks follow the
    repo's rank-key convention).  ``shortlist`` bounds the rescore
    gather at shortlist·|queries| full vectors."""
    if shortlist < k:
        raise ValueError("shortlist must be >= k")
    cands = prefix_cosine_topk(
        vectors, queries, shortlist,
        d_prime=d_prime, id_col=id_col, vector_col=vector_col,
        query_id_col=query_id_col, query_vector_col=query_vector_col,
        prefix_col=prefix_col,
    ).select("query_id", "id")
    # rescore: gather full vectors for the shortlist only — the
    # candidate frame is shortlist·|queries| rows, broadcast into the
    # corpus scan (the bounded-gather discipline)
    full = vectors.select(F.col(id_col).alias("id"), F.col(vector_col).alias("_v"))
    qf = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vector_col).alias("_qv"),
    )
    # ‖v‖ is added AFTER the broadcast candidate join: the projection
    # evaluates only for the shortlist·|queries| joined rows, not every
    # corpus row (ADVICE r13 — a pre-join withColumn sat below the join
    # and paid ~N extra norm folds when candidates ≪ corpus)
    scored = (
        full.join(F.broadcast(cands), "id")
        .withColumn("_vn", l2_norm(F.col("_v")))
        .join(F.broadcast(qf.withColumn("_qn", l2_norm(F.col("_qv")))), "query_id")
        .select(
            "query_id",
            "id",
            cosine_from_norms(
                F.col("_v"), F.col("_qv"), F.col("_vn"), F.col("_qn")
            ).alias("cosine"),
        )
    )
    return _cosine_ranked(scored, k)


def exact_cosine_topk_reference(
    vectors: DataFrame, queries: DataFrame, k: int, **kw
) -> DataFrame:
    """Alias of :func:`operators.similarity.cosine_topk` — the recall
    denominator the bench section scores the prefix rungs against."""
    return cosine_topk(vectors, queries, k, **kw)
