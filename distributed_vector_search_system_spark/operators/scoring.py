"""Function scoring: document-signal boosts composed onto any
retrieval leg's relevance scores, round 10.

The reference ranks by geometry alone (squared-L2 over
`src/index/vector_shard.cc`'s flat matrix); production ranking almost
never ships that way — freshness, popularity, and length priors are
folded into the relevance score at query time (Lucene/Elasticsearch
``function_score``: ``field_value_factor`` and the ``exp``/``gauss``
decay functions).  This module is that composition layer, generic
over the leg: it takes any k-bounded ``(query_id, id, score)`` hits
frame (BM25, sparse, dense cosine, fused — all of this repo's legs
emit the shape) plus a per-doc factor frame, and re-ranks.

Two factor builders cover the classic cases:

- ``field_value_factor`` — ``weight · modifier(field)`` with the
  Lucene modifiers (``none`` / ``log1p`` / ``sqrt``), e.g. a
  popularity or length prior;
- ``decay_factor`` — ``exp``/``gauss`` distance decay of a numeric or
  timestamp column around an origin: ``exp`` multiplies by
  ``decay^(max(0, |x−origin|−offset)/scale)``, ``gauss`` by
  ``decay^(((max(0, |x−origin|−offset))/scale)²)`` — both equal
  ``decay`` exactly at distance ``offset+scale``, the ES contract.

``function_score`` then composes: ``multiply`` (the default — a
factor of 1 is the identity) or ``sum`` boost modes, missing factor
rows treated as the neutral element so a doc absent from the factor
frame keeps its relevance score.

Everything is deterministic arithmetic over materialized columns →
exactly SQL-replayable (the approximation-free tier keeps an exact
oracle).

Scale (100 TB): hits are k-bounded by contract — the factor join
BROADCASTS the hits side into the factor scan (the
``facets_for_hits`` pattern), so the corpus-side factor frame is
scanned once with column pruning down to ``(id, field)`` and nothing
corpus-sized ever shuffles.  The re-rank window partitions on
query_id over ≤ leg-k rows per query.  Factors are per-DOC (query
independent) by design: precomputable, cacheable, and shippable as an
index column at build time.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from .retrieval import _score_ranked

_MODIFIERS = ("none", "log1p", "sqrt")
_DECAYS = ("exp", "gauss")
_MODES = ("multiply", "sum")


def field_value_factor(
    docs: DataFrame,
    field: str,
    *,
    weight: float = 1.0,
    modifier: str = "log1p",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc factor ``weight · modifier(field)`` — ``(id, factor)``.

    ``log1p`` is the Lucene default for unbounded counters (a doc 10×
    more popular is boosted by a constant, not 10×); ``none`` is the
    raw value, ``sqrt`` the square root.  NULL fields — and fields the
    modifier maps to NaN (``sqrt`` of a negative value), which would
    otherwise sort ABOVE every double in the descending rank window
    and pin the doc at rank 1 (ADVICE r10) — yield no row (the doc
    keeps its relevance score under either boost mode).
    """
    if modifier not in _MODIFIERS:
        raise ValueError(f"modifier must be one of {_MODIFIERS}")
    x = F.col(field).cast("double")
    expr = {
        "none": x,
        "log1p": F.log1p(x),
        "sqrt": F.sqrt(x),
    }[modifier]
    return docs.select(
        F.col(doc_id_col).alias("id"),
        (F.lit(float(weight)) * expr).alias("factor"),
    ).filter(F.col("factor").isNotNull() & ~F.isnan("factor"))


def decay_factor(
    docs: DataFrame,
    field: str,
    *,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    kind: str = "exp",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Distance-decay factor around ``origin`` — ``(id, factor)``.

    ``d = max(0, |field − origin| − offset)``; ``exp`` returns
    ``decay^(d/scale)``, ``gauss`` ``decay^((d/scale)²)`` — both hit
    exactly ``decay`` at ``d = scale`` (the ES decay contract), gauss
    flatter near the origin and steeper past it.  Timestamp fields
    are passed pre-projected to a numeric epoch/day column — the
    operator is unit-agnostic (origin/offset/scale share the column's
    unit).
    """
    if kind not in _DECAYS:
        raise ValueError(f"kind must be one of {_DECAYS}")
    if scale <= 0:
        raise ValueError("scale must be > 0")
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    if offset < 0:
        raise ValueError("offset must be >= 0")
    d = F.greatest(
        F.lit(0.0),
        F.abs(F.col(field).cast("double") - F.lit(float(origin)))
        - F.lit(float(offset)),
    ) / F.lit(float(scale))
    if kind == "gauss":
        d = d * d
    return docs.select(
        F.col(doc_id_col).alias("id"),
        F.exp(F.lit(math.log(decay)) * d).alias("factor"),
    ).filter(F.col("factor").isNotNull() & ~F.isnan("factor"))


def function_score(
    hits: DataFrame,
    factors: DataFrame,
    k: int,
    *,
    mode: str = "multiply",
    score_col: str = "score",
) -> DataFrame:
    """Compose per-doc ``factors (id, factor)`` onto k-bounded
    ``hits (query_id, id, score)`` and re-rank —
    ``(query_id, id, score, rank)``.

    ``multiply``: ``score · factor`` (missing factor → 1);
    ``sum``: ``score + factor`` (missing factor → 0).  Ties and
    rounding follow the repo ranking convention (6-decimal round,
    id tie-break).  Multiple factor frames compose by chaining calls
    — multiplication and addition are each associative, so chaining
    equals a combined factor frame.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    neutral = 1.0 if mode == "multiply" else 0.0
    h = hits.select("query_id", "id", F.col(score_col).alias("_rel"))
    # hits are k-bounded: semi-restrict the corpus-side factor scan to
    # hit ids with the hit ids broadcast (facets_for_hits pattern), so
    # nothing corpus-sized shuffles; the surviving factor rows are
    # ≤ |hits| and broadcast into the preserving outer join (Spark can
    # only broadcast the non-preserved side, which is exactly the tiny
    # side here).
    fsub = factors.join(
        F.broadcast(h.select("id").distinct()), "id", "left_semi"
    )
    joined = h.join(F.broadcast(fsub), "id", "left")
    fac = F.coalesce(F.col("factor"), F.lit(neutral))
    combined = (
        (F.col("_rel") * fac) if mode == "multiply" else (F.col("_rel") + fac)
    )
    scored = joined.select(
        "query_id", "id", combined.alias(score_col)
    )
    return _score_ranked(scored, k, score_col)


def boosting_score(
    hits: DataFrame,
    negative: DataFrame,
    k: int,
    *,
    negative_boost: float = 0.5,
    score_col: str = "score",
) -> DataFrame:
    """ES ``boosting`` query: DEMOTE (don't exclude) hits matching the
    negative clause — ``score · negative_boost`` for matches, the
    relevance score verbatim otherwise, then re-rank.  The soft
    complement of boolean NOT: "prefer docs not from this source /
    not matching these terms", with matches still served when nothing
    better exists.

    ``negative`` is the negative clause's match set — a one-column
    ``id`` frame (doc-level demotion: a blocklisted source, a
    near-dup cluster, a stale partition) or per-query ``(query_id,
    id)`` pairs (the boolean layer's admissibility shape, so any
    term/phrase/fuzzy clause composes directly).  Semantics follow
    ES: ``negative_boost`` in [0, 1); 0 floors matches to score 0 but
    never removes the row.

    Scale: hits are k-bounded by contract — the negative set is
    semi-restricted to hit ids with the ids BROADCAST, and the
    surviving sliver joins back broadcast (the ``function_score``
    discipline: nothing corpus-sized ever shuffles, plan-locked in
    tests/test_scoring.py).
    """
    if not 0.0 <= negative_boost < 1.0:
        raise ValueError("negative_boost must be in [0, 1)")
    per_query = "query_id" in negative.columns
    keys = ["query_id", "id"] if per_query else ["id"]
    h = hits.select("query_id", "id", F.col(score_col).alias("_rel"))
    neg = negative.select(*keys).distinct().join(
        F.broadcast(h.select("id").distinct()), "id", "left_semi"
    )
    joined = h.join(
        F.broadcast(neg.withColumn("_neg", F.lit(True))), keys, "left"
    )
    scored = joined.select(
        "query_id",
        "id",
        F.when(
            F.col("_neg").isNotNull(),
            F.col("_rel") * F.lit(float(negative_boost)),
        )
        .otherwise(F.col("_rel"))
        .alias(score_col),
    )
    return _score_ranked(scored, k, score_col)


def random_score_factor(
    docs: DataFrame,
    seed: int | str,
    *,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """ES ``random_score`` with a seed+field: a DETERMINISTIC pseudo-
    random per-doc factor in [0, 1) derived from the portable content
    hash of (seed, id) — reproducible across runs, engines, and the
    DuckDB oracle (``functions.hashing.portable_hash64``), which is
    exactly what ES's seeded form promises (stable jitter for A/B
    bucketing, sampled ranking, tie-spreading).  Composes through
    :func:`function_score` like any factor frame; map-side expression
    only."""
    h = portable_hash64(
        F.col(doc_id_col).cast("string"), seed=seed
    )
    return docs.select(
        F.col(doc_id_col).alias("id"),
        (F.pmod(h, F.lit(1_000_000)).cast("double") / F.lit(1e6)).alias(
            "factor"
        ),
    )
