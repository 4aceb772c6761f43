"""Ranked text retrieval and fusion: BM25, reciprocal-rank fusion, MMR.

The reference is a pure vector engine; a training-data / RAG pipeline at
100 TB pairs that with lexical retrieval over the document corpus and a
fusion step — the missing half of hybrid search.  This module adds:

- ``bm25_topk``   — Okapi BM25 (Lucene idf variant) entirely in
  built-in expressions: tokenize → postings restricted to the query
  vocabulary by a BROADCAST join (the corpus never shuffles on the
  term key for terms nobody asked about) → per-(query, doc) score →
  per-query top-k (WindowGroupLimit partial top-k, same shape as kNN).
- ``rrf_fuse``    — reciprocal-rank fusion of any number of ranked
  lists (Cormack et al.: score = Σ 1/(k0 + rank)); rank-only, so it
  composes rankings from incomparable score spaces (BM25 vs cosine).
- ``hybrid_rrf_topk`` — the standard hybrid-search composition:
  BM25 leg + exact-cosine vector leg, fused by RRF.
- ``mmr_rerank``  — maximal-marginal-relevance diversity re-rank of a
  top-N candidate list (Carbonell & Goldstein 1998): greedy
  λ·relevance − (1−λ)·max-similarity-to-selected.  Iterative/greedy →
  not SQL-expressible; runs as ``applyInPandas`` per query over the
  (k-bounded, already-retrieved) candidate set, so the Python surface
  touches only candidates — never the corpus.

Determinism contract (oracle comparison): ALL THREE score spaces —
BM25, RRF, and the hybrid vector legs (cosine, or L2 distance on the
indexed L2 leg) — rank on their 6-decimal ROUNDING with an id
tie-break, on both engines.  BM25's idf is transcendental (``ln``) and
cosine is an order-sensitive float sum; ranking raw doubles would let
a last-ulp cross-engine difference flip the order of two genuinely
tied documents, and at the ``leg_k`` cutoff that would flip
fused-input membership.  Rounding before the rank closes the hole in
every leg (VERDICT r06 item 6); standalone ``cosine_topk`` /
``search_ivf_index`` keep their raw default, matching their own
oracles' identical expressions.

Scale notes: the only corpus-wide shuffle in BM25 is the per-(doc,
term) tf aggregation, and it happens only for rows that survive the
broadcast semi-restriction to query terms — the 100 TB scan reduces
map-side to the query vocabulary's postings.  Corpus statistics
(N, avgdl) are one tiny auxiliary aggregate, broadcast back.  df is
computed from the restricted postings (per-term document counts are
unaffected by dropping other terms' rows).

Scan-count trade (VERDICT r06 minor b): the stats aggregate, the
posting subtree feeding the score join, and the df aggregate each
reference the tokenized corpus, and Catalyst does not dedupe common
subtrees — so ONE from-scratch invocation tokenizes the corpus up to
three times (all three map-side column scans; no extra shuffles).
This is deliberate: caching inside an operator would hijack executor
memory policy from the caller, and the documented scale path is the
PERSISTED posting index (sources/posting_index.py), which pays the
tokenize once at build time and serves stats, df, and postings from
storage — ``bm25_search_index`` touches zero document text at query
time.  From-scratch ``bm25_topk`` is the ad-hoc/oracle form.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import cosine_similarity
from ..functions.text import tokens

#: classic RRF constant (Cormack et al. 2009)
RRF_K = 60

BM25_K1 = 1.2
BM25_B = 0.75


def queries_from_docs(
    docs: DataFrame,
    pred,
    *,
    n_terms: int = 3,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic lexical query set: the first ``n_terms`` distinct
    tokens of each selected document (the fixture-derived analog of
    the vector registry drawing query vectors from ``embeddings``)."""
    return docs.filter(pred).select(
        F.col(doc_id_col).alias("query_id"),
        F.array_distinct(F.slice(tokens(text_col), 1, n_terms)).alias("qterms"),
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
    where=None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 scores for every (query, matching document) pair.

    idf is the Lucene/standard non-negative variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``; term weight is
    ``idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.  Query term
    multiplicity is ignored (terms are distinct-ed), the convention
    for short queries.

    Returns ``(query_id, id, score)`` — one row per (query, doc with
    ≥1 query term); docs matching no term are absent (score 0).

    ``where`` (Column or SQL string over ``docs``): FILTERED lexical
    search, the same contract as filtered ANN — results are restricted
    to matching documents, but idf / N / avgdl stay CORPUS-level
    (per-doc scores are independent given the stats, so the filtered
    ranking equals the unfiltered ranking restricted to matching docs —
    tested).  The restriction is a left-semi join on the doc id applied
    to the scored hits, so the filter never perturbs the statistics.
    ``filter_ids`` (one-column ``id`` frame) is the same restriction as
    a pre-materialized admissible set — the form the index paths take.
    A ``(query_id, id)`` frame restricts PER QUERY (the msearch form,
    round 13): query q's hits keep only q's own admissible ids.
    """
    toks = docs.select(
        F.col(doc_id_col).alias("id"), tokens(text_col).alias("_toks")
    )
    # corpus stats: one tiny aggregate, broadcast into the score join
    stats = toks.agg(
        F.count("*").alias("_n_docs"),
        F.avg(F.size("_toks").cast("double")).alias("_avgdl"),
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("term"),
    )
    # Restrict the exploded (doc, term) rows to the query vocabulary
    # BEFORE the tf aggregate.  The semi join must be written below the
    # groupBy explicitly: Catalyst's PushDownLeftSemiAntiJoin pushes
    # semi/anti joins under aggregates, but an INNER join written above
    # the aggregate stays above it — which would shuffle every (doc,
    # term) pair of the corpus to compute tf values nobody reads
    # (verified in the optimized plan, VERDICT r05 item 2).  tf of
    # non-query terms is never used and dl is computed pre-explode, so
    # the restriction cannot change any score.
    posting = (
        toks.select("id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
        .join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # per-query fan-out is a map-side broadcast hash join — no shuffle
    hits = posting.join(F.broadcast(qt), "term")
    if where is not None:
        match = docs.filter(
            F.expr(where) if isinstance(where, str) else where
        ).select(F.col(doc_id_col).alias("id"))
        hits = hits.join(match, "id", "left_semi")
    if filter_ids is not None:
        if "query_id" in filter_ids.columns:
            # per-QUERY admissible pairs (round 13, the msearch form):
            # each query restricts to its own match set in the same
            # multi-query plan — the semi join keys on both columns,
            # same pushdown discipline as the shared-id form
            hits = hits.join(
                filter_ids.select("query_id", "id"),
                ["query_id", "id"],
                "left_semi",
            )
        else:
            hits = hits.join(filter_ids.select("id"), "id", "left_semi")
    # df (docs containing term) is unchanged by dropping OTHER terms'
    # rows, so it can be computed from the restricted postings; it is
    # deliberately computed BEFORE the where= restriction (corpus-level
    # idf, see the docstring).
    #
    # ``count_if(tf >= 1)`` — not ``count_distinct(id)`` — for two
    # load-bearing reasons (round 14, guide §2.4 "share one exchange"):
    # (1) ``posting`` already has exactly one row per (id, term) (they
    #     are grouping keys above), and tf ≥ 1 for every emitted group,
    #     so the three aggregates are provably equal; count_distinct
    #     planned as an extra Expand/two-phase aggregate (one more
    #     shuffle of (term, id) pairs — raw-term keyed, the §2.5 skew
    #     shape this operator's docstring rejects).
    # (2) Referencing ``tf``'s VALUE keeps this branch's partial
    #     tf-aggregate bit-identical to the hits side's (a bare
    #     count(*)/count(tf) lets Catalyst prune the count buffer and
    #     the subtrees stop canonicalizing equal), so exchange reuse —
    #     ReuseExchange statically, the AQE stage cache at runtime —
    #     evaluates the tokenize→explode→semi-join→tf exchange ONCE for
    #     both consumers (plan-locked in tests/test_plans.py; the
    #     second corpus tokenize disappears: measured 1.64 → 1.40 s at
    #     sf0.1).  The final per-term count still partial-aggregates
    #     map-side, so the term-keyed shuffle carries one row per
    #     (partition, term) — stopword-skew-safe at 100 TB.
    dfreq = posting.groupBy("term").agg(
        F.count_if(F.col("tf") >= 1).alias("df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl").cast("double") / F.col("_avgdl"))
                )
            ).alias("_w"),
        )
    )
    return scored.groupBy("query_id", "id").agg(F.sum("_w").alias("score"))


def _score_ranked(scored: DataFrame, k: int, score_col: str) -> DataFrame:
    """Round-then-rank: 6-decimal score, (score desc, id) total order."""
    rounded = scored.withColumn(score_col, F.round(F.col(score_col), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("id").asc()
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    **kwargs,
) -> DataFrame:
    """Per-query BM25 top-k: ``(query_id, id, score, rank)``."""
    return _score_ranked(bm25_scores(docs, queries, **kwargs), k, "score")


def rrf_fuse(
    rankings: Iterable[DataFrame],
    k: int,
    *,
    k_const: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists ``(query_id, id, rank)``.

    ``score = Σ_legs 1/(k_const + rank)``; a doc absent from a leg
    contributes nothing for that leg (the standard convention — RRF
    needs no score normalization across legs, which is the point).
    Returns the fused per-query top-k ``(query_id, id, rrf, rank)``.
    """
    legs = [
        r.select(
            "query_id", "id", (F.lit(1.0) / (F.lit(k_const) + F.col("rank"))).alias("_c")
        )
        for r in rankings
    ]
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = legs[0]
    for leg in legs[1:]:
        contrib = contrib.unionByName(leg)
    fused = contrib.groupBy("query_id", "id").agg(F.sum("_c").alias("rrf"))
    return _score_ranked(fused, k, "rrf")


def hybrid_rrf_topk(
    docs: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    leg_k: int = 20,
    k_const: int = RRF_K,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_vector_col: str = "qvec",
    filter_ids: DataFrame | None = None,
    **bm25_kwargs,
) -> DataFrame:
    """Hybrid search: BM25 lexical leg + exact-cosine vector leg → RRF.

    ``queries`` carries BOTH modalities per row: ``(query_id, qterms,
    qvec)``; ``qvec`` may be null (lexical-only query — the vector leg
    simply has no rows for it, and RRF degrades gracefully).  Each leg
    retrieves its own top ``leg_k`` before fusion (retrieve-deep,
    fuse-shallow: ``leg_k ≥ k`` is the standard setting).

    ``filter_ids`` (one-column ``id`` frame): FILTERED hybrid search
    (tenant isolation, the RAG production shape) — the admissible set
    restricts BOTH legs BEFORE their per-leg top-k (a post-fusion
    filter would under-fill k and fuse against inadmissible ranks);
    BM25 statistics stay corpus-level per the filtered-lexical
    contract.
    """
    from .similarity import cosine_topk

    lex = bm25_topk(docs, queries, leg_k, filter_ids=filter_ids, **bm25_kwargs)
    # the BM25 leg may rename its query-id column; the vector leg must
    # follow the same rename or the two legs cannot fuse (ADVICE r05)
    qid = bm25_kwargs.get("query_id_col", "query_id")
    vq = queries.filter(F.col(query_vector_col).isNotNull()).select(
        F.col(qid).alias("query_id"), query_vector_col
    )
    vcorpus = vectors
    if filter_ids is not None:
        vcorpus = vcorpus.join(
            filter_ids.select(F.col("id").alias(id_col)), id_col, "left_semi"
        )
    vec = cosine_topk(
        vcorpus,
        vq,
        leg_k,
        id_col=id_col,
        vector_col=vector_col,
        query_vector_col=query_vector_col,
        round_scores=6,
    )
    return rrf_fuse([lex.select("query_id", "id", "rank"),
                     vec.select("query_id", "id", "rank")], k, k_const=k_const)


def hybrid_rrf_indexed_topk(
    spark,
    posting_path: str,
    ivf_path: str,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int,
    *,
    leg_k: int = 20,
    n_probe: int = 4,
    k_const: int = RRF_K,
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
    query_vector_col: str = "qvec",
    replicated: bool = False,
    filter_ids: DataFrame | None = None,
    cosine: bool = False,
) -> DataFrame:
    """Hybrid search served entirely from PERSISTED index tiers — the
    100 TB shape of :func:`hybrid_rrf_topk`, whose from-scratch legs
    re-scan the corpus per query batch.

    ``filter_ids``: FILTERED indexed hybrid — the admissible id set
    restricts both index legs pre-rank (semi joins on the pruned
    scans), matching ``hybrid_rrf_topk(filter_ids=)`` semantics.

    ``cosine=True``: the vector leg serves COSINE ranking from a
    ``write_cosine_ivf_index`` index (normalized-space L2 == cosine
    rank) — at full probe coverage the whole composition then equals
    the from-scratch ``hybrid_rrf_topk`` EXACTLY, both legs identical
    (tested), with ONE scoped exception: a ZERO-NORM query vector has
    no direction, so the cosine index excludes it (vector leg empty —
    the query degrades to lexical-only), while the from-scratch
    ``cosine_topk`` leg scores it 0.0 against everything and still
    fuses a vector leg for it.  Zero-norm embeddings do not occur in
    real corpora (ADVICE r06 notes the asymmetry; the exclusion
    contract lives in ``search_cosine_ivf_index``).  With
    ``cosine=False`` (an L2 index) the vector leg ranks by squared-L2,
    which matches cosine only for normalized embeddings.

    Determinism: both index legs rank on 6-decimal-ROUNDED scores
    (distance for L2, converted cosine for cosine=True) with an id
    tie-break — the same convention as the lexical/fused scores and
    the from-scratch hybrid's cosine leg, so a last-ulp cross-engine
    difference at the ``leg_k`` cutoff cannot flip fused-input
    membership in ANY of the three score spaces (VERDICT r06 item 6).

    - lexical leg: :func:`sources.posting_index.bm25_search_index` —
      reads only the queried terms' posting rows (term-pushdown scan,
      no document text);
    - vector leg: :func:`sources.ivf_index.search_ivf_index` — reads
      only the probed cells' partitions (``cell_id`` PartitionFilters),
      ranking by exact squared-L2 within the probe set.  RRF is
      rank-only, so an L2-ranked leg fuses cleanly with the BM25 leg
      (for normalized embeddings the L2 ranking IS the cosine ranking;
      at full probe coverage the leg equals exact kNN — tested).

    Queries carry both modalities per row (``query_id, qterms, qvec``);
    null ``qvec`` degrades that query to lexical-only, as in the
    from-scratch operator.
    """
    from ..sources.ivf_index import search_cosine_ivf_index, search_ivf_index
    from ..sources.posting_index import bm25_search_index

    lex = bm25_search_index(
        spark, posting_path, queries, leg_k,
        query_id_col=query_id_col, query_terms_col=query_terms_col,
        filter_ids=filter_ids,
    )
    vq = queries.filter(F.col(query_vector_col).isNotNull()).select(
        F.col(query_id_col).alias("query_id"), query_vector_col
    )
    vsearch = search_cosine_ivf_index if cosine else search_ivf_index
    vec = vsearch(
        spark, ivf_path, vq, leg_k, centroids,
        n_probe=n_probe, replicated=replicated,
        query_vector_col=query_vector_col,
        filter_ids=filter_ids,
        round_scores=6,
    )
    return rrf_fuse(
        [lex.select("query_id", "id", "rank"), vec.select("query_id", "id", "rank")],
        k,
        k_const=k_const,
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    *,
    lambda_: float = 0.5,
    relevance_col: str = "cosine",
    vector_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversity re-rank (Carbonell &
    Goldstein 1998) of per-query candidate lists.

    Input: ``(query_id, id, <relevance_col>, <vector_col>)`` — the
    top-N output of a retrieval stage joined back to its vectors.
    Greedy: repeatedly pick ``argmax λ·rel(d) − (1−λ)·max_{s∈S}
    cos(d, s)`` (ties → smallest id), S the already-selected set.

    Inherently sequential per query → ``applyInPandas`` per query_id;
    the Python surface is bounded by the candidate list (N ≪ corpus),
    the corpus itself is never touched.  Cosine between candidates is
    one normalized Gram matrix per group (BLAS), computed once.
    """
    import numpy as np
    import pandas as pd

    out_schema = "query_id long, id long, relevance double, mmr double, rank int"

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        n = len(pdf)
        kk = min(k, n)
        x = np.stack(pdf[vector_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        xn = x / norms[:, None]
        sim = xn @ xn.T  # (n, n) candidate-candidate cosine
        rel = pdf[relevance_col].to_numpy().astype(np.float64)
        ids = pdf["id"].to_numpy()
        selected: list[int] = []
        max_sim = np.full(n, -np.inf)
        chosen_scores: list[float] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(kk):
            penalty = np.where(np.isinf(max_sim), 0.0, max_sim)
            mmr = lambda_ * rel - (1.0 - lambda_) * penalty
            mmr_masked = np.where(avail, mmr, -np.inf)
            best = mmr_masked.max()
            # deterministic tie-break: smallest id among the argmaxes
            tied = np.flatnonzero(mmr_masked == best)
            pick = tied[np.argmin(ids[tied])]
            selected.append(pick)
            chosen_scores.append(float(mmr[pick]))
            avail[pick] = False
            max_sim = np.maximum(max_sim, sim[:, pick])
        sel = np.array(selected, dtype=int)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].to_numpy()[sel],
                "id": ids[sel],
                "relevance": rel[sel],
                "mmr": chosen_scores,
                "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
            }
        )

    return (
        candidates.select("query_id", "id", F.col(relevance_col).alias(relevance_col), vector_col)
        .groupBy("query_id")
        .applyInPandas(greedy, schema=out_schema)
    )


def multi_index_topk(
    legs: list[tuple[str, DataFrame, float]],
    k: int,
) -> DataFrame:
    """Cross-index search with per-index boost (ES multi-index
    querying: ``GET idx_a,idx_b/_search`` with ``indices_boost``),
    round 11 — one ranked page over SEVERAL corpora, each searched by
    its own leg with its OWN corpus statistics (the real cross-index
    subtlety: idf/avgdl are per-index, so scores are only comparable
    after the caller's chosen boosts — exactly ES's stance).

    ``legs``: ``(index_name, hits, boost)`` where ``hits`` is that
    index's k-bounded ``(query_id, id, score)``.  A document id may
    appear under several indexes and stays DISTINCT per index (the ES
    result identity is (index, id)).  Returns ``(query_id, index, id,
    score, rank)`` ranked by boosted rounded score, ties broken on
    (index asc, id asc) — the repo determinism convention widened by
    the index dimension.

    Scale: input legs are k-bounded by contract, so this is a union
    of |queries|·k·|legs| rows and one partitioned window — the
    fan-out to each index's plan is where the real work lives, and
    those plans are unchanged.
    """
    if not legs:
        raise ValueError("multi_index_topk requires at least one leg")
    if k < 1:
        raise ValueError("k must be >= 1")
    names = [n for n, _, _ in legs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate index names: {names}")
    parts = []
    for name, hits, boost in legs:
        parts.append(
            hits.select(
                "query_id",
                F.lit(name).alias("index"),
                "id",
                (F.col("score") * F.lit(float(boost))).alias("score"),
            )
        )
    allhits = parts[0]
    for p in parts[1:]:
        allhits = allhits.unionByName(p)
    rounded = allhits.withColumn("score", F.round("score", 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("index").asc(), F.col("id").asc()
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
