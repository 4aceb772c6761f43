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

from ..functions.distance import cosine_from_norms, dot_product, l2_norm


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
    id) on the rounded score.

    Cosine metric: per-side norms are projected BEFORE the token-pair
    join (functions.distance.cosine_from_norms) — one fold per token
    row instead of two extra folds per (doc token, query token) pair;
    bit-identical values."""
    if metric not in ("cosine", "dot"):
        raise ValueError(f"metric must be 'cosine' or 'dot', got {metric!r}")
    qtok = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(F.col(query_vectors_col)).alias("_qpos", "_qv"),
    )
    if metric == "cosine":
        dv = doc_vectors.select(
            F.col(doc_id_col).alias("id"),
            F.col(vector_col).alias("_dv"),
            l2_norm(F.col(vector_col)).alias("_dn"),
        )
        qtok_n = qtok.withColumn("_qn", l2_norm(F.col("_qv")))
        scored = dv.join(F.broadcast(qtok_n), how="cross").select(
            "query_id",
            "_qpos",
            "id",
            cosine_from_norms(
                F.col("_dv"), F.col("_qv"), F.col("_dn"), F.col("_qn")
            ).alias("_s"),
        )
    else:
        scored = doc_vectors.join(F.broadcast(qtok), how="cross").select(
            "query_id",
            "_qpos",
            F.col(doc_id_col).alias("id"),
            dot_product(F.col(vector_col), F.col("_qv")).alias("_s"),
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


#: token-leg id = query_id * _TOKEN_LEG + token position; 2^20 tokens
#: per query bounds any realistic late-interaction encoder (ColBERT
#: uses 32) while keeping the composed id well inside int64
_TOKEN_LEG = 1 << 20


def maxsim_ivf_topk(
    spark,
    token_index_path: str,
    token_store_path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    *,
    n_probe: int = 4,
    gather: int = 20,
    doc_id_col: str = "doc_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vectors_col: str = "qvecs",
    round_scores: int = 6,
    materialize_candidates: bool = True,
    max_candidate_ids: int = 1_000_000,
) -> DataFrame:
    """Two-stage MaxSim — the 100 TB serving shape of
    :func:`maxsim_topk` (the ColBERT gather-then-rescore plan),
    composed from three layouts this engine already serves:

    1. **Gather** (``sources/ivf_index.write_cosine_ivf_index`` over
       the TOKEN vectors, carrying ``doc_id_col``): each query token
       routes through the cosine IVF index independently — probed-cell
       partition pruning bounds its scan — and keeps its ``gather``
       best DOCUMENTS by best-token cosine (``replicated=True``
       collapses a doc's multiple token hits map-side).  Candidate
       docs per query = union over its tokens: ≤ tokens × ``gather``.
    2. **Re-score** (``sources/rerank_store.write_rerank_store`` over
       the same token rows, bucketed by ``doc_id_col``): the
       candidates' FULL token sets come back through one DPP-pruned
       gather (``bounded_gather`` — only buckets holding candidate
       docs open), then the exact MaxSim aggregate runs on
       candidate-bounded rows only.

    Both stages' IO is bounded independently of corpus size (probed
    cells; candidate buckets) — the exact operator's full-scan cost is
    paid by neither.  At full probe coverage with ``gather`` ≥ the
    document count, results equal :func:`maxsim_topk` exactly over the
    zero-norm-free corpus (tested; zero-norm tokens have no direction
    and are excluded by the cosine index contract on both sides).

    Determinism: the gather cut ranks on 6-decimal-rounded cosine with
    doc-id tie-break (the hybrid-leg convention), the final ranking on
    the ``round_scores``-rounded MaxSim sum — both replayable in SQL
    (registry row ``maxsim_ivf_topk``).

    ``materialize_candidates=True`` (the serving/bench default) runs
    eager Spark jobs at DataFrame-construction time (a localCheckpoint
    of the k-bounded candidate frame + one driver collect of its ids),
    and localCheckpoint output is NOT fault-tolerant: on a real cluster
    a lost executor makes the checkpointed blocks unrecoverable and the
    query must be rebuilt (ADVICE r13).  Library callers embedding this
    frame in a larger lazy plan, or running where executor loss is
    routine, should pass ``materialize_candidates=False`` — the single
    lazy DPP-pruned plan, fully recomputable from storage.

    ``query_id`` contract: a NON-NEGATIVE integral column (< 2^43).
    Query-token legs route through the shared IVF machinery under the
    composed id ``query_id * 2^20 + token_pos``; a non-integral column
    raises, a negative id would divide back to the wrong query."""
    from ..sources.ivf_index import search_cosine_ivf_index
    from ..sources.rerank_store import bounded_gather

    # the composed token-leg id (query_id * 2^20 + pos) is only
    # reversible for NON-NEGATIVE INTEGER query ids: `div` truncates
    # toward zero, so a negative id reconstructs to the wrong query,
    # and a string id nulls out.  Enforce the integral type here; the
    # non-negativity half is the documented caller contract (ADVICE r08).
    _qid_type = queries.schema[query_id_col].dataType.simpleString()
    if _qid_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"maxsim_ivf_topk requires an integral {query_id_col!r} "
            f"column (got {_qid_type}): the per-token leg id composes "
            f"query_id * {_TOKEN_LEG} + pos and must divide back exactly"
        )

    qtok = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(F.col(query_vectors_col)).alias("_qpos", "_qv"),
    )
    legs = qtok.select(
        (F.col("query_id") * _TOKEN_LEG + F.col("_qpos")).alias("query_id"),
        F.col("_qv").alias("qvec"),
    )
    hits = search_cosine_ivf_index(
        spark, token_index_path, legs, gather, centroids,
        n_probe=n_probe, id_col=doc_id_col,
        replicated=True, round_scores=6,
    )
    cands = hits.select(
        # integral div: exact for any int64 leg id (never a double quotient)
        F.expr(f"query_id div {_TOKEN_LEG}").alias("query_id"),
        F.col("id").alias(doc_id_col),
    ).distinct()
    # The candidate frame feeds TWO consumers — the token-store gather
    # and the re-score pair join — and each consumer re-evaluates the
    # whole gather subtree (the IVF probe + per-token window cut) in
    # its own plan branch.  Materialize it once: it is k-bounded by
    # construction (≤ query tokens × gather (query_id, doc_id) pairs,
    # never corpus-sized), so the checkpoint is a tiny local write that
    # halves the expensive stage-1 work and truncates the combined
    # plan.  localCheckpoint (not persist): a fresh invocation always
    # recomputes from the parquet inputs — nothing is memoized across
    # calls.  The store fetch then switches from the DPP form
    # (bounded_gather) to the STATIC literal form (lookup_ids): an
    # RDD-backed build side no longer triggers Spark's dynamic
    # partition pruning, and the ids are already materialized
    # driver-adjacent, so the literal ``id_bucket IN (…)``
    # PartitionFilter is both safe (k-bounded list) and strictly
    # earlier pruning than DPP's runtime subquery.
    # ``materialize_candidates=False`` keeps the single lazy composed
    # plan (bounded_gather + DPP — used by the plan-shape tests to lock
    # both phases' pruning in one explain, and by callers that must not
    # run an eager job at construction).
    if materialize_candidates:
        from ..sources.rerank_store import lookup_ids

        cands = cands.localCheckpoint(eager=True)
        ids = [r[0] for r in cands.select(doc_id_col).distinct().collect()]
        # enforce the k-bounded claim instead of assuming it (VERDICT
        # r13 item 8): the list is ≤ queries × tokens × gather by
        # construction, and the literal-IN store fetch (plus this
        # driver-held list) only makes sense at that size.  A breach
        # means the caller's query set is corpus-sized — the DPP form
        # (materialize_candidates=False) is the right plan there.
        if len(ids) > max_candidate_ids:
            raise ValueError(
                f"maxsim_ivf_topk materialized {len(ids):,} candidate "
                f"ids (> max_candidate_ids={max_candidate_ids:,}); the "
                "candidate set is supposed to be k-bounded (queries × "
                "tokens × gather).  Pass materialize_candidates=False "
                "(lazy DPP gather) for corpus-sized query sets, or "
                "raise max_candidate_ids deliberately."
            )
        toks = lookup_ids(spark, token_store_path, ids, id_col=doc_id_col)
    else:
        toks = bounded_gather(
            spark, token_store_path, cands.select(doc_id_col), id_col=doc_id_col
        )
    return score_pairs(
        toks, cands, qtok, k,
        doc_id_col=doc_id_col, vector_col=vector_col,
        round_scores=round_scores,
    )


def score_pairs(
    toks: DataFrame,
    cands: DataFrame,
    qtok: DataFrame,
    k: int,
    *,
    doc_id_col: str = "doc_id",
    vector_col: str = "embedding",
    round_scores: int = 6,
) -> DataFrame:
    """Exact MaxSim over explicit (query, doc) candidate pairs — the
    shared re-scoring stage of every gathered serving path
    (:func:`maxsim_ivf_topk`; the mutable token store's merge-on-read
    search).  ``toks``: token rows ``(doc_id_col, vector_col, …)``
    restricted to candidate docs; ``cands``: the (contractually
    query-bounded, broadcast) ``(query_id, doc_id_col)`` pairs;
    ``qtok``: exploded query tokens ``(query_id, _qpos, _qv)``.  Same
    two map-side-combinable aggregates and rounded ranking as
    :func:`maxsim_topk`; per-side norms are projected before the pair
    joins (cosine_from_norms — bit-identical, one fold per pair)."""
    toks_n = toks.select(
        F.col(doc_id_col),
        F.col(vector_col).alias("_dv"),
        l2_norm(F.col(vector_col)).alias("_dn"),
    )
    qtok_n = qtok.withColumn("_qn", l2_norm(F.col("_qv")))
    pair = (
        toks_n.join(F.broadcast(cands), on=doc_id_col)
        .join(F.broadcast(qtok_n), on="query_id")
        .select(
            "query_id",
            "_qpos",
            F.col(doc_id_col).alias("id"),
            cosine_from_norms(
                F.col("_dv"), F.col("_qv"), F.col("_dn"), F.col("_qn")
            ).alias("_s"),
        )
    )
    per_token = pair.groupBy("query_id", "_qpos", "id").agg(
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
