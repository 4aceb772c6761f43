"""More-like-this: document-as-query retrieval, round 10 — the fourth
query-understanding verb.  Fuzzy reshapes the query's SPELLING,
autocomplete its PREFIX, PRF its TERM SET from feedback evidence; MLT
drops the textual query entirely and asks "find documents like THIS
one" — the related-items verb every search UI ships (Lucene/
Elasticsearch ``more_like_this``; the reference's dense analog is
querying `src/index/vector_shard.cc`'s flat matrix with a stored row
as the query vector, which ``knn``/``cosine_topk`` already cover —
this is its lexical sibling).

Classic Lucene shape, two passes over public semantics only:

1. **representative-term selection** — score every term of the seed
   document by its tf–idf weight (``operators.sparse.sparse_encode``,
   so MLT/PRF/the sparse leg share ONE weighting convention), gate by
   corpus document frequency (``min_df`` drops hapax noise that would
   match nothing, ``max_df`` drops stopword-frequency terms that
   would match everything — Lucene's min_doc_freq/max_doc_freq), keep
   the per-seed top ``max_query_terms`` by (rounded weight desc, term
   asc — the repo's summed-double determinism convention);
2. **retrieval** — the unmodified BM25 scorer with the selected terms
   as the query, seed doc excluded from its own results (a doc is
   trivially most-like itself).

Spark-first shape: pass 1 is one corpus encode (or a pre-encoded
posting frame — the operator takes triples, so the persisted sparse
index's postings slot in) with the seed restriction LEFT-SEMI below
the per-seed ranking, so only seed docs' postings ever reach the
selection window; pass 2 is ``bm25_scores`` unchanged (broadcast
query vocabulary, semi-restriction below the tf aggregate — the
plan-locked shape).  Both passes are deterministic in the corpus →
exactly SQL-replayable, approximation-free.

Scale (100 TB): seeds are a handful of ids by contract; their
postings are |seed|·dl rows after the semi join — the selection
window partitions on query_id over that bounded set, never the
corpus.  df gates read the SAME df aggregate the encoder already
computes (no extra scan).  The retrieval pass inherits BM25's locked
plan; at serving scale both passes read persisted indexes (sparse
index postings for pass 1, posting index for pass 2) — the
from-scratch form here exists to carry the oracle, like ``bm25_topk``
vs ``bm25_index_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .retrieval import _score_ranked, bm25_scores
from .sparse import sparse_encode


def mlt_select_terms(
    doc_postings: DataFrame,
    seeds: DataFrame,
    *,
    max_query_terms: int = 10,
    min_df: int = 1,
    max_df: int | None = None,
    seed_id_col: str = "seed_id",
) -> DataFrame:
    """Representative terms per seed doc — ``(query_id, term)``.

    ``doc_postings``: encoded ``(id, term, weight)`` triples (any
    upstream encoder; ``sparse_encode`` in the from-scratch form).
    ``seeds``: one column of seed doc ids.  Terms are gated by corpus
    df computed from the postings themselves (triples are unique on
    ``(id, term)``, so df is a plain per-term count), then the top
    ``max_query_terms`` per seed are kept by (6-decimal-rounded weight
    desc, term asc).
    """
    if max_query_terms < 1:
        raise ValueError("max_query_terms must be >= 1")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    if max_df is not None and max_df < min_df:
        raise ValueError("max_df must be >= min_df")
    seed_ids = seeds.select(F.col(seed_id_col).alias("id")).distinct()
    mine = doc_postings.join(F.broadcast(seed_ids), "id", "left_semi")
    # corpus-level df, from the full postings (the gate is about how
    # the term behaves in the CORPUS, not in the seed set).  The seed
    # postings are the broadcast side: |seeds|·dl rows vs one df row
    # per VOCABULARY term — at corpus scale the vocabulary is the big
    # side, so the tiny seed frame ships to it, never the reverse.
    dfreq = doc_postings.groupBy("term").agg(F.count("*").alias("_df"))
    gated = dfreq.join(F.broadcast(mine), "term").filter(
        F.col("_df") >= min_df
    )
    if max_df is not None:
        gated = gated.filter(F.col("_df") <= max_df)
    w = Window.partitionBy("id").orderBy(
        F.round("weight", 6).desc(), F.col("term").asc()
    )
    return (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_query_terms)
        .select(F.col("id").alias("query_id"), "term")
    )


def bm25_mlt_topk(
    docs: DataFrame,
    seeds: DataFrame,
    k: int,
    *,
    max_query_terms: int = 10,
    min_df: int = 1,
    max_df: int | None = None,
    include_seed: bool = False,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    seed_id_col: str = "seed_id",
) -> DataFrame:
    """More-like-this top-k — ``(query_id, id, score, rank)`` where
    ``query_id`` is the seed doc id (see module docstring).

    The seed doc is excluded from its own result list BEFORE ranking
    (``include_seed=True`` keeps it — it ranks first in practice,
    which is the sanity check the tests pin).  A seed whose every
    term is df-gated away simply returns no rows, like an empty
    query.
    """
    enc = sparse_encode(docs, doc_id_col=doc_id_col, text_col=text_col)
    sel = mlt_select_terms(
        enc, seeds,
        max_query_terms=max_query_terms, min_df=min_df, max_df=max_df,
        seed_id_col=seed_id_col,
    )
    queries = sel.groupBy("query_id").agg(
        F.collect_set("term").alias("qterms")
    )
    scored = bm25_scores(
        docs, queries,
        doc_id_col=doc_id_col, text_col=text_col,
        query_id_col="query_id", query_terms_col="qterms",
    )
    if not include_seed:
        scored = scored.filter(F.col("id") != F.col("query_id"))
    return _score_ranked(scored, k, "score")
