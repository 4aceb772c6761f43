"""Persisted learned-sparse index: term-clustered weighted postings.

The storage tier under ``operators/sparse.py`` — the same role
``posting_index.py`` plays for BM25 and ``ivf_index.py`` for dense
vectors: pay the corpus scan + encoding ONCE at build time, serve
queries from a layout whose read cost scales with the query's posting
mass, not the corpus.

Layout (parquet under one root):

- ``postings/`` — ``(term, id, weight)``, repartitioned on ``term``
  and sorted by ``term`` within partitions: a query's ``term IN (…)``
  predicate prunes row groups on min/max stats (the columnar posting
  seek, same as posting_index.py).
- ``terms/``    — ``(term, df, max_w)``: document frequency plus the
  term's maximum posting weight.  ``max_w`` is what makes query-time
  impact pruning free — ``weight ≥ frac·max_w`` needs no second scan
  and no per-term aggregate at query time (operators/sparse.py
  ``prune_postings`` is the from-scratch form).
- ``stats/``    — one row ``(n_docs)``.

Exactness contract: built from the same corpus, ``sparse_search_index``
returns IDENTICAL rows to the from-scratch ``sparse_topk`` over
``sparse_encode`` output (same weights persisted, same score join,
same round-then-rank; tested exactly in tests/test_sparse.py).  With
``min_impact_frac`` it returns identical rows to the from-scratch
pruned pipeline — the approximation is deterministic in the weights,
so even the pruned tier keeps an exact oracle.

Index-time pruning (``write_sparse_index(min_impact_frac=...)``)
physically drops low-impact postings — the 100 TB trade: the stored
posting mass shrinks by the pruned fraction and every query gets the
IO cut, at the recall cost measured in the bench recall section.

Freshness follows the repo's snapshot discipline: a derived tier
rebuilt at compaction cadence (the write-once contract the other index
sources started with); the merge-on-read mutable-store treatment the
BM25 tier got in round 7 (MutablePostingIndexStore) is the natural
extension and is deliberately NOT duplicated here until a user-shaped
row needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sparse import sparse_encode, sparse_scores
from ..operators.retrieval import _score_ranked

#: default partition count for the postings layout (same sizing note as
#: posting_index.POSTING_PARTITIONS: at real scale, size so row groups
#: stay within maxPartitionBytes)
SPARSE_PARTITIONS = 8


def write_sparse_index(
    docs: DataFrame,
    path: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_impact_frac: float = 0.0,
    mode: str = "overwrite",
    num_partitions: int = SPARSE_PARTITIONS,
) -> None:
    """Encode + persist: one corpus scan → weighted postings, term
    stats, corpus stats.

    ``min_impact_frac`` > 0 prunes postings at build time (weight ≥
    frac · term max).  ``terms/`` records df and max_w from the FULL
    (pre-prune) postings — df because idf-style consumers need true
    document frequency, max_w because the pruning threshold must be
    stable under re-pruning (pruning twice at the same frac is a
    no-op, and a query-time frac composes with the build-time one on
    the same scale).
    """
    postings = sparse_encode(docs, doc_id_col=doc_id_col, text_col=text_col)
    spark = docs.sparkSession
    # stage the encoded postings once (the terms aggregate and the
    # clustered rewrite would otherwise each re-run the encoder's
    # two-shuffle subtree)
    staged = f"{path}/_stage_postings"
    postings.write.mode(mode).parquet(staged)
    enc = spark.read.parquet(staged)
    terms = enc.groupBy("term").agg(
        F.count("*").alias("df"), F.max("weight").alias("max_w")
    )
    terms.write.mode(mode).parquet(f"{path}/terms")
    kept = enc
    if min_impact_frac > 0.0:
        kept = enc.join(
            F.broadcast(spark.read.parquet(f"{path}/terms")), "term"
        ).filter(
            F.col("weight") >= F.lit(float(min_impact_frac)) * F.col("max_w")
        ).select("term", "id", "weight")
    (
        kept.repartition(num_partitions, "term")
        .sortWithinPartitions("term")
        .write.mode(mode)
        .parquet(f"{path}/postings")
    )
    docs.agg(F.count("*").alias("n_docs")).write.mode(mode).parquet(
        f"{path}/stats"
    )
    # drop the stage (best-effort; the index is already complete)
    try:
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
    except Exception:
        pass


def sparse_search_index(
    spark: SparkSession,
    path: str,
    query_postings: DataFrame,
    k: int,
    *,
    min_impact_frac: float = 0.0,
) -> DataFrame:
    """Top-k weighted dot product served from the persisted index.

    ``query_postings`` is ``(query_id, term, weight)`` (any encoder;
    ``operators.sparse.sparse_encode_queries`` is the in-container
    one).  The query vocabulary is collected driver-side (small by
    contract — it feeds the pushed-down ``term IN (…)`` predicate,
    which must be a literal to prune row groups), postings are read
    for those terms only, optionally impact-filtered against the
    broadcast ``terms/`` stats, scored and round-then-ranked.
    """
    qp = query_postings.select("query_id", "term", "weight")
    vocab = [r["term"] for r in qp.select("term").distinct().collect()]
    if not vocab:
        empty = spark.createDataFrame(
            [], "query_id long, id long, score double, rank int"
        )
        return empty
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("term").isin(vocab)
    )
    if min_impact_frac > 0.0:
        stats = (
            spark.read.parquet(f"{path}/terms")
            .filter(F.col("term").isin(vocab))
            .select("term", "max_w")
        )
        postings = (
            postings.join(F.broadcast(stats), "term")
            .filter(
                F.col("weight")
                >= F.lit(float(min_impact_frac)) * F.col("max_w")
            )
            .select("term", "id", "weight")
        )
    return _score_ranked(sparse_scores(postings, qp), k, "score")
