"""Persisted inverted (posting) index for BM25 — the lexical analog of
the IVF/PQ storage tiers.

``operators.retrieval.bm25_scores`` is correct and broadcast-clean, but
as a from-scratch plan it re-derives tokenization/postings in every
branch (stats, postings, df) — each branch is another scan of the
documents corpus.  At 100 TB the answer is the same as for vectors:
pay the scan ONCE at build time, serve queries from the derived
structure.

Layout (all parquet under one root):

- ``postings/`` — ``(term, id, tf, dl)``, repartitioned on ``term`` and
  sorted by ``term`` within partitions, so a query's
  ``term IN (…)`` predicate prunes row groups via min/max stats — the
  columnar analog of seeking a term's posting list.
- ``terms/``    — ``(term, df)``: per-term document frequency (the idf
  input), tiny relative to postings (one row per distinct term).
- ``stats/``    — one row: ``(n_docs, avgdl)``.

``bm25_search_index`` then touches NO document text at query time: it
reads only the queried terms' posting rows (pushed-down scan), joins
the broadcast df/stats, scores, and ranks — per-query cost scales with
posting-list length, not corpus size.  Scores are IDENTICAL to the
from-scratch ``bm25_topk`` (same formula over the same precomputed
numbers; tested exactly).

Freshness follows the engine's snapshot discipline: the index is a
derived tier rebuilt (or incrementally appended) at compaction cadence,
like the IVF/PQ tiers — not a per-write maintained structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.retrieval import BM25_B, BM25_K1

#: partition count for the postings layout; at real scale size this so
#: each partition's row groups stay within maxPartitionBytes
POSTING_PARTITIONS = 8


def write_posting_index(
    docs: DataFrame,
    path: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
    num_partitions: int = POSTING_PARTITIONS,
) -> None:
    """One corpus scan → postings + term df + corpus stats, persisted."""
    toks = docs.select(
        F.col(doc_id_col).alias("id"), tokens(text_col).alias("_toks")
    )
    posting = (
        toks.select(
            "id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        .groupBy("term", "id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    # term-clustered layout: the shuffle on term happens once, at build;
    # sorting within partitions gives per-row-group min/max that a
    # term IN (...) scan predicate skips on
    (
        posting.repartition(num_partitions, "term")
        .sortWithinPartitions("term")
        .write.mode(mode)
        .parquet(f"{path}/postings")
    )
    spark = docs.sparkSession
    pst = spark.read.parquet(f"{path}/postings")
    (
        pst.groupBy("term")
        .agg(F.count_distinct("id").alias("df"))
        .write.mode(mode)
        .parquet(f"{path}/terms")
    )
    (
        pst.select("id", "dl")
        .distinct()
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(F.col("dl").cast("double")).alias("avgdl"),
        )
        .write.mode(mode)
        .parquet(f"{path}/stats")
    )


def bm25_search_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    query_id_col: str = "query_id",
    query_terms_col: str = "qterms",
) -> DataFrame:
    """BM25 top-k served from the persisted index — no document text is
    read; the postings scan carries a pushed-down ``term IN (…)``
    literal predicate (query vocabularies are RPC-small by the same
    contract as vector query batches), so unqueried terms' row groups
    are skipped."""
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("term"),
    )
    terms = sorted({r["term"] for r in qt.select("term").distinct().collect()})
    posting = spark.read.parquet(f"{path}/postings").filter(
        F.col("term").isin(terms)
    )
    dfreq = spark.read.parquet(f"{path}/terms").filter(F.col("term").isin(terms))
    stats = spark.read.parquet(f"{path}/stats")
    scored = (
        posting.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
                )
            ).alias("_w"),
        )
        .groupBy("query_id", "id")
        .agg(F.round(F.sum("_w"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
