"""Benchmark decontamination (operators/contamination.py): overlap
arithmetic, gates, the verb, plan shape.  Exactness vs DuckDB is the
``contamination_overlap`` / ``decontaminate_docs`` rows in
test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.contamination import (
    contaminated_ids,
    contamination_overlap,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a quick brown fox runs fast"),
        (3, "entirely unrelated text about spark plans"),
        (4, "the quick brown fox jumps again today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    rows = [
        (100, "quick brown fox jumps"),
        (101, "spark plans"),            # shorter than n=3: no shingles
        (102, "nothing matches this item"),
    ]
    return spark.createDataFrame(rows, "bench_id long, text string")


def test_overlap_counts_shared_distinct_shingles(spark, corpus, bench):
    out = contamination_overlap(corpus, bench, n=3)
    got = {
        (r["doc_id"], r["bench_id"]): (r["overlap"], r["bench_shingles"])
        for r in out.collect()
    }
    # item 100 has 2 trigram shingles: "quick brown fox", "brown fox jumps"
    assert got[(1, 100)] == (2, 2)
    assert got[(4, 100)] == (2, 2)
    assert got[(2, 100)] == (1, 2)   # only "quick brown fox"
    # item 101 is too short for trigrams; item 102 matches nothing
    assert not any(b in (101, 102) for (_, b) in got)


def test_frac_is_overlap_over_item_size(spark, corpus, bench):
    out = contamination_overlap(corpus, bench, n=3)
    row = out.filter(
        (F.col("doc_id") == 2) & (F.col("bench_id") == 100)
    ).collect()[0]
    assert row["frac"] == pytest.approx(0.5)


def test_contaminated_ids_gates(spark, corpus, bench):
    full = contaminated_ids(corpus, bench, n=3, min_overlap=1)
    assert {r["doc_id"] for r in full.collect()} == {1, 2, 4}
    strict = contaminated_ids(corpus, bench, n=3, min_overlap=2)
    assert {r["doc_id"] for r in strict.collect()} == {1, 4}
    # relative gate ORs in: doc 2 covers 50% of item 100
    rel = contaminated_ids(
        corpus, bench, n=3, min_overlap=2, min_frac=0.5
    )
    assert {r["doc_id"] for r in rel.collect()} == {1, 2, 4}


def test_decontaminate_keeps_clean_docs_and_columns(spark, corpus, bench):
    out = decontaminate(corpus, bench, n=3, min_overlap=1)
    assert out.columns == corpus.columns
    assert {r["doc_id"] for r in out.collect()} == {3}


def test_no_benchmark_overlap_is_identity(spark, corpus):
    empty_bench = corpus.sparkSession.createDataFrame(
        [(1, "zz yy xx ww vv")], "bench_id long, text string"
    )
    out = decontaminate(corpus, empty_bench, n=3)
    assert out.count() == corpus.count()


def test_validation(spark, corpus, bench):
    with pytest.raises(ValueError):
        contamination_overlap(corpus, bench, n=0)
    with pytest.raises(ValueError):
        contaminated_ids(corpus, bench, min_overlap=0)
    with pytest.raises(ValueError):
        contaminated_ids(corpus, bench, min_frac=1.5)


def test_plan_broadcasts_benchmark_never_self_joins(spark, sf_smoke):
    """The 100 TB shape: the benchmark side broadcasts; the corpus is
    never self-joined and never sort-merge shuffled on shingles."""
    from distributed_vector_search_system_spark.functions.text import tokens
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 3).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(tokens("text"), 1, 10), " ").alias("text"),
    )
    out = contamination_overlap(docs, bench, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
