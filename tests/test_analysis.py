"""Analysis chain (functions/analysis.py): S-stemmer rules and
exceptions, stopword/length gates, text round-trip, retrieval
composition.  Exactness vs DuckDB is the bm25_stemmed_topk row in
test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.functions.analysis import (
    STOPWORDS_EN,
    analyze_text,
    analyze_tokens,
    s_stem,
)


def _stem_one(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "t string")
    return {
        r["t"]: r["s"] for r in df.select("t", s_stem("t").alias("s")).collect()
    }


def test_s_stem_rules_and_exceptions(spark):
    got = _stem_one(spark, [
        "flies", "bodies",              # rule 1: ies -> y
        "eies", "aies",                 # rule 1 exceptions (verbatim)
        "tables", "classes",            # rule 2: es -> e (drop s)
        "goes", "sees",                 # rule 2 exceptions (oes / ees)
        "cats", "windows",              # rule 3: s -> ''
        "glass", "bus",                 # rule 3 exceptions (ss / us)
        "is", "as",                     # < 3 chars: untouched
        "table",                        # no suffix: untouched
    ])
    assert got["flies"] == "fly" and got["bodies"] == "body"
    assert got["eies"] == "eies" and got["aies"] == "aies"
    assert got["tables"] == "table" and got["classes"] == "classe"
    assert got["goes"] == "goes" and got["sees"] == "sees"
    assert got["cats"] == "cat" and got["windows"] == "window"
    assert got["glass"] == "glass" and got["bus"] == "bus"
    assert got["is"] == "is" and got["as"] == "as"
    assert got["table"] == "table"


def test_analyze_chain_order_and_gates(spark):
    df = spark.createDataFrame(
        [("The cats and a dog saw tables!",)], "text string"
    )
    toks = df.select(
        analyze_tokens(
            "text", stopwords=STOPWORDS_EN, stem=True, min_len=4
        ).alias("t")
    ).collect()[0]["t"]
    # "the"/"and"/"a" stopped (surface form, before stemming),
    # "dog"/"saw" length-gated, plurals stemmed AFTER the gates
    assert toks == ["cat", "table"]
    # NB: "cats" passed the min_len=4 gate (gates see the surface form)


def test_analyze_text_round_trips_through_tokenizer(spark):
    from distributed_vector_search_system_spark.functions.text import tokens

    df = spark.createDataFrame(
        [("Tables, CATS; flies the end",)], "text string"
    )
    out = df.select(
        analyze_text("text", stopwords=STOPWORDS_EN, stem=True).alias("a")
    ).select(F.col("a"), tokens("a").alias("t")).collect()[0]
    assert out["a"] == "table cat fly end"
    assert out["t"] == ["table", "cat", "fly", "end"]


def test_stemmed_retrieval_matches_singular_corpus(spark):
    """The composition the registry row exercises at fixture scale:
    plural queries hit singular docs through the analyzed index."""
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(1, "the table and the window"), (2, "a cat saw a dog")],
        "doc_id long, text string",
    )
    analyzed = docs.withColumn(
        "text", analyze_text("text", stopwords=STOPWORDS_EN, stem=True)
    )
    q = spark.createDataFrame(
        [(0, ["tables", "windows"])], "query_id long, qterms array<string>"
    ).select(
        "query_id", F.transform("qterms", s_stem).alias("qterms")
    )
    got = bm25_topk(analyzed, q, 5).collect()
    assert [r["id"] for r in got] == [1]
    # without analysis the plural query matches nothing
    assert bm25_topk(
        docs,
        spark.createDataFrame(
            [(0, ["tables", "windows"])], "query_id long, qterms array<string>"
        ),
        5,
    ).count() == 0


def test_analyzer_adds_no_exchange(spark):
    """The chain is pure map-side expression work — analyzing a scan
    must introduce no Exchange."""
    docs = spark.createDataFrame(
        [(1, "tables and cats")], "doc_id long, text string"
    )
    plan = (
        docs.withColumn(
            "text", analyze_text("text", stopwords=STOPWORDS_EN, stem=True)
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
