"""Repetition quality signals (functions/repetition.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.functions.repetition import (
    dup_line_frac,
    dup_paragraph_frac,
    repetition_flagged,
    top_bigram_frac,
    word_bigrams,
)


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        dup_line_frac("text").alias("l"),
        dup_paragraph_frac("text").alias("p"),
        top_bigram_frac("text").alias("g"),
        repetition_flagged("text").alias("flag"),
    ).first()


def test_clean_text_scores_low(spark):
    r = _one(spark, "alpha beta gamma\n\ndelta epsilon zeta\n\neta theta iota")
    assert r["l"] == 0.0 and r["p"] == 0.0
    assert r["g"] == pytest.approx(1 / 8)  # 8 bigrams, all distinct
    assert not r["flag"]


def test_duplicate_lines_flagged(spark):
    text = "\n".join(["same line"] * 9 + ["unique"])
    r = _one(spark, text)
    assert r["l"] == pytest.approx(0.8)  # 10 lines, 2 distinct
    assert r["flag"]


def test_duplicate_paragraphs_flagged(spark):
    text = "\n\n".join(["para one here"] * 3 + ["another paragraph"])
    r = _one(spark, text)
    assert r["p"] == pytest.approx(0.5)  # 4 paragraphs, 2 distinct
    assert r["flag"]


def test_keyword_stuffing_flagged(spark):
    r = _one(spark, "buy cheap " * 30)  # one bigram dominates
    assert r["g"] > 0.4
    assert r["flag"]


def test_empty_and_single_token_are_zero(spark):
    for text in ("", "   ", "word"):
        r = _one(spark, text)
        assert r["l"] == 0.0 and r["p"] == 0.0 and r["g"] == 0.0
        assert not r["flag"]


def test_bigrams_are_adjacent_pairs(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(word_bigrams("text").alias("g")).first()["g"]
    assert got == ["a b", "b c", "c d"]


def test_corpus_run_is_map_only(spark, sf_smoke):
    """The signals over the documents table produce one row per doc with
    no shuffle in the plan (map-side gate)."""
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    out = docs.select(
        "doc_id",
        F.round(dup_line_frac("text"), 6).alias("l"),
        repetition_flagged("text").alias("flag"),
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan
    assert out.count() == docs.count()
