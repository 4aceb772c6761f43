"""Corpus-wide paragraph dedup (operators/paragraphs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.paragraphs import (
    explode_paragraphs,
    paragraph_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_owner_keeps_paragraph(spark):
    docs = _docs(
        spark,
        [
            (1, "shared intro\n\nunique to one"),
            (2, "shared intro\n\nunique to two"),
            (3, "shared intro"),
        ],
    )
    got = {r["doc_id"]: r["dedup_text"] for r in paragraph_dedup(docs).collect()}
    assert got[1] == "shared intro\n\nunique to one"  # first owner keeps it
    assert got[2] == "unique to two"
    assert got[3] == ""  # everything owned elsewhere


def test_within_document_duplicates_collapse(spark):
    docs = _docs(spark, [(1, "again\n\nagain\n\nagain")])
    got = paragraph_dedup(docs).first()["dedup_text"]
    assert got == "again"


def test_paragraph_order_preserved(spark):
    docs = _docs(spark, [(1, "zz last alphabetically\n\naa first alphabetically")])
    got = paragraph_dedup(docs).first()["dedup_text"]
    assert got == "zz last alphabetically\n\naa first alphabetically"


def test_empty_paragraphs_dropped(spark):
    docs = _docs(spark, [(1, "one\n\n\n\ntwo"), (2, "   ")])
    rows = explode_paragraphs(docs).collect()
    assert {(r["doc_id"], r["paragraph"]) for r in rows} == {(1, "one"), (1, "two")}
    got = {r["doc_id"]: r["dedup_text"] for r in paragraph_dedup(docs).collect()}
    assert got[2] == ""


def test_every_document_comes_back(spark, sf_smoke):
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    out = paragraph_dedup(docs)
    assert out.count() == docs.count()
    # no paragraph text survives twice corpus-wide
    paras = out.select(
        F.posexplode(F.split("dedup_text", "\n\n")).alias("i", "p")
    ).filter(F.trim("p") != "")
    total = paras.count()
    distinct = paras.select("p").distinct().count()
    assert total == distinct
