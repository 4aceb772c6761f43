"""Token-window chunking (operators/chunking.py) and stratified
sampling (operators/sampling.stratified_sample).  Oracle parity for the
registry rows runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.chunking import chunk_documents
from distributed_vector_search_system_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)
from distributed_vector_search_system_spark.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    rows = sorted(
        chunk_documents(_docs(spark, [(1, text)]), chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 3 over 10 tokens → starts 1,4,7,10
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"  # one-token overlap
    assert rows[3]["chunk_text"] == "t9"  # short tail chunk
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]


def test_chunk_short_and_empty_docs(spark):
    rows = chunk_documents(
        _docs(spark, [(1, "only two"), (2, ""), (3, "   ")]),
        chunk_tokens=64,
        overlap=16,
    ).collect()
    assert {(r["doc_id"], r["chunk_id"]) for r in rows} == {(1, 0)}
    assert rows[0]["chunk_text"] == "only two"


def test_chunk_validates_geometry(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, [(1, "x")]), chunk_tokens=8, overlap=8)


def test_chunks_cover_every_token(spark, sf_smoke):
    """Conservation at the corpus: each doc's chunk 0..last at stride
    reconstructs the token stream (dedup overlaps)."""
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    chunks = chunk_documents(docs, chunk_tokens=32, overlap=8)
    got = (
        chunks.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"), F.max("chunk_id").alias("m"))
        .collect()
    )
    toks = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n"),
    ).collect()
    n_by_id = {r["doc_id"]: r["n"] for r in toks}
    for r in got:
        n = n_by_id[r["doc_id"]]
        assert r["c"] == r["m"] + 1  # contiguous chunk ids
        # each chunk adds stride new tokens except the first (full) and
        # the tail (shorter): total = n + overlap·(c−1) − trailing cut
        assert r["s"] >= n  # overlaps counted at least once


def test_stratified_sample_rates_and_drops(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    out = stratified_sample(docs, "lang", {"en": 0.5, "zh": 1.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en", "zh"}  # absent strata dropped
    n_en_all = docs.filter(F.col("lang") == "en").count()
    n_en = out.filter(F.col("lang") == "en").count()
    assert 0 < n_en < n_en_all  # a real subsample
    assert out.filter(F.col("lang") == "zh").count() == docs.filter(
        F.col("lang") == "zh"
    ).count()  # rate 1.0 keeps everything


def test_stratified_consistent_with_hash_sample(spark, sf_oracle):
    """A single-stratum recipe equals hash_sample at the same rate/seed
    (same buckets, same floor)."""
    docs = load_table(spark, sf_oracle, "documents")
    a = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", {"en": 0.3}, seed="s1"
        ).select("doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in hash_sample(
            docs.filter(F.col("lang") == "en"), 0.3, seed="s1"
        ).select("doc_id").collect()
    }
    assert a == b


def test_stratified_validates_fractions(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", {"en": 1.5})
