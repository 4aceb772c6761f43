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
    # stride 3, emit while start <= n - overlap = 9 → starts 1,4,7; a
    # start-10 window would be 't9' alone — fully inside chunk 2,
    # suppressed (review finding: redundant tails duplicate data)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"  # one-token overlap
    assert rows[2]["chunk_text"] == "t6 t7 t8 t9"  # reaches the end
    assert [r["n_tokens"] for r in rows] == [4, 4, 4]


def test_no_redundant_tail_but_full_coverage(spark):
    """For any n, the union of chunks covers every token and no chunk's
    tokens are a subset of the previous chunk's."""
    W, OV = 8, 3
    for n in (1, 2, 3, 5, 8, 9, 10, 12, 13, 20, 21):
        text = " ".join(f"w{i}" for i in range(n))
        rows = sorted(
            chunk_documents(
                _docs(spark, [(1, text)]), chunk_tokens=W, overlap=OV
            ).collect(),
            key=lambda r: r["chunk_id"],
        )
        covered = []
        prev: set = set()
        for r in rows:
            cur = set(r["chunk_text"].split(" "))
            assert not cur <= prev, (n, r["chunk_id"])  # adds new tokens
            covered.extend(cur)
            prev = cur
        assert set(covered) == {f"w{i}" for i in range(n)}, n


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
    reconstructs the token stream (dedup overlaps).  orderBy before
    limit: a bare LIMIT is not deterministic across the two actions."""
    docs = load_table(spark, sf_smoke, "documents").orderBy("doc_id").limit(50)
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


def test_pack_sequences_layout(spark):
    from distributed_vector_search_system_spark.operators.chunking import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 2))) for i in range(6)],
        "doc_id long, text string",
    )
    got = [
        tuple(r)
        for r in pack_sequences(docs, 5, bucket=2).orderBy("id").collect()
    ]
    # n_tokens 2,3,4,5,6,7 -> cum-before 0,2,5,9,14,20
    assert got == [
        (0, 2, 0, 0), (1, 3, 0, 2), (2, 4, 1, 0),
        (3, 5, 1, 4), (4, 6, 2, 4), (5, 7, 4, 0),
    ]


def test_pack_sequences_two_level_equals_global_window(spark):
    """The distributed prefix-sum must equal the single global window
    regardless of the bucket size (integer + is associative)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.functions.text import tokens
    from distributed_vector_search_system_spark.operators.chunking import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * ((i * 7) % 11))) for i in range(40)],
        "doc_id long, text string",
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        (r["doc_id"], r["cum"])
        for r in docs.select(
            "doc_id",
            F.coalesce(
                F.sum(F.size(tokens("text")).cast("long")).over(w), F.lit(0)
            ).alias("cum"),
        ).collect()
    }
    for bucket in (1, 3, 64):
        got = {
            (r["id"], r["bin_id"] * 9 + r["bin_offset"])
            for r in pack_sequences(docs, 9, bucket=bucket).collect()
        }
        assert got == ref, bucket


def test_pack_sequences_corpus_window_is_partitioned(spark, sf_smoke):
    """The only UNpartitioned window runs over the bucket-total frame
    (post-aggregate); the full-corpus running sum is partitionBy the
    bucket key — the 100 TB shape."""
    from distributed_vector_search_system_spark.operators.chunking import (
        pack_sequences,
    )
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    plan = (
        pack_sequences(docs, 512)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    wins = [l for l in plan.splitlines() if "windowspecdefinition(" in l]
    assert len(wins) == 2
    corpus = [l for l in wins if "n_tokens" in l]
    assert len(corpus) == 1 and "_grp" in corpus[0]  # partitioned
    (bucket_win,) = [l for l in wins if l not in corpus]
    assert "_gsum" in bucket_win  # global window only over bucket totals


def test_pack_sequences_errors(spark):
    import pytest

    from distributed_vector_search_system_spark.operators.chunking import (
        pack_sequences,
    )

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, 0)
    with pytest.raises(ValueError, match="bucket"):
        pack_sequences(docs, 5, bucket=0)
