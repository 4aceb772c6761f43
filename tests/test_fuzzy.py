"""Fuzzy term matching (operators/fuzzy.py): expansion semantics
(edit-distance band, deterministic df-cap, distinct union), end-to-end
typo-tolerant BM25 equivalence against a manual expansion, and the
broadcast plan shape.  Oracle parity of the registry row runs in
test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.fuzzy import (
    bm25_fuzzy_topk,
    corpus_vocabulary,
    fuzzy_expand_terms,
)
from distributed_vector_search_system_spark.operators.retrieval import bm25_topk


def _docs(spark):
    rows = [
        (1, "spark shuffle join"),
        (2, "spark spork filter"),
        (3, "sparse window merge"),
        (4, "shark tank spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(spark, terms, qid=0):
    return spark.createDataFrame(
        [(qid, list(terms))], "query_id long, qterms array<string>"
    )


def test_vocabulary_df(spark):
    vocab = {
        r["term"]: r["df"] for r in corpus_vocabulary(_docs(spark)).collect()
    }
    assert vocab["spark"] == 3  # docs 1, 2, 4 (doc-frequency, not cf)
    assert vocab["spork"] == 1


def test_expansion_edit_distance_and_cap(spark):
    vocab = corpus_vocabulary(_docs(spark))
    # "spork" is 1 edit from spark/spork; 2 edits from shark/sparse
    got = {
        r["term"]
        for r in fuzzy_expand_terms(vocab, _q(spark, ["spork"])).collect()
    }
    assert got == {"spark", "spork"}
    # max_edits=2 admits shark (2 substitutions... spork→shark is s_ark:
    # p→h, o→a = 2 edits)
    got2 = {
        r["term"]
        for r in fuzzy_expand_terms(
            vocab, _q(spark, ["spork"]), max_edits=2
        ).collect()
    }
    assert "shark" in got2 and "spark" in got2
    # cap=1 keeps the most frequent neighbor only (spark, df 3)
    got1 = {
        r["term"]
        for r in fuzzy_expand_terms(
            vocab, _q(spark, ["spork"]), max_expansions=1
        ).collect()
    }
    assert got1 == {"spark"}
    with pytest.raises(ValueError):
        fuzzy_expand_terms(vocab, _q(spark, ["a"]), max_edits=-1)
    with pytest.raises(ValueError):
        fuzzy_expand_terms(vocab, _q(spark, ["a"]), max_expansions=0)


def test_expansion_distinct_union_across_qterms(spark):
    vocab = corpus_vocabulary(_docs(spark))
    # both typos expand to overlapping sets; result must be distinct
    exp = fuzzy_expand_terms(vocab, _q(spark, ["spork", "spark"]))
    rows = exp.collect()
    assert len(rows) == len({(r["query_id"], r["term"]) for r in rows})


def test_fuzzy_bm25_equals_manual_expansion(spark):
    """bm25_fuzzy_topk == plain bm25_topk over the manually expanded
    term set (expansion composes, never forks the scorer)."""
    docs = _docs(spark)
    typod = _q(spark, ["sporkx"])  # 1 edit from spork, 2 from spark
    got = sorted(map(tuple, bm25_fuzzy_topk(docs, typod, 5).collect()))
    vocab = corpus_vocabulary(docs)
    terms = sorted(
        r["term"] for r in fuzzy_expand_terms(vocab, typod).collect()
    )
    want = sorted(map(tuple, bm25_topk(docs, _q(spark, terms), 5).collect()))
    assert got == want and got
    # a query whose terms miss the whole vocabulary returns no rows
    assert bm25_fuzzy_topk(docs, _q(spark, ["zzzzzzz"]), 5).count() == 0


def test_expansion_plan_is_broadcast(spark):
    """The query side must broadcast: a BroadcastNestedLoopJoin over
    the vocabulary scan, never a shuffle of the vocabulary."""
    vocab = corpus_vocabulary(_docs(spark))
    exp = fuzzy_expand_terms(vocab, _q(spark, ["spork"]))
    plan = exp._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_wildcard_expansion_semantics(spark):
    from distributed_vector_search_system_spark.operators.fuzzy import (
        wildcard_expand_terms,
    )

    vocab = spark.createDataFrame(
        [("table", 9), ("tablet", 5), ("tale", 3), ("cable", 7), ("tab", 2)],
        "term string, df long",
    )
    q = spark.createDataFrame(
        [(0, ["ta*"]), (1, ["t?ble"]), (2, ["zz*"])],
        "query_id long, qpatterns array<string>",
    )
    got = {
        (r["query_id"], r["term"])
        for r in wildcard_expand_terms(vocab, q).collect()
    }
    # * = any run (incl. empty beyond the prefix), anchored whole-term
    assert {t for (qid, t) in got if qid == 0} == {
        "table", "tablet", "tale", "tab",
    }
    # ? = exactly one char
    assert {t for (qid, t) in got if qid == 1} == {"table"}
    assert not {t for (qid, t) in got if qid == 2}   # no match, no rows
    # the cap keeps the df-ranked head
    capped = {
        r["term"]
        for r in wildcard_expand_terms(vocab, q, max_expansions=2).collect()
        if r["query_id"] == 0
    }
    assert capped == {"table", "tablet"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        wildcard_expand_terms(vocab, q, max_expansions=0)


def test_wildcard_bm25_composes(spark):
    from distributed_vector_search_system_spark.operators.fuzzy import (
        bm25_wildcard_topk,
    )

    docs = spark.createDataFrame(
        [(1, "table tablet"), (2, "cable"), (3, "tale tale")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, ["ta*"])], "query_id long, qpatterns array<string>"
    )
    got = {r["id"] for r in bm25_wildcard_topk(docs, q, 5).collect()}
    assert got == {1, 3}                     # cable never admitted
