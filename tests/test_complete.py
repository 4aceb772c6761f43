"""Autocomplete (operators/complete.py): ranking by df with the term
tie-break, min_df noise gate, non-matching prefixes absent, validation.
Oracle parity of the registry row runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest

from distributed_vector_search_system_spark.operators.complete import (
    prefix_completions,
)
from distributed_vector_search_system_spark.operators.fuzzy import (
    corpus_vocabulary,
)


def _vocab(spark):
    rows = [
        ("spark", 30), ("sparse", 20), ("spawn", 20), ("spot", 5),
        ("spa", 1), ("window", 9),
    ]
    return spark.createDataFrame(rows, "term string, df long")


def _px(spark, pairs):
    return spark.createDataFrame(list(pairs), "prefix_id long, prefix string")


def test_ranking_df_desc_term_asc_and_min_df(spark):
    got = [
        (r["prefix_id"], r["term"], r["df"], r["rank"])
        for r in prefix_completions(
            _vocab(spark), _px(spark, [(0, "sp")]), 3, min_df=2
        ).orderBy("rank").collect()
    ]
    # spark(30), then the 20-20 tie breaks sparse < spawn; spa (df 1)
    # is gated out by min_df
    assert got == [
        (0, "spark", 30, 1), (0, "sparse", 20, 2), (0, "spawn", 20, 3)
    ]


def test_no_match_prefix_absent_and_k_cut(spark):
    out = prefix_completions(
        _vocab(spark), _px(spark, [(0, "zz"), (1, "wind")]), 2
    ).collect()
    ids = {r["prefix_id"] for r in out}
    assert ids == {1}
    assert [r["term"] for r in out] == ["window"]


def test_validates(spark):
    with pytest.raises(ValueError):
        prefix_completions(_vocab(spark), _px(spark, [(0, "s")]), 0)
    with pytest.raises(ValueError):
        prefix_completions(_vocab(spark), _px(spark, [(0, "s")]), 1, min_df=0)


def test_end_to_end_from_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "alpha alpine altitude"), (2, "alpha beta"), (3, "alpine gamma")],
        "doc_id long, text string",
    )
    vocab = corpus_vocabulary(docs)
    got = [
        (r["term"], r["df"], r["rank"])
        for r in prefix_completions(vocab, _px(spark, [(9, "alp")]), 5)
        .orderBy("rank").collect()
    ]
    assert got == [("alpha", 2, 1), ("alpine", 2, 2)]
