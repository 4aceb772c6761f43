"""Spell suggestion (operators/spell.py): suggest modes, ranking
determinism, min_df gate, did_you_mean positional rewrite, the gated
engine verb.  Exactness vs DuckDB is the spell_suggest /
bm25_spell_topk rows in test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.spell import (
    did_you_mean,
    spell_suggestions,
)


@pytest.fixture(scope="module")
def vocab(spark):
    rows = [
        ("table", 50), ("cable", 10), ("tale", 5), ("tables", 2),
        ("spark", 40), ("spars", 3), ("stark", 8),
        ("rare", 1), ("rate", 30),
    ]
    return spark.createDataFrame(rows, "term string, df long")


def _q(spark, terms):
    return spark.createDataFrame(
        [(0, list(terms))], "query_id long, qterms array<string>"
    )


def _sugs(df):
    return [
        (r["source_term"], r["suggestion"], r["distance"], r["srank"])
        for r in df.orderBy("source_term", "srank").collect()
    ]


def test_missing_mode_ranks_distance_then_df(spark, vocab):
    got = _sugs(spell_suggestions(vocab, _q(spark, ["tabel"]), max_edits=2))
    # lev(tabel, table) = lev(tabel, tale) = lev(tabel, tables) = 2;
    # within equal distance df desc ranks: table(50), tale(5), tables(2)
    assert got == [
        ("tabel", "table", 2, 1),
        ("tabel", "tale", 2, 2),
        ("tabel", "tables", 2, 3),
    ]


def test_missing_mode_skips_in_vocab_terms(spark, vocab):
    out = spell_suggestions(vocab, _q(spark, ["table", "tabl"]), max_edits=1)
    got = _sugs(out)
    # "table" is in the vocabulary: never corrected in missing mode
    assert all(s[0] == "tabl" for s in got)
    assert got[0][1] == "table"          # df 50 beats tale/cable at d=1


def test_popular_mode_requires_higher_df(spark, vocab):
    out = spell_suggestions(
        vocab, _q(spark, ["rare"]), max_edits=1, suggest_mode="popular"
    )
    got = _sugs(out)
    assert got == [("rare", "rate", 1, 1)]       # df 30 > df 1
    none = spell_suggestions(
        vocab, _q(spark, ["table"]), max_edits=1, suggest_mode="popular"
    )
    assert none.count() == 0                      # nothing beats df 50


def test_always_mode_suggests_for_everything(spark, vocab):
    out = spell_suggestions(
        vocab, _q(spark, ["table"]), max_edits=1, suggest_mode="always"
    )
    got = _sugs(out)
    assert got and all(s[1] != "table" for s in got)  # never itself


def test_min_df_gates_candidates(spark, vocab):
    out = spell_suggestions(
        vocab, _q(spark, ["tals"]), max_edits=1, min_df=10
    )
    # tale (df 5) gated out; nothing within 1 edit has df >= 10
    assert out.count() == 0


def test_no_candidate_emits_no_rows(spark, vocab):
    assert spell_suggestions(vocab, _q(spark, ["zzzzzz"])).count() == 0


def test_did_you_mean_positional_rewrite(spark, vocab):
    got = did_you_mean(
        vocab, _q(spark, ["sparkk", "table", "zzzzzz"]), max_edits=1
    ).collect()
    assert len(got) == 1
    # misspelled -> corrected, in-vocab kept, unsalvageable kept,
    # positions preserved
    assert got[0]["qterms"] == ["spark", "table", "zzzzzz"]


def test_validation(spark, vocab):
    q = _q(spark, ["x"])
    with pytest.raises(ValueError):
        spell_suggestions(vocab, q, suggest_mode="weird")
    with pytest.raises(ValueError):
        spell_suggestions(vocab, q, max_edits=0)
    with pytest.raises(ValueError):
        spell_suggestions(vocab, q, top_n=0)


def test_engine_suggest_spell_gates(spark):
    from distributed_vector_search_system_spark.text_engine import TextEngine

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
    )
    e = TextEngine(spark, docs)
    q = _q(spark, ["alpXa"])
    assert _sugs(e.suggest_spell(q))[0][1] == "alpha"
    # a STRONG suggest sees a just-upserted doc's new vocabulary
    e.upsert_doc(3, "omega omega")
    qo = _q(spark, ["omegaX"])
    assert e.suggest_spell(qo, consistency="eventual").count() == 0
    got = _sugs(e.suggest_spell(qo, consistency="strong"))
    assert got and got[0][1] == "omega"
