"""Term vectors (operators/termvectors.py): tf/positions/df semantics,
the df_source index path, broadcast restriction.  Exactness vs DuckDB
is the doc_term_vectors row in test_oracle_parity."""

from __future__ import annotations

from distributed_vector_search_system_spark.operators.termvectors import (
    term_vectors,
)


def _ids(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_tf_positions_and_df(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c a"), (2, "b c"), (3, "c c c")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["positions"], r["df"])
        for r in term_vectors(docs, _ids(spark, 1, 3)).collect()
    }
    assert got[(1, "a")] == (3, "0,2,4", 1)   # df corpus-level
    assert got[(1, "b")] == (1, "1", 2)
    assert got[(1, "c")] == (1, "3", 3)
    assert got[(3, "c")] == (3, "0,1,2", 3)
    assert (2, "b") not in got                # unrequested doc absent


def test_absent_and_empty_docs_emit_no_rows(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "!!!")], "doc_id long, text string"
    )
    out = term_vectors(docs, _ids(spark, 2, 99))
    assert out.count() == 0


def test_df_source_overrides_corpus_pass(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    vocab = spark.createDataFrame(
        [("a", 42), ("b", 7)], "term string, df long"
    )
    got = {
        r["term"]: r["df"]
        for r in term_vectors(docs, _ids(spark, 1), df_source=vocab).collect()
    }
    assert got == {"a": 42, "b": 7}
