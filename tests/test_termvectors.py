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


def test_explain_weights_sum_to_ranked_score(spark):
    """The decomposition contract: a pair's weight SUM equals its
    ranked BM25 score (both 6-rounded)."""
    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk,
    )
    from distributed_vector_search_system_spark.operators.termvectors import (
        bm25_explain,
    )

    docs = spark.createDataFrame(
        [(1, "spark table merge"), (2, "spark spark join"),
         (3, "table scan filter"), (4, "merge sort spark table")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, ["spark", "table"]), (1, ["merge"])],
        "query_id long, qterms array<string>",
    )
    hits = bm25_topk(docs, q, 3)
    pairs = hits.select("query_id", "id")
    expl = bm25_explain(docs, q, pairs)
    summed = {
        (r["query_id"], r["id"]): r["s"]
        for r in expl.groupBy("query_id", "id")
        .agg(F.sum("weight").alias("s"))
        .collect()
    }
    ranked = {
        (r["query_id"], r["id"]): r["score"] for r in hits.collect()
    }
    assert set(summed) == set(ranked)
    for pair, sc in ranked.items():
        # per-term 6-rounding can drift the sum by <= 1e-6 per term
        assert abs(summed[pair] - sc) <= 3e-6
    # unrequested pairs emit nothing; df is corpus-level
    assert expl.filter("query_id = 1 AND term <> 'merge'").count() == 0
    dfs = {r["term"]: r["df"] for r in expl.collect()}
    assert dfs["spark"] == 3 and dfs["table"] == 3 and dfs["merge"] == 2


def test_engine_explain_and_dsl_gates(spark):
    from distributed_vector_search_system_spark.text_engine import TextEngine

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
    )
    e = TextEngine(spark, docs)
    q = spark.createDataFrame(
        [(0, ["alpha"])], "query_id long, qterms array<string>"
    )
    pairs = spark.createDataFrame([(0, 1)], "query_id long, id long")
    assert e.explain(q, pairs).count() == 1
    # a STRONG explain sees the upserted doc's new stats (df grows)
    e.upsert_doc(3, "alpha alpha")
    df_ev = e.explain(q, pairs, consistency="eventual").collect()[0]["df"]
    df_st = e.explain(q, pairs, consistency="strong").collect()[0]["df"]
    assert (df_ev, df_st) == (2, 3)
    # the gated DSL verb serves the folded snapshot
    got = {r["id"] for r in e.search_dsl(
        {"match": {"terms": ["alpha"]}}, 5, consistency="strong"
    ).collect()}
    assert got == {1, 2, 3}
