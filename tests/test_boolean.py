"""Boolean term constraints (operators/boolean.py): clause semantics on
a hand corpus, clause composition, the purely-negative rule, index ==
from-scratch equality, pushdown plan lock, and the bm25 composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.boolean import (
    boolean_matching_ids,
    boolean_matching_ids_index,
)
from distributed_vector_search_system_spark.tables import load_table


def _docs(spark):
    rows = [
        (1, "apple banana cherry"),
        (2, "apple banana"),
        (3, "banana date"),
        (4, "cherry date"),
        (5, "apple apple cherry"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_clause_semantics(spark):
    docs = _docs(spark)
    assert _ids(boolean_matching_ids(docs, all_of=["apple", "banana"])) == [1, 2]
    assert _ids(boolean_matching_ids(docs, any_of=["date", "cherry"])) == [1, 3, 4, 5]
    assert _ids(boolean_matching_ids(docs, any_of=["apple"], none_of=["banana"])) == [5]
    assert _ids(
        boolean_matching_ids(
            docs, all_of=["apple"], any_of=["banana", "date"], none_of=["cherry"]
        )
    ) == [2]
    # duplicates in the doc and in the constraint lists are irrelevant
    assert _ids(boolean_matching_ids(docs, all_of=["apple", "apple"])) == [1, 2, 5]


def test_pure_negation_needs_universe_from_scratch_only(spark, tmp_path):
    docs = _docs(spark)
    # from-scratch: the corpus IS the universe
    assert _ids(boolean_matching_ids(docs, none_of=["apple"])) == [3, 4]
    with pytest.raises(ValueError):
        boolean_matching_ids(docs)
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    path = str(tmp_path / "bool_idx")
    write_posting_index(docs, path)
    with pytest.raises(ValueError):
        boolean_matching_ids_index(spark, path, none_of=["apple"])


def test_index_equals_from_scratch(spark, sf_smoke, tmp_path):
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "bool_idx_sf")
    write_posting_index(docs, path)
    kw = dict(all_of=["the"], any_of=["a", "of"], none_of=["zzzznope"])
    scratch = _ids(boolean_matching_ids(docs, **kw))
    served = _ids(boolean_matching_ids_index(spark, path, **kw))
    assert scratch == served and scratch


def test_index_pushes_term_filter(spark, sf_smoke, tmp_path):
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "bool_push")
    write_posting_index(docs, path)
    df = boolean_matching_ids_index(
        spark, path, all_of=["the"], none_of=["of"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [
        l for l in plan.splitlines() if "PushedFilters" in l and "In(term" in l.replace(" ", "")
    ]
    assert pushed, "constraint vocabulary must reach the postings scan"


def test_composes_with_bm25_filter_ids(spark):
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = _docs(spark)
    q = spark.createDataFrame(
        [(0, ["apple", "banana"])], "query_id long, qterms array<string>"
    )
    adm = boolean_matching_ids(docs, none_of=["cherry"])
    out = bm25_topk(docs, q, 10, filter_ids=adm)
    assert sorted(r["id"] for r in out.collect()) == [2, 3]


# -- minimum_should_match (round 12) -----------------------------------------


def test_min_should_counts_distinct_terms(spark):
    from distributed_vector_search_system_spark.operators.boolean import (
        boolean_matching_ids,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "alpha alpha alpha"),   # duplicates count once
            (4, "gamma"),
            (5, "delta"),
        ],
        "doc_id long, text string",
    )
    terms = ["alpha", "beta", "gamma"]

    def ids(n):
        return {
            r["id"]
            for r in boolean_matching_ids(
                docs, any_of=terms, min_should=n
            ).collect()
        }

    assert ids(1) == {1, 2, 3, 4}
    assert ids(2) == {1, 2}
    assert ids(3) == {1}
    assert ids(4) == set()              # unsatisfiable, the ES contract
    import pytest

    with pytest.raises(ValueError, match="min_should"):
        boolean_matching_ids(docs, any_of=terms, min_should=0)


def test_min_should_index_equals_scratch(spark, tmp_path):
    from distributed_vector_search_system_spark.operators.boolean import (
        boolean_matching_ids,
        boolean_matching_ids_index,
    )
    from distributed_vector_search_system_spark.sources.posting_index import (
        write_posting_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta"), (3, "beta gamma"),
         (4, "alpha"), (5, "delta gamma")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pidx")
    write_posting_index(docs, path)
    terms = ["alpha", "beta", "gamma"]
    scratch = {
        r["id"]
        for r in boolean_matching_ids(docs, any_of=terms, min_should=2).collect()
    }
    served = {
        r["id"]
        for r in boolean_matching_ids_index(
            spark, path, any_of=terms, min_should=2
        ).collect()
    }
    assert scratch == served == {1, 2, 3}
