"""Function scoring (operators/scoring.py): factor builders, boost
modes, neutral-element semantics, plan shape.  Exactness vs DuckDB is
the ``function_score_boost`` / ``function_score_decay`` rows in
test_oracle_parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.scoring import (
    decay_factor,
    field_value_factor,
    function_score,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, 100.0), (2, 400.0), (3, 900.0), (4, None)]
    return spark.createDataFrame(rows, "doc_id long, pop double")


@pytest.fixture(scope="module")
def hits(spark):
    rows = [
        (10, 1, 2.0), (10, 2, 1.5), (10, 3, 1.0), (10, 4, 0.5), (10, 5, 0.4),
    ]
    return spark.createDataFrame(rows, "query_id long, id long, score double")


def test_field_value_factor_modifiers(spark, docs):
    got = {
        r["id"]: r["factor"]
        for r in field_value_factor(docs, "pop", modifier="sqrt").collect()
    }
    assert got[1] == pytest.approx(10.0)
    assert got[3] == pytest.approx(30.0)
    raw = {
        r["id"]: r["factor"]
        for r in field_value_factor(
            docs, "pop", weight=2.0, modifier="none"
        ).collect()
    }
    assert raw[2] == pytest.approx(800.0)
    lg = {
        r["id"]: r["factor"]
        for r in field_value_factor(docs, "pop", modifier="log1p").collect()
    }
    assert lg[1] == pytest.approx(math.log1p(100.0))


def test_null_field_emits_no_factor_row(spark, docs):
    out = field_value_factor(docs, "pop")
    assert out.filter(F.col("id") == 4).count() == 0


def test_decay_hits_decay_exactly_at_scale(spark, docs):
    # |pop - origin| = scale for doc 2 (400 vs origin 100, scale 300)
    fac = {
        r["id"]: r["factor"]
        for r in decay_factor(
            docs, "pop", origin=100.0, scale=300.0, decay=0.5, kind="exp"
        ).collect()
    }
    assert fac[1] == pytest.approx(1.0)       # at the origin
    assert fac[2] == pytest.approx(0.5)       # exactly decay at scale
    g = {
        r["id"]: r["factor"]
        for r in decay_factor(
            docs, "pop", origin=100.0, scale=300.0, decay=0.5, kind="gauss"
        ).collect()
    }
    assert g[2] == pytest.approx(0.5)
    # gauss is flatter inside the scale radius than exp
    half = {
        r["id"]: r["factor"]
        for r in decay_factor(
            docs, "pop", origin=250.0, scale=300.0, decay=0.5, kind="gauss"
        ).collect()
    }
    half_exp = {
        r["id"]: r["factor"]
        for r in decay_factor(
            docs, "pop", origin=250.0, scale=300.0, decay=0.5, kind="exp"
        ).collect()
    }
    assert half[1] > half_exp[1]


def test_decay_offset_is_a_flat_plateau(spark, docs):
    fac = {
        r["id"]: r["factor"]
        for r in decay_factor(
            docs, "pop",
            origin=100.0, scale=300.0, offset=350.0, decay=0.5, kind="exp",
        ).collect()
    }
    assert fac[1] == pytest.approx(1.0)
    assert fac[2] == pytest.approx(1.0)   # within the offset plateau
    assert fac[3] < 1.0


def test_multiply_missing_factor_is_identity(spark, hits, docs):
    out = function_score(hits, field_value_factor(docs, "pop"), 5)
    got = {r["id"]: r["score"] for r in out.collect()}
    # ids 4 (NULL field) and 5 (absent doc) keep their relevance score
    assert got[4] == pytest.approx(0.5)
    assert got[5] == pytest.approx(0.4)


def test_sum_mode(spark, hits, docs):
    fac = field_value_factor(docs, "pop", weight=0.01, modifier="none")
    out = function_score(hits, fac, 5, mode="sum")
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got[1] == pytest.approx(2.0 + 1.0)
    assert got[5] == pytest.approx(0.4)   # missing factor -> +0


def test_multiply_reranks(spark, hits, docs):
    # pop makes doc 3 overtake docs 1/2 under a raw multiplier
    fac = field_value_factor(docs, "pop", modifier="none")
    out = function_score(hits, fac, 3)
    top = out.filter(F.col("rank") == 1).collect()[0]
    assert top["id"] == 3   # 1.0 * 900 beats 2.0 * 100


def test_chaining_equals_combined_factor(spark, hits, docs):
    f1 = field_value_factor(docs, "pop", weight=0.5, modifier="none")
    f2 = decay_factor(
        docs, "pop", origin=100.0, scale=300.0, decay=0.5, kind="exp"
    )
    chained = function_score(
        function_score(hits, f1, 5).select("query_id", "id", "score"),
        f2, 5,
    )
    combined = f1.alias("a").join(f2.alias("b"), "id").select(
        "id", (F.col("a.factor") * F.col("b.factor")).alias("factor")
    )
    direct = function_score(hits, combined, 5)
    # same ids in the same order (scores differ only in rounding points)
    assert [
        (r["query_id"], r["id"], r["rank"]) for r in chained.orderBy("rank").collect()
    ] == [
        (r["query_id"], r["id"], r["rank"]) for r in direct.orderBy("rank").collect()
    ]


def test_validation(spark, docs, hits):
    with pytest.raises(ValueError):
        field_value_factor(docs, "pop", modifier="cube")
    with pytest.raises(ValueError):
        decay_factor(docs, "pop", origin=0, scale=0)
    with pytest.raises(ValueError):
        decay_factor(docs, "pop", origin=0, scale=1, decay=1.5)
    with pytest.raises(ValueError):
        decay_factor(docs, "pop", origin=0, scale=1, offset=-1)
    with pytest.raises(ValueError):
        decay_factor(docs, "pop", origin=0, scale=1, kind="linear")
    with pytest.raises(ValueError):
        function_score(hits, docs, 5, mode="max")


def test_plan_broadcasts_never_sort_merges(spark, sf_smoke):
    """The factor join must stay broadcast-shaped: the corpus-side
    factor frame is semi-restricted by the broadcast hit ids and the
    outer join broadcasts the surviving sliver — no sort-merge join,
    no corpus shuffle for a k-bounded rescore."""
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk, queries_from_docs,
    )
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7)
    hits = bm25_topk(docs, q, 10).select("query_id", "id", "score")
    out = function_score(
        hits, field_value_factor(docs, "n_chars"), 5
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_nan_factor_emits_no_row(spark):
    """ADVICE r10: sqrt of a negative field yields NaN (not NULL),
    which survives an isNotNull filter and sorts ABOVE every double in
    the descending rank window — one bad field value would pin that
    doc at rank 1 for every query.  The builders must drop NaN rows."""
    bad = spark.createDataFrame(
        [(1, 4.0), (2, -9.0), (3, None)], "doc_id long, pop double"
    )
    fv = field_value_factor(bad, "pop", modifier="sqrt")
    assert {r["id"] for r in fv.collect()} == {1}
    nan_field = spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "doc_id long, ts double"
    )
    dc = decay_factor(nan_field, "ts", origin=0.0, scale=1.0)
    assert {r["id"] for r in dc.collect()} == {1}


def test_nan_field_never_pins_rank_one(spark, hits):
    """End-to-end: the NaN doc keeps its relevance score (neutral
    factor) instead of winning every query."""
    bad = spark.createDataFrame(
        [(1, -1.0), (2, 4.0)], "doc_id long, pop double"
    )
    out = function_score(
        hits, field_value_factor(bad, "pop", modifier="sqrt"), 5
    )
    rows = {r["id"]: (r["rank"], r["score"]) for r in out.collect()}
    assert rows[1] == (2, 2.0)          # kept its relevance score
    assert rows[2][0] == 1              # the valid factor re-ranked


def test_boosting_demotes_but_never_excludes(spark, hits):
    from distributed_vector_search_system_spark.operators.scoring import (
        boosting_score,
    )

    neg = spark.createDataFrame([(1,), (99,)], "id long")
    out = {r["id"]: (r["score"], r["rank"]) for r in
           boosting_score(hits, neg, 5, negative_boost=0.5).collect()}
    # demoted 2.0 -> 1.0, still served; ties with id 3 at 1.0 and the
    # id tie-break puts it at rank 2
    assert out[1] == (1.0, 2) and out[3] == (1.0, 3)
    assert out[2][1] == 1              # un-matched hits re-rank above it
    assert len(out) == 5               # nothing excluded
    # negative_boost=0 floors to 0 but keeps the row
    z = {r["id"]: r["score"] for r in
         boosting_score(hits, neg, 5, negative_boost=0.0).collect()}
    assert z[1] == 0.0 and len(z) == 5


def test_boosting_per_query_pairs(spark, hits):
    from distributed_vector_search_system_spark.operators.scoring import (
        boosting_score,
    )

    more = hits.unionByName(
        spark.createDataFrame(
            [(11, 1, 3.0), (11, 2, 1.0)],
            "query_id long, id long, score double",
        )
    )
    neg = spark.createDataFrame([(10, 1)], "query_id long, id long")
    out = {
        (r["query_id"], r["id"]): r["score"]
        for r in boosting_score(more, neg, 5).collect()
    }
    assert out[(10, 1)] == 1.0         # demoted for query 10 only
    assert out[(11, 1)] == 3.0         # untouched for query 11


def test_boosting_validation_and_plan(spark, sf_smoke, hits):
    import pytest as _pytest

    from distributed_vector_search_system_spark.operators.scoring import (
        boosting_score,
    )

    with _pytest.raises(ValueError):
        boosting_score(hits, hits.select("id"), 5, negative_boost=1.0)
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk, queries_from_docs,
    )
    from distributed_vector_search_system_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7)
    h = bm25_topk(docs, q, 10).select("query_id", "id", "score")
    neg = docs.filter("source = 'web'").select(F.col("doc_id").alias("id"))
    plan = (
        boosting_score(h, neg, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_random_score_deterministic_and_bounded(spark):
    from distributed_vector_search_system_spark.operators.scoring import (
        random_score_factor,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    a = {r["id"]: r["factor"] for r in random_score_factor(docs, 42).collect()}
    b = {r["id"]: r["factor"] for r in random_score_factor(docs, 42).collect()}
    c = {r["id"]: r["factor"] for r in random_score_factor(docs, 7).collect()}
    assert a == b                            # seed-stable across runs
    assert a != c                            # seed actually matters
    assert all(0.0 <= v < 1.0 for v in a.values())
    # spreads: not all equal, roughly centered
    vals = sorted(a.values())
    assert vals[0] < 0.2 and vals[-1] > 0.8
