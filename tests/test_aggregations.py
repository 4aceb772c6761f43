"""Metric aggregations (operators/aggregations.py): extended stats,
exact-vs-approx percentiles, exact-vs-HLL cardinality, per-bucket top
hits, the gated engine verb, and plan shape.  Exactness vs DuckDB is
the events_extended_stats / events_percentiles / events_top_hits /
docs_source_cardinality rows in test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.aggregations import (
    cardinality,
    extended_stats,
    percentiles,
    top_hits,
)


@pytest.fixture(scope="module")
def vals(spark):
    rows = [("a", i, float(i)) for i in range(1, 11)] + [
        ("b", 100 + i, 5.0) for i in range(4)
    ] + [("b", 200, None)]
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_extended_stats_population_semantics(spark, vals):
    got = {r["g"]: r for r in extended_stats(vals, "v", by=("g",)).collect()}
    a = got["a"]
    assert a["n"] == 10 and a["min_v"] == 1.0 and a["max_v"] == 10.0
    assert a["sum_v"] == 55.0 and a["avg_v"] == 5.5
    assert a["sum_sq"] == sum(i * i for i in range(1, 11))
    assert a["variance"] == pytest.approx(8.25)       # POPULATION variance
    b = got["b"]
    assert b["n"] == 4                                 # NULL ignored
    assert b["variance"] == 0.0 and b["std_dev"] == 0.0


def test_extended_stats_global_bucket(spark, vals):
    got = extended_stats(vals, "v").collect()
    assert len(got) == 1 and got[0]["n"] == 14


def test_percentiles_exact_interpolation(spark, vals):
    got = {
        r["g"]: r
        for r in percentiles(vals, "v", (50.0, 90.0), by=("g",)).collect()
    }
    # 1..10: p50 linear-interpolates to 5.5, p90 to 9.1
    assert got["a"]["p50"] == pytest.approx(5.5)
    assert got["a"]["p90"] == pytest.approx(9.1)
    assert got["b"]["p50"] == 5.0


def test_percentiles_approx_within_accuracy(spark, sf_oracle):
    from distributed_vector_search_system_spark.tables import load_table

    ev = load_table(spark, sf_oracle, "events")
    ex = {
        r["event_type"]: (r["p50"], r["p99"])
        for r in percentiles(ev, "value", (50.0, 99.0), by=("event_type",)).collect()
    }
    ap = {
        r["event_type"]: (r["p50"], r["p99"])
        for r in percentiles(
            ev, "value", (50.0, 99.0), by=("event_type",), exact=False
        ).collect()
    }
    # GK guarantees rank error <= n/accuracy; translate to a loose
    # value tolerance by comparing against the exact neighbourhood
    for et, (p50, p99) in ex.items():
        a50, a99 = ap[et]
        assert abs(a50 - p50) <= max(0.05 * abs(p50), 1e-6) or a50 <= p50 * 1.1
        assert a99 <= p99 * 1.05 + 1e-6 and a99 >= p50


def test_cardinality_exact_and_hll(spark, sf_oracle):
    from distributed_vector_search_system_spark.tables import load_table

    ev = load_table(spark, sf_oracle, "events")
    exact = {
        r["event_type"]: r["n_distinct"]
        for r in cardinality(ev, "user_id", by=("event_type",)).collect()
    }
    approx = {
        r["event_type"]: r["n_distinct"]
        for r in cardinality(
            ev, "user_id", by=("event_type",), exact=False, rsd=0.02
        ).collect()
    }
    for et, n in exact.items():
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(approx[et] - n) <= max(3, 0.06 * n)


def test_top_hits_determinism_and_ties(spark, vals):
    got = [
        (r["g"], r["id"], r["rank"])
        for r in top_hits(
            vals.filter("v is not null"), 2, "v", by=("g",), tie_col="id"
        ).orderBy("g", "rank").collect()
    ]
    # bucket b is all-ties at 5.0: id ascending breaks them
    assert got == [("a", 10, 1), ("a", 9, 2), ("b", 100, 1), ("b", 101, 2)]
    asc = top_hits(
        vals.filter("g = 'a'"), 1, "v", by=("g",), tie_col="id", ascending=True
    ).collect()
    assert asc[0]["id"] == 1


def test_top_hits_plan_partial_topk(spark, vals):
    """The per-bucket window must carry a partial top-k
    (WindowGroupLimit) so each partition truncates to k rows before
    the exchange — the merge_topk discipline."""
    plan = (
        top_hits(vals, 2, "v", by=("g",), tie_col="id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_validation(spark, vals):
    with pytest.raises(ValueError):
        percentiles(vals, "v", ())
    with pytest.raises(ValueError):
        percentiles(vals, "v", (101.0,))
    with pytest.raises(ValueError):
        top_hits(vals, 0, "v", by=("g",), tie_col="id")
    with pytest.raises(ValueError):
        top_hits(vals, 2, "v", by=(), tie_col="id")


def test_engine_value_stats_gates_and_hits(spark):
    """The gated verb: STRONG folds pending doc mutations before the
    aggregate; hits= restricts to the per-query match set."""
    from distributed_vector_search_system_spark.text_engine import TextEngine

    docs = spark.createDataFrame(
        [(1, "alpha beta", 10.0), (2, "alpha", 20.0), (3, "beta", 30.0)],
        "doc_id long, text string, score_prior double",
    )
    e = TextEngine(spark, docs)
    base = extended_stats(docs, "score_prior").collect()[0]
    got = e.value_stats("score_prior").collect()[0]
    assert got["n"] == base["n"] and got["avg_v"] == base["avg_v"]
    e.upsert_doc(4, "alpha", score_prior=40.0)
    assert e.value_stats("score_prior", consistency="eventual").collect()[0]["n"] == 3
    assert e.value_stats("score_prior", consistency="strong").collect()[0]["n"] == 4
    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 4)], "query_id long, id long"
    )
    per_q = {
        r["query_id"]: r["sum_v"]
        for r in e.value_stats("score_prior", hits=hits).collect()
    }
    assert per_q == {0: 30.0, 1: 40.0}


def test_date_histogram_calendar_buckets(spark):
    from datetime import datetime

    from distributed_vector_search_system_spark.operators.aggregations import (
        date_histogram,
    )

    rows = [
        ("a", datetime(2024, 1, 1, 5), 1.0),
        ("a", datetime(2024, 1, 1, 23), 2.0),
        ("a", datetime(2024, 2, 3, 1), 4.0),
        ("b", datetime(2024, 1, 8, 0), 8.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    daily = {
        (r["g"], r["bucket"].strftime("%Y-%m-%d"), r["n"], r["sum_v"])
        for r in date_histogram(
            df, "ts", interval="day", by=("g",), value_col="v"
        ).collect()
    }
    assert daily == {
        ("a", "2024-01-01", 2, 3.0),
        ("a", "2024-02-03", 1, 4.0),
        ("b", "2024-01-08", 1, 8.0),
    }
    monthly = {
        (r["bucket"].strftime("%Y-%m"), r["n"])
        for r in date_histogram(df, "ts", interval="month").collect()
    }
    assert monthly == {("2024-01", 3), ("2024-02", 1)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        date_histogram(df, "ts", interval="fortnight")


def test_pipeline_aggs_es_contracts(spark):
    from distributed_vector_search_system_spark.operators.aggregations import (
        pipeline_aggs,
    )

    rows = [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 1, 5.0)]
    series = spark.createDataFrame(rows, "g string, b int, v double")
    got = {
        (r["g"], r["b"]): (r["cum_sum"], r["deriv"], r["moving_avg"])
        for r in pipeline_aggs(
            series, "v", order_col="b", by=("g",), window=2
        ).collect()
    }
    # cumulative sum runs, derivative NULL on each partition's first
    # bucket, moving window trails (current + previous)
    assert got[("a", 1)] == (10.0, None, 10.0)
    assert got[("a", 2)] == (40.0, 20.0, 20.0)
    assert got[("a", 3)] == (60.0, -10.0, 25.0)
    assert got[("b", 1)] == (5.0, None, 5.0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pipeline_aggs(series, "v", order_col="b", by=("g",), window=0)


def test_composite_buckets_pagination(spark):
    from distributed_vector_search_system_spark.operators.aggregations import (
        composite_buckets,
    )

    rows = [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 3.0),
            ("b", "x", 4.0), ("b", "z", 5.0), (None, "q", 9.0)]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v double")
    p1 = [
        (r["k1"], r["k2"], r["n"], r["sum_v"])
        for r in composite_buckets(df, ("k1", "k2"), 2, value_col="v").collect()
    ]
    # null keys skipped (missing_bucket: false), ascending key order
    assert p1 == [("a", "x", 2, 3.0), ("a", "y", 1, 3.0)]
    p2 = [
        (r["k1"], r["k2"])
        for r in composite_buckets(
            df, ("k1", "k2"), 2, after=("a", "y")
        ).collect()
    ]
    assert p2 == [("b", "x"), ("b", "z")]
    # walking past the end yields nothing (no wraparound)
    assert composite_buckets(df, ("k1", "k2"), 2, after=("b", "z")).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        composite_buckets(df, ("k1",), 0)
    with _pytest.raises(ValueError):
        composite_buckets(df, ("k1", "k2"), 2, after=("a",))


def test_composite_cursor_filters_below_aggregate(spark):
    """The page-N property: the cursor predicate must appear as a
    Filter below the aggregate in the optimized plan (raw-row filter,
    not a post-agg HAVING)."""
    from distributed_vector_search_system_spark.operators.aggregations import (
        composite_buckets,
    )

    df = spark.createDataFrame(
        [("a", 1.0)], "k1 string, v double"
    )
    plan = (
        composite_buckets(df, ("k1",), 2, after=("a",))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    agg_pos = plan.index("Aggregate")
    filt_pos = plan.index("Filter")
    assert filt_pos > agg_pos  # child plans print BELOW parents


def test_matrix_stats_pairwise(spark):
    from distributed_vector_search_system_spark.operators.aggregations import (
        matrix_stats,
    )

    rows = [("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0),
            ("g", None, 9.0), ("g", 9.0, None)]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    r = matrix_stats(df, "a", "b", by=("g",)).collect()[0]
    assert r["n"] == 3                       # pairwise-complete only
    assert r["correlation"] == pytest.approx(1.0)
    assert r["covariance"] == pytest.approx(4.0 / 3, abs=1e-6)


def test_exact_tier_guard_trips(spark, vals):
    """VERDICT r11 item 6: the exact percentile/cardinality tiers are
    oracle carriers, not serving plans — above max_exact_rows they
    refuse and direct callers to the GK/HLL++ tier."""
    with pytest.raises(ValueError, match="oracle tier"):
        percentiles(vals, "v", (50.0,), max_exact_rows=5)
    with pytest.raises(ValueError, match="oracle tier"):
        cardinality(vals, "id", max_exact_rows=5)
    # the approximate tier never trips the guard ...
    assert percentiles(
        vals, "v", (50.0,), exact=False, max_exact_rows=5
    ).count() == 1
    assert cardinality(
        vals, "id", exact=False, max_exact_rows=5
    ).count() == 1
    # ... and None disables it for deliberate oracle runs
    assert percentiles(vals, "v", (50.0,), max_exact_rows=None).count() == 1
    assert cardinality(vals, "id", max_exact_rows=None).count() == 1


def test_engine_gated_agg_verbs_strong_parity(spark):
    """VERDICT r11 item 4: date_histogram / composite_buckets /
    matrix_stats / rare_terms served through the SAME gated snapshot as
    search — a STRONG read reflects a just-upserted doc, EVENTUAL does
    not until compaction."""
    from datetime import datetime

    from distributed_vector_search_system_spark.text_engine import TextEngine

    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "web", datetime(2024, 1, 1, 5), 1.0, 2.0),
            (2, "alpha gamma", "web", datetime(2024, 1, 2, 6), 2.0, 4.0),
            (3, "beta delta", "book", datetime(2024, 1, 2, 7), 3.0, 6.0),
        ],
        "doc_id long, text string, source string, ts timestamp, "
        "a double, b double",
    )
    e = TextEngine(spark, docs)
    e.upsert_doc(
        4, "omega zulu", source="book", ts=datetime(2024, 1, 3, 8),
        a=4.0, b=8.0,
    )

    # date_histogram: the new doc's day-3 bucket appears only STRONG
    ev = {r["bucket"].day: r["n"] for r in e.date_histogram("ts").collect()}
    assert ev == {1: 1, 2: 2}
    st = {
        r["bucket"].day: r["n"]
        for r in e.date_histogram("ts", consistency="strong").collect()
    }
    assert st == {1: 1, 2: 2, 3: 1}

    # the STRONG read compacted — mutate again to re-arm the gate for
    # the remaining verbs
    e.upsert_doc(
        5, "omega omega", source="zine", ts=datetime(2024, 1, 4, 9),
        a=5.0, b=10.0,
    )
    assert {r["source"] for r in e.composite_buckets(("source",), 10).collect()} \
        == {"web", "book"}
    strong_pages = e.composite_buckets(
        ("source",), 10, consistency="strong"
    ).collect()
    assert {r["source"] for r in strong_pages} == {"web", "book", "zine"}
    # cursor still pages the gated snapshot
    after = e.composite_buckets(("source",), 10, after=("book",)).collect()
    assert [r["source"] for r in after] == ["web", "zine"]

    e.upsert_doc(
        6, "qux qux", source="zine", ts=datetime(2024, 1, 5, 9),
        a=100.0, b=-100.0,
    )
    assert e.matrix_stats("a", "b").collect()[0]["n"] == 5
    strong_ms = e.matrix_stats("a", "b", consistency="strong").collect()[0]
    assert strong_ms["n"] == 6
    assert strong_ms["correlation"] < 1.0  # the outlier broke the line

    e.upsert_doc(
        7, "singletonian text", source="web", ts=datetime(2024, 1, 6),
        a=1.0, b=1.0,
    )
    ev_rare = {r["term"] for r in e.rare_terms(1).collect()}
    assert "singletonian" not in ev_rare
    st_rare = {
        r["term"] for r in e.rare_terms(1, consistency="strong").collect()
    }
    assert "singletonian" in st_rare


def test_exact_tier_guard_probe_cached(spark, vals, monkeypatch):
    """ADVICE r12 item 3: the guard's CollectLimit probe is cached per
    (analyzed-plan semantic hash, threshold) — repeated exact calls on
    the same plan, e.g. a search_request with several exact agg nodes,
    probe once per process instead of running one eager job each."""
    import pyspark.sql.classic.dataframe as _dfmod

    from distributed_vector_search_system_spark.operators import (
        aggregations as agg,
    )

    agg._GUARD_PROBE_CACHE.clear()
    calls = {"n": 0}
    orig = _dfmod.DataFrame.count

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(_dfmod.DataFrame, "count", counting)
    agg._guard_exact_tier(vals, "percentiles", 5_000)
    agg._guard_exact_tier(vals, "cardinality", 5_000)
    agg._guard_exact_tier(vals, "percentiles", 5_000)
    assert calls["n"] == 1                  # one probe, two cache hits
    # a different threshold is a different question → fresh probe
    agg._guard_exact_tier(vals, "percentiles", 7_000)
    assert calls["n"] == 2
    # the tripping verdict is cached too
    with pytest.raises(ValueError, match="oracle tier"):
        agg._guard_exact_tier(vals, "percentiles", 5)
    with pytest.raises(ValueError, match="oracle tier"):
        agg._guard_exact_tier(vals, "percentiles", 5)
    assert calls["n"] == 3
    agg._GUARD_PROBE_CACHE.clear()
