"""Faceted search (operators/facets.py): exact tiny-corpus counts, null
bucketing, top-n tie-breaks, per-query facets over a retrieval match
set, and the one-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.facets import (
    facet_counts,
    facets_for_hits,
    topn_facet_counts,
)
from distributed_vector_search_system_spark.tables import load_table


def _docs(spark):
    rows = [
        (0, "en", "web", 100),
        (1, "en", "web", 900),
        (2, "de", "books", 100),
        (3, None, "web", 100),
        (4, "en", None, 50),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )


def test_counts_exact_with_null_bucket(spark):
    got = {
        (r["facet"], r["value"]): r["count"]
        for r in facet_counts(_docs(spark), ["lang", "source"]).collect()
    }
    assert got == {
        ("lang", "en"): 3,
        ("lang", "de"): 1,
        ("lang", "null"): 1,
        ("source", "web"): 3,
        ("source", "books"): 1,
        ("source", "null"): 1,
    }


def test_where_restricts_before_counting(spark):
    got = {
        (r["facet"], r["value"]): r["count"]
        for r in facet_counts(
            _docs(spark), ["lang"], where="n_chars >= 100"
        ).collect()
    }
    assert got == {("lang", "en"): 2, ("lang", "de"): 1, ("lang", "null"): 1}
    with pytest.raises(ValueError):
        facet_counts(_docs(spark), [])


def test_topn_orders_count_desc_value_asc(spark):
    out = topn_facet_counts(_docs(spark), ["lang"], 2).collect()
    ranked = sorted((r["frank"], r["value"], r["count"]) for r in out)
    # en(3) first; de/null tie at 1 → value asc picks 'de'
    assert ranked == [(1, "en", 3), (2, "de", 1)]


def test_facets_for_hits_per_query(spark):
    hits = spark.createDataFrame(
        [(10, 0), (10, 1), (10, 2), (11, 3), (11, 4)], "query_id long, id long"
    )
    got = {
        (r["query_id"], r["facet"], r["value"]): r["count"]
        for r in facets_for_hits(hits, _docs(spark), ["lang"]).collect()
    }
    assert got == {
        (10, "lang", "en"): 2,
        (10, "lang", "de"): 1,
        (11, "lang", "null"): 1,
        (11, "lang", "en"): 1,
    }


def test_bucketed_numeric_facet(spark):
    """The documented idiom for numeric facets: bucket in the
    projection, then facet the bucket column."""
    docs = _docs(spark).withColumn(
        "len_bucket", (F.floor(F.col("n_chars") / 400) * 400).cast("long")
    )
    got = {
        (r["facet"], r["value"]): r["count"]
        for r in facet_counts(docs, ["len_bucket"]).collect()
    }
    assert got == {("len_bucket", "0"): 4, ("len_bucket", "800"): 1}


def test_single_scan_plan(spark, sf_oracle):
    """N facet columns must cost ONE corpus scan (pairs built in the
    projection, not one pass per facet)."""
    docs = load_table(spark, sf_oracle, "documents")
    plan = (
        facet_counts(docs, ["lang", "source"], where="n_chars >= 200")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1
    # and the text column is pruned out of the scan
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert all("text" not in l for l in scan_lines)


def test_facets_for_hits_dedups_hit_rows(spark):
    """ADVICE r09: duplicate (query_id, id) hit rows must not inflate
    facet counts — same contract as best_window_snippets' hits."""
    from distributed_vector_search_system_spark.operators.facets import (
        facets_for_hits,
    )

    docs = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr")], "doc_id long, lang string"
    )
    hits = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (0, 3), (0, 3)], "query_id long, id long"
    )
    got = {
        (r["facet"], r["value"]): r["count"]
        for r in facets_for_hits(hits, docs, ["lang"]).collect()
    }
    assert got == {("lang", "en"): 2, ("lang", "fr"): 1}


# --- round 10: histogram facets + significant terms ------------------------


def test_histogram_buckets_and_nulls(spark):
    from distributed_vector_search_system_spark.operators.facets import (
        histogram_facet,
    )

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 199.0), (3, 200.0), (4, 405.0), (5, None)],
        "doc_id long, v double",
    )
    got = {
        r["bucket"]: r["count"]
        for r in histogram_facet(docs, "v", width=200.0).collect()
    }
    assert got == {0.0: 2, 200.0: 1, 400.0: 1}  # null emits no row


def test_histogram_origin_shifts_bucket_edges(spark):
    from distributed_vector_search_system_spark.operators.facets import (
        histogram_facet,
    )

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 60.0)], "doc_id long, v double"
    )
    got = {
        r["bucket"]: r["count"]
        for r in histogram_facet(
            docs, "v", width=100.0, origin=50.0
        ).collect()
    }
    assert got == {-50.0: 1, 50.0: 1}


def test_histogram_for_hits_dedups_and_restricts(spark):
    from distributed_vector_search_system_spark.operators.facets import (
        histogram_for_hits,
    )

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 110.0), (3, 120.0)], "doc_id long, v double"
    )
    hits = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 2)], "query_id long, id long"
    )
    got = {
        (r["query_id"], r["bucket"]): r["count"]
        for r in histogram_for_hits(hits, docs, "v", width=100.0).collect()
    }
    assert got == {(0, 0.0): 1, (0, 100.0): 1}  # dup hit counts once; 3 absent


def test_histogram_validation(spark):
    import pytest as _pt

    from distributed_vector_search_system_spark.operators.facets import (
        histogram_facet,
        histogram_for_hits,
    )

    docs = spark.createDataFrame([(1, 1.0)], "doc_id long, v double")
    with _pt.raises(ValueError):
        histogram_facet(docs, "v", width=0)
    with _pt.raises(ValueError):
        histogram_for_hits(docs, docs, "v", width=-1)


def test_significant_terms_prefers_overrepresented(spark):
    from distributed_vector_search_system_spark.operators.facets import (
        significant_terms,
    )

    # 'rare' appears in both matched docs but only 2/6 of the corpus;
    # 'common' appears everywhere (bg share 1.0 -> jlh 0)
    docs = spark.createDataFrame(
        [
            (1, "common rare alpha"),
            (2, "common rare beta"),
            (3, "common gamma x"),
            (4, "common delta y"),
            (5, "common epsilon z"),
            (6, "common zeta w"),
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame([(0, 1), (0, 2)], "query_id long, id long")
    got = significant_terms(hits, docs, 3, min_fg_df=2).collect()
    terms = [(r["term"], r["rank"]) for r in got]
    assert terms[0] == ("rare", 1)
    by = {r["term"]: r for r in got}
    assert by["rare"]["fg_df"] == 2 and by["rare"]["bg_df"] == 2
    # common: fg share 1.0, bg share 1.0 -> jlh exactly 0
    assert by["common"]["jlh"] == 0.0


def test_significant_terms_min_fg_gate(spark):
    from distributed_vector_search_system_spark.operators.facets import (
        significant_terms,
    )

    docs = spark.createDataFrame(
        [(1, "alpha solo"), (2, "alpha"), (3, "beta"), (4, "gamma")],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame([(0, 1), (0, 2)], "query_id long, id long")
    got = {r["term"] for r in significant_terms(hits, docs, 5).collect()}
    assert "solo" not in got   # fg_df 1 < min_fg_df 2
    assert "alpha" in got


def test_significant_terms_validation(spark):
    import pytest as _pt

    from distributed_vector_search_system_spark.operators.facets import (
        significant_terms,
    )

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pt.raises(ValueError):
        significant_terms(docs, docs, 0)
    with _pt.raises(ValueError):
        significant_terms(docs, docs, 5, min_fg_df=0)


def test_significant_terms_bg_restricted_below_aggregate(spark, sf_smoke):
    """Plan lock: the background df aggregate must be semi-restricted
    to foreground terms before it runs (the bm25_scores discipline) —
    no full-vocabulary exchange."""
    from distributed_vector_search_system_spark.operators.facets import (
        significant_terms,
    )
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_scores, queries_from_docs,
    )
    from distributed_vector_search_system_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_smoke, "documents")
    q = queries_from_docs(docs, F.col("doc_id") % 100 == 7)
    hits = bm25_scores(docs, q).select("query_id", "id")
    out = significant_terms(hits, docs, 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the bg aggregate's input carries the semi join below it
    assert "LeftSemi" in plan


def test_rare_terms_long_tail(spark):
    from distributed_vector_search_system_spark.operators.facets import (
        rare_terms,
    )

    docs = spark.createDataFrame(
        [(1, "common unique1"), (2, "common unique2"), (3, "common twice"),
         (4, "twice")],
        "doc_id long, text string",
    )
    got = {(r["term"], r["df"]) for r in rare_terms(docs, 1).collect()}
    assert got == {("unique1", 1), ("unique2", 1)}
    got2 = {r["term"] for r in rare_terms(docs, 2).collect()}
    assert got2 == {"unique1", "unique2", "twice"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rare_terms(docs, 0)
