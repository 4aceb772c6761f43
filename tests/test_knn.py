"""Reference-parity semantics tests for the kNN surface (SURVEY.md §5.3-5.4):
squared (un-rooted) L2, LWW tie-break determinism, k edge cases, and the
numpy fast path agreeing with the expression tier."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.knn import (
    knn,
    merge_topk,
    shard_cardinality,
    sharded_knn,
)
from distributed_vector_search_system_spark.schemas import (
    QUERIES_SCHEMA,
    VECTORS_SCHEMA,
)


def _vectors(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], None) for i, v in rows], schema=VECTORS_SCHEMA
    )


def _queries(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], None) for i, v in rows], schema=QUERIES_SCHEMA
    )


def test_squared_l2_not_rooted(spark):
    """FAISS IndexFlatL2 returns squared distances (vector_shard.cc:41)."""
    v = _vectors(spark, [(1, [0.0, 0.0]), (2, [3.0, 4.0])])
    q = _queries(spark, [(0, [0.0, 0.0])])
    got = {r["id"]: r["distance"] for r in knn(v, q, 2).collect()}
    assert got[1] == 0.0
    assert got[2] == 25.0  # squared — NOT 5.0


def test_k_zero_returns_empty(spark):
    v = _vectors(spark, [(1, [1.0, 1.0])])
    q = _queries(spark, [(0, [0.0, 0.0])])
    res = knn(v, q, 0)
    assert res.count() == 0
    assert res.columns == ["query_id", "id", "distance", "rank"]


def test_k_exceeds_table_size(spark):
    """k > ntotal returns all rows (reference drops FAISS -1 padding,
    vector_shard.cc:83-86)."""
    v = _vectors(spark, [(1, [1.0, 0.0]), (2, [2.0, 0.0])])
    q = _queries(spark, [(0, [0.0, 0.0])])
    assert knn(v, q, 50).count() == 2


def test_empty_vectors(spark):
    v = _vectors(spark, [])
    q = _queries(spark, [(0, [0.0, 0.0])])
    assert knn(v, q, 5).count() == 0


def test_deterministic_tiebreak_by_id(spark):
    """Equal distances order by ascending id (our imposed total order)."""
    v = _vectors(spark, [(9, [1.0, 0.0]), (3, [0.0, 1.0]), (5, [1.0, 0.0])])
    q = _queries(spark, [(0, [0.0, 0.0])])
    got = [(r["id"], r["rank"]) for r in knn(v, q, 3).orderBy("rank").collect()]
    assert got == [(3, 1), (5, 2), (9, 3)]


def test_batch_is_single_plan(spark):
    """BatchSearch == Search with N query rows: per-query results identical."""
    rng = np.random.RandomState(7)
    vecs = [(i, rng.randn(8).tolist()) for i in range(100)]
    qs = [(j, rng.randn(8).tolist()) for j in range(5)]
    v, q = _vectors(spark, vecs), _queries(spark, qs)
    batch = knn(v, q, 4).collect()
    for j in range(5):
        single = knn(v, _queries(spark, [qs[j]]), 4).collect()
        b = sorted((r["id"], r["rank"]) for r in batch if r["query_id"] == j)
        s = sorted((r["id"], r["rank"]) for r in single)
        assert b == s


def test_property_vs_numpy_bruteforce(spark):
    """Random vectors: engine top-k == 20-line numpy oracle (SURVEY §5.4)."""
    rng = np.random.RandomState(42)
    n, d, k = 200, 16, 7
    vecs = rng.randn(n, d)
    qs = rng.randn(3, d)
    v = _vectors(spark, [(i, vecs[i].tolist()) for i in range(n)])
    q = _queries(spark, [(j, qs[j].tolist()) for j in range(3)])
    got = knn(v, q, k).collect()
    vecs64 = np.asarray([np.asarray(r, dtype=np.float32) for r in vecs], dtype=np.float64)
    qs64 = np.asarray([np.asarray(r, dtype=np.float32) for r in qs], dtype=np.float64)
    for j in range(3):
        d2 = ((vecs64 - qs64[j]) ** 2).sum(axis=1)
        order = sorted(range(n), key=lambda i: (d2[i], i))[:k]
        mine = [r["id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == j]
        assert mine == order
        for r in got:
            if r["query_id"] == j:
                assert r["distance"] == pytest.approx(d2[r["id"]], rel=1e-9)


def test_numpy_method_matches_expr(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    a = knn(emb, q, 10).select("query_id", "id", "rank")
    b = knn(emb, q, 10, method="numpy").select("query_id", "id", "rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sharded_equals_unsharded(spark, sf_smoke):
    """Two-level shard fan-out + merge (Q3+Q4) == flat scan."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").withColumn(
        "shard_id", (F.col("vec_id") % 6).cast("string")
    )
    q = emb.filter(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    a = knn(emb, q, 9).select("query_id", "id", "rank")
    b = sharded_knn(emb, q, 9, shard_col="shard_id").select("query_id", "id", "rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_merge_topk_truncates(spark):
    from distributed_vector_search_system_spark.schemas import RESULTS_SCHEMA

    partials = spark.createDataFrame(
        [(0, i, float(i), "s", 0) for i in range(10)], schema=RESULTS_SCHEMA
    ).drop("rank")
    assert merge_topk(partials, 3).count() == 3


def test_shard_cardinality(spark):
    v = _vectors(spark, [(i, [0.0, 0.0]) for i in range(10)]).withColumn(
        "shard_id", (F.col("vec_id") % 2).cast("string")
    )
    got = {r["shard_id"]: r["n_vectors"] for r in shard_cardinality(v).collect()}
    assert got == {"0": 5, "1": 5}


def test_numpy_empty_queries_schema_matches(spark):
    """Regression: the numpy path's empty-query early return must emit the
    same columns as the non-empty path, including shard_id."""
    from distributed_vector_search_system_spark.operators.knn import knn
    from pyspark.sql import functions as F

    vectors = spark.createDataFrame(
        [(i, [float(i)], None) for i in range(4)], schema=VECTORS_SCHEMA
    ).withColumn("shard_id", (F.col("vec_id") % 2).cast("string"))
    full = spark.createDataFrame([(0, [0.0], 2)], schema=QUERIES_SCHEMA)
    empty = full.limit(0)
    cols_full = knn(vectors, full, 2, shard_col="shard_id", method="numpy").columns
    cols_empty = knn(vectors, empty, 2, shard_col="shard_id", method="numpy").columns
    assert cols_empty == cols_full


def test_knn_numpy_deterministic_on_duplicate_vectors(spark):
    """Exactly-tied distances (duplicate vectors) straddling the
    per-batch cut must resolve by (distance, id) — identical to the
    expr path and independent of partitioning (review r06)."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(8)]
    rows += [(100, [9.0, 9.0, 9.0, 9.0]), (101, [1.1, 2.1, 3.1, 4.1])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "query_id long, qvec array<double>"
    )
    for parts in (2, 3, 5):
        a = sorted(
            (r["query_id"], r["id"], r["rank"])
            for r in knn(emb.repartition(parts), q, 3, method="numpy").collect()
        )
        b = sorted(
            (r["query_id"], r["id"], r["rank"])
            for r in knn(emb.repartition(parts), q, 3).collect()
        )
        assert a == b, (parts, a, b)
        assert {x[1] for x in a} == {0, 1, 2}, a


def test_rank_key_parity_three_engines(spark):
    """The repo-wide distance rank key must be BIT-identical across its
    three implementations (ADVICE r07): Spark ``rank_key`` (SQL rint),
    numpy ``np.round(x, 6)``, and the DuckDB oracle form
    ``round_even((x)*1e6, 0)/1e6``.  Probed on random doubles plus
    adversarial half-boundary decimals where HALF_UP (F.round / DuckDB
    ROUND) and half-even genuinely disagree."""
    import duckdb

    from distributed_vector_search_system_spark.functions.distance import (
        RANK_KEY_SQL,
        rank_key,
    )

    rng = np.random.default_rng(7)
    vals = list(rng.uniform(0.0, 200.0, 5000))
    # exact .5 at the 7th decimal (as close as doubles represent it),
    # even and odd 6th digits — the cases where half rules diverge
    vals += [0.1234565, 0.1234575, 1.0000005, 2.0000015, 99.9999995]
    np_key = np.round(np.asarray(vals), 6)

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    spark_key = np.array(
        [r["k"] for r in df.select(rank_key("v").alias("k")).collect()]
    )
    assert np.array_equal(spark_key, np_key)

    import pandas as pd

    pdf = pd.DataFrame({"v": vals})
    duck_key = (
        duckdb.connect()
        .execute(f"SELECT {RANK_KEY_SQL.format(x='v')} AS k FROM pdf")
        .fetchdf()["k"]
        .to_numpy()
    )
    assert np.array_equal(duck_key, np_key)
