

def test_multi_index_topk_semantics(spark):
    from distributed_vector_search_system_spark.operators.retrieval import (
        multi_index_topk,
    )

    a = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0)], "query_id long, id long, score double"
    )
    b = spark.createDataFrame(
        [(0, 1, 2.5), (0, 9, 2.0)], "query_id long, id long, score double"
    )
    got = [
        (r["index"], r["id"], r["score"], r["rank"])
        for r in multi_index_topk([("a", a, 1.0), ("b", b, 2.0)], 3)
        .orderBy("rank").collect()
    ]
    # boost doubles index b's scores; id 1 appears under BOTH indexes
    # (the ES (index, id) result identity)
    assert got == [("b", 1, 5.0, 1), ("b", 9, 4.0, 2), ("a", 1, 3.0, 3)]
    # tie across indexes breaks on index name then id
    c = spark.createDataFrame(
        [(0, 5, 3.0)], "query_id long, id long, score double"
    )
    tied = multi_index_topk([("z", a, 1.0), ("y", c, 1.0)], 2).collect()
    first = [r for r in tied if r["rank"] == 1][0]
    assert (first["index"], first["id"]) == ("y", 5)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multi_index_topk([], 3)
    with _pytest.raises(ValueError):
        multi_index_topk([("a", a, 1.0), ("a", b, 1.0)], 3)
