"""Property-based BM25 tests: over random tiny corpora and query sets,
the Spark BM25 must equal an independent plain-Python reference, the
persisted posting index must serve IDENTICAL numbers, and filtered
search must equal the unfiltered ranking restricted to matching docs
(corpus-level statistics).  The deterministic fixture tests pin the
known cases; these walk the corpus space — empty docs, repeated tokens,
queries with absent terms, one-doc corpora."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_scores,
    bm25_topk,
)

# small closed vocabulary so term overlap (the interesting case) is
# common; "zz" tokens never collide with query terms
_VOCAB = ["apple", "banana", "cherry", "date", "fig", "zz"]
_DOC = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)
_QUERY = st.lists(st.sampled_from(_VOCAB[:5]), min_size=1, max_size=3)


def _ref_scores(corpus: list[list[str]], qterms: list[str]) -> dict[int, float]:
    """Independent plain-Python BM25 (Lucene idf), zero-score docs absent."""
    n = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n
    out: dict[int, float] = {}
    for i, doc in enumerate(corpus):
        s = 0.0
        hit = False
        for t in set(qterms):
            tf = doc.count(t)
            if tf == 0:
                continue
            hit = True
            df = sum(1 for d in corpus if t in d)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += (
                idf
                * (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(doc) / avgdl))
            )
        if hit:
            out[i] = s
    return out


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id long, text string",
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS, qterms=_QUERY)
def test_bm25_matches_python_reference(spark, corpus, qterms):
    docs = _docs_df(spark, corpus)
    q = spark.createDataFrame(
        [(0, qterms)], "query_id long, qterms array<string>"
    )
    got = {
        r["id"]: r["score"] for r in bm25_scores(docs, q).collect()
    }
    want = _ref_scores(corpus, qterms)
    assert set(got) == set(want)
    for i, s in want.items():
        assert abs(got[i] - s) < 1e-9, (i, got[i], s)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS, qterms=_QUERY, modulus=st.integers(min_value=2, max_value=3))
def test_posting_index_and_filter_invariants(spark, tmp_path_factory, corpus, qterms, modulus):
    from pyspark.sql import Window

    from distributed_vector_search_system_spark.sources.posting_index import (
        bm25_search_index,
        write_posting_index,
    )

    docs = _docs_df(spark, corpus)
    q = spark.createDataFrame(
        [(0, qterms)], "query_id long, qterms array<string>"
    )
    path = str(tmp_path_factory.mktemp("pidx"))
    write_posting_index(docs, path)
    got = {
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in bm25_search_index(spark, path, q, 10).collect()
    }
    want = {
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in bm25_topk(docs, q, 10).collect()
    }
    assert got == want

    # filtered search == unfiltered restricted + re-ranked
    pred = f"doc_id % {modulus} = 0"
    filt = {
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in bm25_topk(docs, q, 10, where=pred).collect()
    }
    ids = docs.filter(F.expr(pred)).select(F.col("doc_id").alias("id"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("id").asc()
    )
    ref = {
        (r["query_id"], r["id"], r["score"], r["rank"])
        for r in bm25_scores(docs, q)
        .join(ids, "id", "left_semi")
        .withColumn("score", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .collect()
    }
    assert filt == ref


# ---------------------------------------------------------------------------
# GEMM-kernel vs expr parity over random duplicate-heavy corpora: the
# deterministic tests pin specific tie shapes; this walks random ones
# (duplicates are drawn from a 4-vector pool, so exact coarse/distance
# ties straddle the selection cut constantly).

_POOL = [
    [1.0, 2.0, 3.0, 4.0],
    [1.1, 2.1, 3.1, 4.1],
    [9.0, 9.0, 9.0, 9.0],
    [0.0, 1.0, 0.0, 1.0],
]
_VEC_CORPUS = st.lists(
    st.sampled_from(range(len(_POOL))), min_size=3, max_size=14
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(picks=_VEC_CORPUS, k=st.integers(min_value=1, max_value=4),
       parts=st.integers(min_value=1, max_value=4))
def test_gemm_kernels_match_expr_on_random_duplicates(spark, picks, k, parts):
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.operators.quantize import (
        quantized_knn,
    )

    rows = [(i, _POOL[p]) for i, p in enumerate(picks)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)
    q = spark.createDataFrame(
        [(0, _POOL[0]), (1, _POOL[2])], "query_id long, qvec array<double>"
    )
    knn_expr = sorted(
        (r["query_id"], r["id"], r["rank"]) for r in knn(emb, q, k).collect()
    )
    knn_np = sorted(
        (r["query_id"], r["id"], r["rank"])
        for r in knn(emb, q, k, method="numpy").collect()
    )
    assert knn_np == knn_expr
    qk_expr = sorted(
        (r["query_id"], r["id"], r["rank"])
        for r in quantized_knn(emb, q, k, rerank=2).collect()
    )
    qk_np = sorted(
        (r["query_id"], r["id"], r["rank"])
        for r in quantized_knn(
            emb, q, k, rerank=2, coarse_method="numpy"
        ).collect()
    )
    assert qk_np == qk_expr
