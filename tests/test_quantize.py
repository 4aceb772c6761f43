"""int8 scalar-quantization tier (operators/quantize.py).

Oracle parity for the registry entries runs in test_oracle_parity.py;
these tests lock the numeric guarantees and the plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.knn import knn
from distributed_vector_search_system_spark.operators.quantize import (
    dequantize_expr,
    quantize_vectors,
    quantized_knn,
)
from distributed_vector_search_system_spark.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_codes_bounded_and_error_within_half_step(spark, sf_smoke):
    qz = quantize_vectors(_emb(spark, sf_smoke))
    err = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            dequantize_expr("qcodes", "qscale"),
            lambda x, d: F.abs(x.cast("double") - d),
        ),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    bad = qz.select(
        F.exists("qcodes", lambda c: (c < -127) | (c > 127)).alias("oob"),
        (err > F.col("qscale") / 2 + 1e-12).alias("err_over"),
    ).filter(F.col("oob") | F.col("err_over"))
    assert bad.count() == 0


def test_zero_vector_quantizes_to_zero(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = quantize_vectors(df).select("qscale", "qcodes").first()
    assert row.qscale == 0.0 and row.qcodes == [0, 0, 0]


def test_quantized_knn_matches_exact(spark, sf_smoke):
    """int8 coarse + exact re-rank must return the exact top-k whenever
    the true neighbors survive the coarse cut — at this scale and
    rerank=4 they all do, so the result equals brute-force knn."""
    emb = _emb(spark, sf_smoke)
    q = emb.filter(F.col("vec_id") % 60 == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {
        (r.query_id, r.rank): r.id
        for r in quantized_knn(emb, q, 5, rerank=4).collect()
    }
    want = {
        (r.query_id, r.rank): r.id for r in knn(emb, q, 5).collect()
    }
    assert got == want


def test_quantized_knn_plan_shape(spark, sf_smoke):
    """Coarse phase must be a partial top-k (WindowGroupLimit) and the
    candidate re-join must not be a cartesian product."""
    emb = _emb(spark, sf_smoke)
    q = emb.filter(F.col("vec_id") % 60 == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    plan = quantized_knn(emb, q, 5)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_quantized_knn_uses_stored_codes(spark, sf_smoke):
    """ADVICE r02: with a pre-materialized int8 tier (qcodes/qscale
    columns), phase 1 must read the stored codes instead of re-deriving
    them from the float column — same results, and the quantization
    expressions (the ±127 clamp) vanish from the plan."""
    emb = _emb(spark, sf_smoke)
    q = emb.filter(F.col("vec_id") % 60 == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    stored = quantize_vectors(emb)

    def rows(df):
        return sorted((r.query_id, r.rank, r.id) for r in df.collect())

    assert rows(quantized_knn(stored, q, 5)) == rows(quantized_knn(emb, q, 5))

    def plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    assert "least(127" in plan(quantized_knn(emb, q, 5))          # derived on the fly
    assert "least(127" not in plan(quantized_knn(stored.localCheckpoint(), q, 5))


def test_quantize_roundtrip_property(spark):
    """Property: for ANY float vector (negatives, zeros, huge/tiny
    magnitudes), codes stay in [-127, 127] and per-element
    reconstruction error stays within scale/2 (+1 ulp headroom)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vecs = st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    )

    @settings(max_examples=30, deadline=None)
    @given(v=vecs)
    def check(v):
        df = spark.createDataFrame([(0, v)], "vec_id long, embedding array<float>")
        row = quantize_vectors(df).select(
            "qscale",
            "qcodes",
            dequantize_expr("qcodes", "qscale").alias("dq"),
            "embedding",
        ).first()
        assert all(-127 <= c <= 127 for c in row.qcodes)
        tol = row.qscale / 2 + 1e-9 * max(1.0, row.qscale)
        for x, d in zip(row.embedding, row.dq):
            assert abs(float(x) - d) <= tol, (x, d, row.qscale)

    check()


def test_numpy_coarse_kernel_matches_expr(spark, sf_oracle):
    """The Arrow/GEMM coarse scan must select the same candidates and
    produce the identical exact-reranked result as the codegen coarse
    scan (VERDICT r05 item 8: the high-dim dispatch must not change
    semantics)."""
    from distributed_vector_search_system_spark.operators.quantize import (
        quantized_knn,
    )
    from distributed_vector_search_system_spark.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    want = {
        (r["query_id"], r["id"], round(r["distance"], 6), r["rank"])
        for r in quantized_knn(emb, q, 5).collect()
    }
    got = {
        (r["query_id"], r["id"], round(r["distance"], 6), r["rank"])
        for r in quantized_knn(emb, q, 5, coarse_method="numpy").collect()
    }
    assert got == want


def test_engine_quantized_dispatches_gemm_at_high_dim(spark):
    """VectorEngine.search(method='quantized') at declared dim >= the
    GEMM threshold must route the coarse scan through the Arrow kernel
    and return the same rows as the expr coarse path."""
    from distributed_vector_search_system_spark.engine import VectorEngine
    from distributed_vector_search_system_spark.operators.quantize import (
        quantized_knn,
    )
    from distributed_vector_search_system_spark.sources.synthetic import (
        synthetic_vectors,
    )

    dim = VectorEngine.AUTO_GEMM_MIN_DIM
    corpus = synthetic_vectors(spark, 500, dim)
    eng = VectorEngine(spark, corpus, dim=dim)
    q = corpus.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {
        (r["query_id"], r["id"], round(r["distance"], 6), r["rank"])
        for r in eng.search(q, 5, method="quantized").collect()
    }
    want = {
        (r["query_id"], r["id"], round(r["distance"], 6), r["rank"])
        for r in quantized_knn(corpus, q, 5, coarse_method="numpy").collect()
    }
    assert got == want


def test_numpy_coarse_kernel_empty_queries(spark, sf_oracle):
    """An empty query batch must return an empty result on the numpy
    coarse path exactly like the expr path (the guard the kernel copy
    originally dropped — review r06)."""
    from distributed_vector_search_system_spark.operators.quantize import (
        quantized_knn,
    )
    from distributed_vector_search_system_spark.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = quantized_knn(emb, q, 5, coarse_method="numpy")
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "id", "distance", "rank"}


def test_numpy_coarse_kernel_deterministic_on_duplicate_vectors(spark):
    """Duplicate vectors quantize to identical (codes, scale), so coarse
    distances tie EXACTLY; the per-batch cut must keep the smallest
    (distance, id) pairs — matching the expr path — not an arbitrary
    argpartition survivor (review r06)."""
    from distributed_vector_search_system_spark.operators.quantize import (
        quantized_knn,
    )

    # 8 identical vectors + 2 distinct, k*rerank below the tie-group
    # size so the cut lands inside the tied group
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(8)]
    rows += [(100, [9.0, 9.0, 9.0, 9.0]), (101, [1.1, 2.1, 3.1, 4.1])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "query_id long, qvec array<double>"
    )
    for attempt in range(3):  # partitioning-independence probe
        a = [
            (r["query_id"], r["id"], r["rank"])
            for r in quantized_knn(
                emb.repartition(3 + attempt), q, 2, rerank=2,
                coarse_method="numpy",
            ).collect()
        ]
        b = [
            (r["query_id"], r["id"], r["rank"])
            for r in quantized_knn(
                emb.repartition(3 + attempt), q, 2, rerank=2,
            ).collect()
        ]
        assert sorted(a) == sorted(b), (a, b)
        # smallest ids among the tied duplicates must win
        assert {x[1] for x in a} == {0, 1}, a


# --- binary (1-bit) tier (round 8) -------------------------------------------


def test_binarize_packs_sign_bits_exactly(spark):
    """Packed words equal an independent numpy packing, including the
    64th bit (sign position — the shiftleft-not-multiply regression)
    and a non-multiple-of-64 tail."""
    import numpy as np

    from distributed_vector_search_system_spark.operators.quantize import (
        binarize_expr,
    )

    rng = np.random.RandomState(7)
    for dim in (64, 70, 128, 5):
        vecs = [rng.randn(dim).tolist() for _ in range(6)]
        # force the FIRST element positive so bit 63 of word 0 is set
        vecs[0][0] = 3.5
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: list(r["b"])
            for r in df.select(
                "vec_id", binarize_expr("embedding", dim).alias("b")
            ).collect()
        }

        def pack(v):
            words = []
            for w in range(0, len(v), 64):
                acc = 0
                for x in v[w : w + 64]:
                    acc = ((acc << 1) & 0xFFFFFFFFFFFFFFFF) | (1 if x > 0 else 0)
                if acc >= 1 << 63:  # two's-complement long
                    acc -= 1 << 64
                words.append(acc)
            return words

        for i, v in enumerate(vecs):
            assert got[i] == pack(v), (dim, i)


def test_hamming_packed_equals_sign_disagreements(spark, sf_oracle):
    import numpy as np

    from distributed_vector_search_system_spark.operators.quantize import (
        binarize_expr,
        hamming_packed,
    )
    from distributed_vector_search_system_spark.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings").limit(40)
    dim = len(emb.select("embedding").first()[0])
    a = emb.select(
        "vec_id", "embedding", binarize_expr("embedding", dim).alias("ba")
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), binarize_expr("embedding", dim).alias("bq")
    )
    rows = a.crossJoin(q).select(
        "vec_id", "embedding", "qe", hamming_packed("ba", "bq").alias("hd")
    ).collect()
    for r in rows:
        x = np.array(r["embedding"]) > 0
        y = np.array(r["qe"]) > 0
        assert r["hd"] == int((x != y).sum())


def test_binary_knn_exact_distances_and_store_parity(spark, sf_oracle, tmp_path):
    """Returned distances are exact, and the rerank_store path returns
    identical rows (same candidates, same re-rank)."""
    from distributed_vector_search_system_spark.operators.quantize import (
        binary_knn,
    )
    from distributed_vector_search_system_spark.sources.rerank_store import (
        write_rerank_store,
    )
    from distributed_vector_search_system_spark.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    from distributed_vector_search_system_spark.functions.distance import (
        squared_l2,
    )

    plain = binary_knn(emb, q, 5, dim).collect()
    assert plain
    truth = {
        (r["query_id"], r["vec_id"]): r["d"]
        for r in q.crossJoin(emb.select("vec_id", "embedding"))
        .select("query_id", "vec_id", squared_l2("embedding", F.col("qvec")).alias("d"))
        .collect()
    }
    for r in plain:
        assert abs(r["distance"] - truth[(r["query_id"], r["id"])]) < 1e-9
    store = str(tmp_path / "rr")
    write_rerank_store(emb, store)
    backed = binary_knn(emb, q, 5, dim, rerank_store=store).collect()
    key = lambda r: (r["query_id"], r["rank"], r["id"], round(r["distance"], 6))  # noqa: E731
    assert sorted(map(key, plain)) == sorted(map(key, backed))
