"""Learned-sparse retrieval (operators/sparse.py, sources/sparse_index.py).

Exactness vs DuckDB of the registry rows is covered by
tests/test_oracle_parity.py; here: hand-computed tiny-corpus tf-idf
encoding + dot-product scores vs an independent plain-Python reference,
pruning semantics, index/from-scratch exactness, weighted-fusion
arithmetic, pruned-tier recall, and the plan locks (broadcast-only
score joins; ``term IN`` pushed into the postings scan).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.sparse import (
    fuse_weighted,
    prune_postings,
    sparse_encode,
    sparse_encode_queries,
    sparse_scores,
    sparse_topk,
)
from distributed_vector_search_system_spark.sources.sparse_index import (
    sparse_search_index,
    write_sparse_index,
)
from distributed_vector_search_system_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _docs(spark):
    rows = [
        (0, "spark shuffle join"),
        (1, "spark spark spark filter"),
        (2, "window merge sort"),
        (3, "spark window window"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sparse_ref(corpus: list[list[str]]):
    """Independent plain-Python encoder: (1+ln tf)·ln(1+(n−df+.5)/(df+.5))."""
    n = len(corpus)
    out: dict[tuple[int, str], float] = {}
    for i, doc in enumerate(corpus):
        for t in set(doc):
            tf = doc.count(t)
            df = sum(1 for d in corpus if t in d)
            out[(i, t)] = (1.0 + math.log(tf)) * math.log(
                1.0 + (n - df + 0.5) / (df + 0.5)
            )
    return out


def _score_ref(enc, qterms: list[str]):
    """Dot product with query-side 1+ln(tf) weights."""
    qw = {t: 1.0 + math.log(qterms.count(t)) for t in set(qterms)}
    scores: dict[int, float] = {}
    for (i, t), w in enc.items():
        if t in qw:
            scores[i] = scores.get(i, 0.0) + qw[t] * w
    return scores


def test_encode_matches_hand_computation(spark):
    enc = {
        (r["id"], r["term"]): r["weight"]
        for r in sparse_encode(_docs(spark)).collect()
    }
    corpus = [d[1].split() for d in sorted(_docs(spark).collect())]
    want = _sparse_ref(corpus)
    assert set(enc) == set(want)
    for key in want:
        assert enc[key] == pytest.approx(want[key], rel=1e-12)


def test_scores_match_hand_computation(spark):
    docs = _docs(spark)
    qterms = ["spark", "spark", "merge"]
    queries = spark.createDataFrame(
        [(7, " ".join(qterms))], "query_id long, qtext string"
    )
    got = {
        r["id"]: r["score"]
        for r in sparse_scores(
            sparse_encode(docs), sparse_encode_queries(queries)
        ).collect()
    }
    corpus = [d[1].split() for d in sorted(docs.collect())]
    want = _score_ref(_sparse_ref(corpus), qterms)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_topk_orders_by_rounded_score_then_id(spark):
    queries = spark.createDataFrame(
        [(7, "spark window")], "query_id long, qtext string"
    )
    out = sparse_topk(
        sparse_encode(_docs(spark)), sparse_encode_queries(queries), 10
    ).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    keys = [(-r["score"], r["id"]) for r in out]
    assert keys == sorted(keys)


def test_vocab_restricted_encoding_is_exact_on_kept_terms(spark):
    """df of a kept term is unchanged by dropping other terms' rows, so
    the vocab= fast path must produce bit-identical weights."""
    docs = _docs(spark)
    vocab = spark.createDataFrame([("spark",), ("window",)], "term string")
    full = {
        (r["id"], r["term"]): r["weight"]
        for r in sparse_encode(docs).collect()
        if r["term"] in ("spark", "window")
    }
    fast = {
        (r["id"], r["term"]): r["weight"]
        for r in sparse_encode(docs, vocab=vocab).collect()
    }
    assert fast == full


def test_prune_identity_at_zero_and_max_only_at_one(spark):
    enc = sparse_encode(_docs(spark))
    assert sorted(map(tuple, prune_postings(enc, min_impact_frac=0.0).collect())) == sorted(
        map(tuple, enc.collect())
    )
    only_max = prune_postings(enc, min_impact_frac=1.0)
    mx = {
        r["term"]: r["m"]
        for r in enc.groupBy("term").agg(F.max("weight").alias("m")).collect()
    }
    for r in only_max.collect():
        assert r["weight"] == pytest.approx(mx[r["term"]])
    with pytest.raises(ValueError):
        prune_postings(enc, min_impact_frac=1.5)


def _fixture_queries(spark, sf_dir, pred="doc_id % 100 = 7", n=8):
    docs = load_table(spark, sf_dir, "documents")
    from distributed_vector_search_system_spark.functions.text import tokens

    return docs.filter(F.expr(pred)).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens("text"), 1, n), " ").alias("qtext"),
    )


def test_index_serves_identical_topk(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    path = str(tmp_path / "sparse_idx")
    write_sparse_index(docs, path)
    scratch = sparse_topk(sparse_encode(docs), qp, 10)
    served = sparse_search_index(spark, path, qp, 10)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, scratch.collect())
    )


def test_index_buildtime_prune_equals_from_scratch_prune(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    frac = 0.6
    path = str(tmp_path / "sparse_idx_pruned")
    write_sparse_index(docs, path, min_impact_frac=frac)
    scratch = sparse_topk(
        prune_postings(sparse_encode(docs), min_impact_frac=frac), qp, 10
    )
    served = sparse_search_index(spark, path, qp, 10)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    # querytime pruning over an unpruned index is the same rows too
    path2 = str(tmp_path / "sparse_idx_full")
    write_sparse_index(docs, path2)
    served_q = sparse_search_index(spark, path2, qp, 10, min_impact_frac=frac)
    assert sorted(map(tuple, served_q.collect())) == sorted(
        map(tuple, scratch.collect())
    )


def test_pruned_recall_measured(spark, sf_smoke, tmp_path):
    """Impact pruning at 0.5 must keep recall@10 ≥ 0.8 on the fixture
    geometry (measured; the bench records the curve)."""
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    enc = sparse_encode(docs)
    exact = sparse_topk(enc, qp, 10)
    pruned = sparse_topk(prune_postings(enc, min_impact_frac=0.5), qp, 10)
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    p = {(r["query_id"], r["id"]) for r in pruned.collect()}
    assert e, "fixture queries must retrieve something"
    recall = len(e & p) / len(e)
    assert recall >= 0.8, f"pruned recall@10 {recall:.3f} below floor"


def test_empty_query_vocab_returns_empty(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "sparse_empty")
    write_sparse_index(docs, path)
    qp = sparse_encode_queries(
        docs.sparkSession.createDataFrame([], "query_id long, qtext string")
    )
    assert sparse_search_index(spark, path, qp, 5).count() == 0


def test_fuse_weighted_exact_arithmetic(spark):
    """Two legs, hand-computed min-max normalization and convex sum."""
    a = spark.createDataFrame(
        [(1, 10, 4.0), (1, 11, 2.0), (1, 12, 0.0)],
        "query_id long, id long, score double",
    )
    b = spark.createDataFrame(
        [(1, 11, 9.0), (1, 13, 3.0)], "query_id long, id long, score double"
    )
    out = {
        r["id"]: r["fused"]
        for r in fuse_weighted([(a, 0.7), (b, 0.3)], 10).collect()
    }
    # leg a: 10→1.0, 11→0.5, 12→0.0 ; leg b: 11→1.0, 13→0.0
    assert out[10] == pytest.approx(0.7)
    assert out[11] == pytest.approx(0.7 * 0.5 + 0.3 * 1.0)
    assert out[12] == pytest.approx(0.0)
    assert out[13] == pytest.approx(0.0)


def test_fuse_weighted_constant_leg_normalizes_to_one(spark):
    a = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 5.0)], "query_id long, id long, score double"
    )
    out = {r["id"]: r["fused"] for r in fuse_weighted([(a, 1.0)], 10).collect()}
    assert out == {10: pytest.approx(1.0), 11: pytest.approx(1.0)}
    with pytest.raises(ValueError):
        fuse_weighted([], 5)


def test_fuse_weighted_rounds_before_normalizing(spark):
    """Extremes are taken on 6-dp-rounded scores (cross-engine contract):
    a sub-1e-6 perturbation of the max must not change the fusion."""
    a = spark.createDataFrame(
        [(1, 10, 4.0000000004), (1, 11, 2.0)], "query_id long, id long, score double"
    )
    b = spark.createDataFrame(
        [(1, 10, 4.0), (1, 11, 2.0)], "query_id long, id long, score double"
    )
    fa = sorted(map(tuple, fuse_weighted([(a, 1.0)], 10).collect()))
    fb = sorted(map(tuple, fuse_weighted([(b, 1.0)], 10).collect()))
    assert fa == fb


def test_score_join_is_broadcast_only(spark, sf_smoke):
    """The from-scratch sparse pipeline must never shuffle the corpus on
    the term key: no SortMergeJoin / CartesianProduct, and the query
    restriction reaches below the tf aggregate as a semi join."""
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    plan = _plan(sparse_topk(sparse_encode(docs), qp, 10))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_index_scan_pushes_term_filter(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    path = str(tmp_path / "sparse_push")
    write_sparse_index(docs, path)
    plan = _plan(sparse_search_index(spark, path, qp, 10))
    pushed = [
        l
        for l in plan.splitlines()
        if "PushedFilters" in l and "term" in l and "In(term" in l.replace(" ", "")
    ]
    assert pushed, "term IN (...) must reach the postings scan as a pushed filter"


# -- mutable store (MutableSparseIndexStore) ---------------------------------

from distributed_vector_search_system_spark.operators.sparse import (  # noqa: E402
    collect_doc_vectors,
)
from distributed_vector_search_system_spark.sources.sparse_index import (  # noqa: E402
    MutableSparseIndexStore,
)

_LOG_SCHEMA = (
    "seq long, op string, id long, terms array<string>, weights array<double>"
)


def _qp(spark, pairs):
    """(query_id, [(term, weight)...]) → query posting triples."""
    rows = [(q, t, w) for q, tws in pairs for t, w in tws]
    return spark.createDataFrame(rows, "query_id long, term string, weight double")


def _store(spark, tmp_path, docs=None):
    s = MutableSparseIndexStore(str(tmp_path / "sstore"))
    enc = sparse_encode(docs if docs is not None else _docs(spark))
    s.init_base(collect_doc_vectors(enc))
    return s, enc


_SLOG = [
    # replace doc 1's vector atomically (model re-encoded it)
    (1, "upsert", 1, ["zebra", "quux"], [2.5, 0.5]),
    # tombstone doc 2
    (2, "delete", 2, None, None),
    # insert a new doc
    (3, "upsert", 9, ["spark", "zebra"], [1.0, 4.0]),
]


def _folded_triples(spark, enc):
    """Manual LWW fold of _SLOG over the encoder output."""
    kept = [
        (r["id"], r["term"], r["weight"])
        for r in enc.collect()
        if r["id"] not in (1, 2)
    ]
    kept += [(1, "zebra", 2.5), (1, "quux", 0.5), (9, "spark", 1.0), (9, "zebra", 4.0)]
    return spark.createDataFrame(kept, "id long, term string, weight double")


def test_store_search_equals_from_scratch_fold(spark, tmp_path):
    s, enc = _store(spark, tmp_path)
    s.apply_log(spark.createDataFrame(_SLOG, _LOG_SCHEMA))
    qp = _qp(spark, [(0, [("spark", 1.0), ("zebra", 2.0)])])
    got = sorted(map(tuple, s.search(spark, qp, 10).collect()))
    want = sorted(
        map(tuple, sparse_topk(_folded_triples(spark, enc), qp, 10).collect())
    )
    assert got == want
    # doc 2 is tombstoned, doc 1 serves its NEW vector only
    ids = {t[1] for t in got}
    assert 2 not in ids and 1 in ids and 9 in ids


def test_store_redelivery_idempotent(spark, tmp_path):
    s, enc = _store(spark, tmp_path)
    log = spark.createDataFrame(_SLOG, _LOG_SCHEMA)
    s.apply_log(log)
    qp = _qp(spark, [(0, [("spark", 1.0), ("zebra", 2.0)])])
    before = sorted(map(tuple, s.search(spark, qp, 10).collect()))
    s.apply_log(log)  # redelivered batch
    assert sorted(map(tuple, s.search(spark, qp, 10).collect())) == before


def test_store_compact_preserves_cleans_and_pins(spark, tmp_path):
    s, enc = _store(spark, tmp_path)
    s.apply_log(spark.createDataFrame(_SLOG, _LOG_SCHEMA))
    qp = _qp(spark, [(0, [("spark", 1.0), ("zebra", 2.0)])])
    before = sorted(map(tuple, s.search(spark, qp, 10).collect()))
    assert s._is_dirty(spark)
    prev_gen = s._current_gen()
    s.compact(spark)
    assert not s._is_dirty(spark)
    assert sorted(map(tuple, s.search(spark, qp, 10).collect())) == before
    # tombstoned doc physically gone from the compacted postings
    postings = spark.read.parquet(s._paths()[0])
    assert postings.filter(F.col("id") == 2).count() == 0
    # generation-pinned read serves the PRE-compaction snapshot and is
    # read-only
    pinned = s.at(prev_gen)
    assert sorted(map(tuple, pinned.search(spark, qp, 10).collect())) == before
    with pytest.raises(ValueError):
        pinned.apply_log(spark.createDataFrame(_SLOG, _LOG_SCHEMA))
    # post-compact mutations keep working (seq continues past the fold)
    s.apply_log(
        spark.createDataFrame(
            [(4, "delete", 9, None, None)], _LOG_SCHEMA
        )
    )
    ids = {t[1] for t in s.search(spark, qp, 10).collect()}
    assert 9 not in ids


def test_store_delete_ids_sweep(spark, tmp_path):
    s, enc = _store(spark, tmp_path)
    ids = spark.createDataFrame([(1,), (99,)], "id long")  # 99 absent
    assert s.delete_ids(ids) == 1
    assert s.delete_ids(ids) == 0  # idempotent: 1 no longer live
    qp = _qp(spark, [(0, [("spark", 1.0)])])
    hit_ids = {r["id"] for r in s.search(spark, qp, 10).collect()}
    assert 1 not in hit_ids and hit_ids


def test_store_streaming_log_sink(spark, tmp_path):
    """Mutations streamed through foreachBatch land exactly like
    apply_log batches."""
    s, enc = _store(spark, tmp_path)
    src = str(tmp_path / "slog_src")
    log = spark.createDataFrame(_SLOG, _LOG_SCHEMA)
    log.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(log.schema).parquet(src)
    q = s.streaming_log_sink(stream, checkpoint=str(tmp_path / "sckpt"))
    q.awaitTermination(120)
    qp = _qp(spark, [(0, [("spark", 1.0), ("zebra", 2.0)])])
    got = sorted(map(tuple, s.search(spark, qp, 10).collect()))
    want = sorted(
        map(tuple, sparse_topk(_folded_triples(spark, enc), qp, 10).collect())
    )
    assert got == want


# -- champion-list (rank-capped) tier ----------------------------------------

from distributed_vector_search_system_spark.operators.sparse import (  # noqa: E402
    cap_postings,
)


def test_cap_postings_top_b_with_id_tiebreak(spark):
    rows = [
        (1, "t", 3.0), (2, "t", 5.0), (3, "t", 5.0), (4, "t", 1.0),
        (5, "u", 2.0),
    ]
    enc = spark.createDataFrame(rows, "id long, term string, weight double")
    got = sorted(map(tuple, cap_postings(enc, 2).collect()))
    # term t: weight-5 ties break by id (2 then 3); term u keeps its one
    assert got == [(2, "t", 5.0), (3, "t", 5.0), (5, "u", 2.0)]
    with pytest.raises(ValueError):
        cap_postings(enc, 0)


def test_index_capped_equals_from_scratch_cap(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    path = str(tmp_path / "sparse_champ")
    write_sparse_index(docs, path)
    cap = 4
    served = sparse_search_index(spark, path, qp, 10, per_term_cap=cap)
    scratch = sparse_topk(cap_postings(sparse_encode(docs), cap), qp, 10)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    with pytest.raises(ValueError):
        sparse_search_index(spark, path, qp, 10, per_term_cap=0)


def test_cap_pushdown_plan_lock(spark, sf_smoke, tmp_path):
    """The champion cap must reach the postings scan as a pushed
    predicate on the materialized impact_rank column — the bounded-IO
    contract (B rows per term at any corpus size)."""
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    path = str(tmp_path / "sparse_champ_plan")
    write_sparse_index(docs, path)
    plan = _plan(sparse_search_index(spark, path, qp, 10, per_term_cap=8))
    pushed = [
        l for l in plan.splitlines()
        if "PushedFilters" in l and "impact_rank" in l
    ]
    assert pushed, "impact_rank <= B must be a pushed filter"


def test_capped_recall_measured(spark, sf_smoke):
    """The fixture's flat small vocabulary is the champion-list
    adversarial case (every query term matches most docs): recall@10
    was measured 0.28/0.46/0.92 at B=16/64/256 over 500 docs, and the
    docstring states the shortlist-only sizing rule.  Regression-lock
    the deep-cap point and monotonicity in B."""
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    enc = sparse_encode(docs)
    exact = {(r["query_id"], r["id"]) for r in sparse_topk(enc, qp, 10).collect()}
    assert exact

    def rec(cap):
        capped = {
            (r["query_id"], r["id"])
            for r in sparse_topk(cap_postings(enc, cap), qp, 10).collect()
        }
        return len(exact & capped) / len(exact)

    r64, r256 = rec(64), rec(256)
    assert r256 >= 0.9, f"deep-cap recall@10 {r256:.3f} below floor"
    assert r256 >= r64, "recall must be monotone in the cap"


def test_write_sparse_index_overwrite_only(spark, tmp_path):
    """ADVICE r09: terms/stats are full-corpus aggregates — an append
    would corrupt df/max_w/n_docs, so both writers reject it."""
    import pytest as _pytest

    from distributed_vector_search_system_spark.sources.sparse_index import (
        write_sparse_index,
        write_sparse_index_triples,
    )

    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="overwrite-only"):
        write_sparse_index(docs, str(tmp_path / "si"), mode="append")
    tri = spark.createDataFrame([(1, "alpha", 1.0)], "id long, term string, weight double")
    with _pytest.raises(ValueError, match="overwrite-only"):
        write_sparse_index_triples(tri, str(tmp_path / "si2"), mode="append")


# -- champion + exact rescore (round 10), Zipf-geometry measurement -----------

from distributed_vector_search_system_spark.operators.sparse import (  # noqa: E402
    sparse_champion_rescore_topk,
)
from distributed_vector_search_system_spark.sources.synthetic import (  # noqa: E402
    synthetic_zipf_postings,
    synthetic_zipf_queries,
)


def test_champion_rescore_equals_manual_two_stage(spark):
    """The operator == cap-candidates + exact rescore built by hand."""
    rows = [
        (1, "a", 5.0), (2, "a", 4.0), (3, "a", 3.0), (4, "a", 2.0),
        (1, "b", 0.1), (3, "b", 9.0), (4, "b", 8.0),
        (2, "c", 7.0),
    ]
    enc = spark.createDataFrame(rows, "id long, term string, weight double")
    q = spark.createDataFrame(
        [(0, "a", 1.0), (0, "b", 1.0)], "query_id long, term string, weight double"
    )
    got = sorted(map(tuple, sparse_champion_rescore_topk(
        enc, q, 10, per_term_cap=2).collect()))
    # champions: a→{1,2}, b→{3,4}; candidates {1,2,3,4}; rescore is the
    # FULL dot product (doc 3 regains its a-weight, doc 1 its b-weight)
    want = sorted(map(tuple, sparse_topk(enc, q, 10).collect()))
    assert got == want  # every doc is a candidate here → exact
    # cap=1: champions a→{1}, b→{3}; doc 2 and 4 excluded from candidacy
    got1 = {r[1] for r in sparse_champion_rescore_topk(
        enc, q, 10, per_term_cap=1).collect()}
    assert got1 == {1, 3}


def test_zipf_generators_deterministic(spark):
    a = sorted(map(tuple, synthetic_zipf_postings(spark, 200, 1000, 10).collect()))
    b = sorted(map(tuple, synthetic_zipf_postings(
        spark, 200, 1000, 10, partitions=7).collect()))
    assert a == b  # partitioning-independent
    qa = sorted(map(tuple, synthetic_zipf_queries(spark, 5, 1000, 4).collect()))
    qb = sorted(map(tuple, synthetic_zipf_queries(spark, 5, 1000, 4).collect()))
    assert qa == qb


def test_zipf_champion_recall_floors(spark):
    """VERDICT r09 item 2: the favorable-geometry measurement.  On the
    Zipf fixture (the geometry champion lists exist for) recall@10 was
    measured trunc 0.84/0.87 and rescore 0.98/1.00 at B=16/64 (4k docs
    × 30 terms, 20k vocab; 0.81-0.87 / 0.91-1.00 at 20k docs).
    Regression-lock floors comfortably below the measurements."""
    enc = synthetic_zipf_postings(spark, 4000, 20000, 30).cache()
    q = synthetic_zipf_queries(spark, 20, 20000, 5).cache()
    exact = {(r["query_id"], r["id"]) for r in sparse_topk(enc, q, 10).collect()}
    assert exact

    def rec(df):
        got = {(r["query_id"], r["id"]) for r in df.collect()}
        return len(got & exact) / len(exact)

    trunc64 = rec(sparse_topk(cap_postings(enc, 64), q, 10))
    resc16 = rec(sparse_champion_rescore_topk(enc, q, 10, per_term_cap=16))
    resc64 = rec(sparse_champion_rescore_topk(enc, q, 10, per_term_cap=64))
    assert trunc64 >= 0.7, f"zipf trunc B=64 recall {trunc64:.3f}"
    assert resc16 >= 0.9, f"zipf rescore B=16 recall {resc16:.3f}"
    assert resc64 >= 0.95, f"zipf rescore B=64 recall {resc64:.3f}"
    assert resc64 >= trunc64, "rescore must dominate truncated scoring"


def test_index_rescore_equals_operator(spark, sf_smoke, tmp_path):
    """Index-served two-stage (pushed impact_rank candidates + term-IN
    rescore scan) == the from-scratch operator, exactly."""
    docs = load_table(spark, sf_smoke, "documents")
    qp = sparse_encode_queries(_fixture_queries(spark, sf_smoke))
    path = str(tmp_path / "sparse_rescore")
    write_sparse_index(docs, path)
    cap = 4
    served = sparse_search_index(
        spark, path, qp, 10, per_term_cap=cap, rescore_candidates=True
    )
    scratch = sparse_champion_rescore_topk(
        sparse_encode(docs), qp, 10, per_term_cap=cap
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    with pytest.raises(ValueError, match="requires per_term_cap"):
        sparse_search_index(spark, path, qp, 10, rescore_candidates=True)
    with pytest.raises(ValueError, match="composes with per_term_cap"):
        sparse_search_index(
            spark, path, qp, 10, per_term_cap=4,
            rescore_candidates=True, min_impact_frac=0.5,
        )


def test_sparse_mixed_layout_generation_takes_full_arbiter(spark, tmp_path):
    """ADVICE r10 (medium), sparse side: without the _MUTS_FLOOR layout
    certificate the touched-id split must decline (a pre-split
    generation's muts/ may hold post-fold appends muts_log/ does not
    name) and the full arbiter must keep legacy-superseded postings
    dead."""
    import os

    from distributed_vector_search_system_spark.sources.fsutil import (
        write_marker,
    )

    s, enc = _store(spark, tmp_path)
    gen_dir = os.path.join(s.root, "gen-000000")
    os.remove(os.path.join(gen_dir, "_MUTS_FLOOR"))
    # legacy-layout replace of doc 1: delta postings + arbiter row in muts/
    legacy_up = spark.createDataFrame(
        [(1, "upsert", 1, ["zebra", "quux"], [2.5, 0.5])], _LOG_SCHEMA
    )
    s._explode_log(
        legacy_up.filter("op = 'upsert'")
    ).write.mode("append").parquet(os.path.join(gen_dir, "delta"))
    spark.createDataFrame(
        [(1, 1, "upsert")], "id long, seq long, op string"
    ).write.mode("append").parquet(os.path.join(gen_dir, "muts"))
    write_marker(spark, os.path.join(gen_dir, "_DIRTY"), "1\n")
    # new-code mutation touching a different doc creates muts_log/
    s.apply_log(
        spark.createDataFrame(
            [(2, "upsert", 9, ["spark", "zebra"], [1.0, 4.0])], _LOG_SCHEMA
        )
    )
    assert s._touched_ids(spark) is None
    qp = _qp(spark, [(0, [("spark", 1.0), ("zebra", 2.0)])])
    got = sorted(map(tuple, s.search(spark, qp, 10).collect()))
    kept = [
        (r["id"], r["term"], r["weight"])
        for r in enc.collect()
        if r["id"] != 1
    ] + [(1, "zebra", 2.5), (1, "quux", 0.5), (9, "spark", 1.0), (9, "zebra", 4.0)]
    folded = spark.createDataFrame(kept, "id long, term string, weight double")
    want = sorted(map(tuple, sparse_topk(folded, qp, 10).collect()))
    assert got == want and got
    # compact certifies the floor; the split resumes
    s.compact(spark)
    assert os.path.exists(os.path.join(s.root, s._current_gen(), "_MUTS_FLOOR"))
    s.apply_log(spark.createDataFrame([(3, "delete", 9, None, None)], _LOG_SCHEMA))
    assert s._touched_ids(spark) is not None
    got2 = {t[1] for t in s.search(spark, qp, 10).collect()}
    assert 9 not in got2 and 1 in got2


def test_champion_sizing_rule(spark):
    """VERDICT r10 item 8: the measured skew statistic separates the
    two measured geometries, and the budget rule maps it."""
    from distributed_vector_search_system_spark.operators.sparse import (
        champion_impact_concentration,
        recommend_champion_B,
    )
    from distributed_vector_search_system_spark.sources.synthetic import (
        synthetic_zipf_postings,
    )

    zipf = synthetic_zipf_postings(spark, 2000, 3000, 20)
    c_zipf = champion_impact_concentration(zipf, cap=64)
    flat = sparse_encode(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    c_flat = champion_impact_concentration(flat, cap=64)
    # the statistic separates the geometries the recall curves measured
    assert c_zipf > c_flat
    assert c_zipf >= 0.5          # Zipf: champion lists earn their bound
    assert c_flat < 0.35          # flat fixture: they don't
    assert recommend_champion_B(c_zipf) == 64
    assert recommend_champion_B(c_zipf, rescore=False) == 256
    assert recommend_champion_B(c_flat) is None
    assert recommend_champion_B(0.4) == 256
    assert recommend_champion_B(0.4, rescore=False) is None
    # no term over the cap => lossless => concentration 1.0
    tiny = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 0.5)], "id long, term string, weight double"
    )
    assert champion_impact_concentration(tiny, cap=64) == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        recommend_champion_B(1.5)
    with _pytest.raises(ValueError):
        champion_impact_concentration(tiny, cap=0)


def test_describe_sparse_store(spark, tmp_path):
    from distributed_vector_search_system_spark.sources.sparse_index import (
        describe_sparse_store,
    )

    s, enc = _store(spark, tmp_path)
    d0 = describe_sparse_store(s, spark)
    assert not d0["dirty"] and d0["tombstones"] == 0
    assert d0["live_docs"] == enc.select("id").distinct().count()
    s.apply_log(spark.createDataFrame(_SLOG, _LOG_SCHEMA))
    d1 = describe_sparse_store(s, spark)
    assert d1["dirty"] and d1["mutation_backlog_rows"] == 3
    assert d1["tombstones"] == 1            # doc 2
    assert d1["live_docs"] == d0["live_docs"]  # -1 delete +1 insert
    s.compact(spark)
    d2 = describe_sparse_store(s, spark)
    assert not d2["dirty"] and d2["mutation_backlog_rows"] == 0
