"""SparseEngine (sparse_engine.py): the shared mutation/consistency/
epoch/store discipline on the learned-sparse surface, and trimodal
HybridEngine serving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.sparse import (
    collect_doc_vectors,
    sparse_encode,
    sparse_topk,
)
from distributed_vector_search_system_spark.sparse_engine import SparseEngine


def _corpus(spark):
    rows = [
        (1, "apple banana"),
        (2, "banana cherry banana"),
        (3, "cherry date"),
        (4, "apple date cherry"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vectors(spark):
    return collect_doc_vectors(
        sparse_encode(_corpus(spark))
    )


def _qp(spark, pairs=(("banana", 1.0), ("cherry", 2.0)), qid=0):
    return spark.createDataFrame(
        [(qid, t, w) for t, w in pairs], "query_id long, term string, weight double"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_gates_strong_vs_eventual(spark):
    eng = SparseEngine(spark, _vectors(spark))
    before = _rows(eng.search(_qp(spark), 10))
    eng.upsert_doc_vector(9, ["banana"], [5.0])
    # eventual: pre-write snapshot
    assert _rows(eng.search(_qp(spark), 10, consistency="eventual")) == before
    # strong: compacts first
    after = _rows(eng.search(_qp(spark), 10, consistency="strong"))
    assert after != before
    assert 9 in {t[1] for t in after}
    # delete of an absent id is a no-op under strong
    eng.delete_doc(999)
    assert _rows(eng.search(_qp(spark), 10, consistency="strong")) == after
    with pytest.raises(ValueError):
        eng.search(_qp(spark), 10, consistency="nope")


def test_bounded_staleness_lag_bound(spark):
    eng = SparseEngine(spark, _vectors(spark), max_staleness=2)
    before = _rows(eng.search(_qp(spark), 10))
    eng.upsert_doc_vector(9, ["banana"], [5.0])
    eng.upsert_doc_vector(10, ["banana"], [6.0])
    # within the bound: stays on the current snapshot
    assert (
        _rows(eng.search(_qp(spark), 10, consistency="bounded_staleness"))
        == before
    )
    eng.upsert_doc_vector(11, ["banana"], [7.0])
    # beyond the bound: compacts like STRONG
    got = _rows(eng.search(_qp(spark), 10, consistency="bounded_staleness"))
    assert {9, 10, 11} <= {t[1] for t in got}


def test_scan_indexed_store_agree_after_mutations(spark, tmp_path):
    eng = SparseEngine(spark, _vectors(spark))
    eng.attach_index(str(tmp_path / "idx"))
    eng.attach_store(str(tmp_path / "store"))
    eng.upsert_doc_vector(2, ["zebra", "banana"], [1.5, 0.5])  # replace
    eng.delete_doc(3)
    eng.upsert_doc_vector(9, ["cherry"], [4.0])                # insert
    qp = _qp(spark)
    scan = _rows(eng.search(qp, 10, consistency="strong", method="scan"))
    idx = _rows(eng.search(qp, 10, method="indexed"))
    store = _rows(eng.search(qp, 10, method="store"))
    assert scan == idx == store
    ids = {t[1] for t in scan}
    assert 3 not in ids and 9 in ids


def test_epoch_discipline_and_prune(spark, tmp_path):
    eng = SparseEngine(spark, _vectors(spark))
    eng.attach_index(str(tmp_path / "idx"), keep_epochs=1)
    qp = _qp(spark)
    eng.search(qp, 10, method="indexed")
    assert eng.index_builds == 1
    # eventual indexed read between write and compaction: same epoch,
    # NO rebuild (serves the same pre-write snapshot as the scan path)
    eng.upsert_doc_vector(9, ["banana"], [5.0])
    eng.search(qp, 10, method="indexed", consistency="eventual")
    assert eng.index_builds == 1
    # strong indexed read: compaction bumped the epoch -> rebuild
    got = eng.search(qp, 10, method="indexed", consistency="strong")
    assert 9 in {r["id"] for r in got.collect()}
    assert eng.index_builds == 2
    # compact()-time pruning ran BEFORE epoch 1 was built (only e0
    # existed then, keep=1 → nothing removed), so both epochs are on
    # disk now — the one-cycle drain window; an explicit prune (or the
    # next compact) drops the superseded one
    import os

    names = sorted(
        n for n in os.listdir(str(tmp_path / "idx")) if n.startswith("sparse_e")
    )
    assert names == ["sparse_e0", "sparse_e1"]
    removed = eng.prune_epochs(1)
    assert len(removed) == 1 and removed[0].endswith("sparse_e0")
    names = sorted(
        n for n in os.listdir(str(tmp_path / "idx")) if n.startswith("sparse_e")
    )
    assert names == ["sparse_e1"]


def test_store_two_pushes_no_rebuild(spark, tmp_path):
    """Engine-lifetime monotone seqs: the second push's replacement of
    doc 2 must win over the first push's (no seq remap needed, unlike
    VectorEngine's per-push log)."""
    eng = SparseEngine(spark, _vectors(spark))
    eng.attach_store(str(tmp_path / "store2"))
    qp = _qp(spark)
    eng.upsert_doc_vector(2, ["banana"], [9.0])
    eng.search(qp, 5, consistency="strong", method="store")  # push 1
    eng.upsert_doc_vector(2, ["cherry"], [8.0])              # supersedes
    got = eng.search(qp, 5, consistency="strong", method="store")
    r2 = [r for r in got.collect() if r["id"] == 2]
    # doc 2 now matches via cherry only: score = 2.0 * 8.0
    assert len(r2) == 1 and r2[0]["score"] == pytest.approx(16.0)
    assert eng.index_builds == 0  # the store path never rebuilt an index


def test_trimodal_hybrid_engine_one_gate(spark, sf_oracle, tmp_path):
    """A STRONG trimodal read sees all three legs' pending mutations
    and equals the rank-only fusion of the three op-level legs over
    the folded state."""
    from distributed_vector_search_system_spark.engine import VectorEngine
    from distributed_vector_search_system_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.tables import load_table
    from distributed_vector_search_system_spark.text_engine import (
        HybridEngine,
        TextEngine,
    )

    docs = _corpus(spark)
    emb = load_table(spark, sf_oracle, "embeddings").limit(200)
    veng = VectorEngine(spark, emb.select("vec_id", "embedding", "label"))
    teng = TextEngine(spark, docs)
    seng = SparseEngine(spark, _vectors(spark))
    hyb = HybridEngine(veng, teng, sparse_engine=seng)
    # one pending mutation per leg
    v7 = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    veng.upsert(9001, v7, label=1)
    teng.upsert_doc(9001, "banana banana")
    seng.upsert_doc_vector(9001, ["banana"], [9.0])
    q = spark.createDataFrame(
        [(0, ["banana", "cherry"], v7)],
        "query_id long, qterms array<string>, qvec array<double>",
    )
    got = _rows(
        hyb.search(
            q, 5, consistency="strong", leg_k=5,
            sparse_queries=_qp(spark),
        )
    )
    # all three folded states now contain 9001
    lex = bm25_topk(teng._snapshot, q.select("query_id", "qterms"), 5)
    vec = knn(
        veng._read_snapshot("eventual"),
        q.select("query_id", F.col("qvec").alias("qvec")),
        5,
    )
    sp = sparse_topk(seng._triples(seng._snapshot), _qp(spark), 5)
    want = _rows(
        rrf_fuse(
            [lex.select("query_id", "id", "rank"),
             vec.select("query_id", "id", "rank"),
             sp.select("query_id", "id", "rank")],
            5,
        )
    )
    assert got == want
    # sparse leg without a sparse engine is an error
    with pytest.raises(ValueError):
        HybridEngine(veng, teng).search(
            q, 5, sparse_queries=_qp(spark)
        )
