"""Bulk retention deletes on the merge-on-read stores:
``IvfIndexStore.delete_where`` (predicate sweep over the live view) and
``MutablePostingIndexStore.delete_ids`` (id-frame sweep).

Invariants: a sweep equals filtering the LWW-folded state; it sees
post-mutation values (an upsert that changed ``label`` into/out of the
retention class changes the sweep's verdict); it is idempotent (the
second sweep matches nothing); and it survives ``compact()``."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.knn import knn
from distributed_vector_search_system_spark.operators.mutations import apply_mutations
from distributed_vector_search_system_spark.registry.vector import (
    _ivf_thinned_centroids,
)
from distributed_vector_search_system_spark.schemas import MUTATIONS_SCHEMA
from distributed_vector_search_system_spark.sources.posting_index import (
    MutablePostingIndexStore,
)
from distributed_vector_search_system_spark.streaming.ivf_stream import IvfIndexStore
from distributed_vector_search_system_spark.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _result(df):
    return sorted(
        (r["query_id"], r["id"], round(r["distance"], 6), r["rank"])
        for r in df.collect()
    )


@pytest.fixture()
def vstore(spark, sf_smoke, tmp_path):
    cents = _ivf_thinned_centroids(spark, sf_smoke)
    s = IvfIndexStore(str(tmp_path / "ret_ivf"), cents)
    s.init_base(_emb(spark, sf_smoke))
    return s


def _mut_batch(spark, emb):
    """seq 1-3: move vec 3 OUT of the retention class, move vec 5 INTO
    it, delete vec 11 outright."""
    v7 = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    return spark.createDataFrame(
        [
            (1, "upsert", 3, None, v7, 1000),  # label 1000: % 7 != 3
            (2, "upsert", 5, None, v7, 10),    # label 10:   % 7 == 3
            (3, "delete", 11, None, None, None),
        ],
        MUTATIONS_SCHEMA,
    )


def test_sweep_equals_filtered_fold(spark, sf_smoke, vstore):
    emb = _emb(spark, sf_smoke)
    batch = _mut_batch(spark, emb)
    vstore.append_batch(batch)
    n = vstore.delete_where(spark, "label % 7 = 3")
    assert n > 0
    # oracle: LWW fold of the batch, then drop the retention class
    folded = apply_mutations(emb, batch)
    want = folded.filter(~(F.col("label") % 7 == 3))
    got = vstore.live_rows(spark)
    assert got.count() == want.count()
    assert (
        sorted(r["vec_id"] for r in got.collect())
        == sorted(r["vec_id"] for r in want.collect())
    )
    # the sweep saw post-mutation labels: 3 survived (re-labeled out),
    # 5 is gone (re-labeled in)
    ids = {r["vec_id"] for r in got.collect()}
    assert 3 in ids and 5 not in ids
    # search over the swept store equals exact kNN over the filtered fold
    q = _queries(emb)
    full_probe = len(vstore.centroids)
    got_s = _result(vstore.search(spark, q, 5, n_probe=full_probe))
    want_s = _result(knn(want, q, 5))
    assert got_s == want_s


def test_sweep_idempotent_and_survives_compact(spark, sf_smoke, vstore):
    emb = _emb(spark, sf_smoke)
    vstore.append_batch(_mut_batch(spark, emb))
    n1 = vstore.delete_where(spark, "label % 7 = 3")
    assert n1 > 0
    assert vstore.delete_where(spark, "label % 7 = 3") == 0
    q = _queries(emb)
    full_probe = len(vstore.centroids)
    before = _result(vstore.search(spark, q, 5, n_probe=full_probe))
    vstore.compact(spark)
    assert _result(vstore.search(spark, q, 5, n_probe=full_probe)) == before
    # physically gone after compact, not just arbitered away
    base = spark.read.parquet(vstore.base)
    assert base.filter(F.col("label") % 7 == 3).count() == 0
    # post-compact sweep still matches nothing
    assert vstore.delete_where(spark, "label % 7 = 3") == 0


def test_sweep_explicit_seq_orders_before_later_mutations(spark, sf_smoke, vstore):
    """A per-id upsert AFTER the sweep (higher seq) revives the id —
    the sweep is just mutations, totally ordered like any other."""
    emb = _emb(spark, sf_smoke)
    v7 = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    n = vstore.delete_where(spark, "vec_id = 20", seq=5)
    assert n == 1
    revive = spark.createDataFrame(
        [(6, "upsert", 20, None, v7, 77)], MUTATIONS_SCHEMA
    )
    vstore.append_batch(revive)
    live20 = vstore.live_rows(spark).filter(F.col("vec_id") == 20).collect()
    assert len(live20) == 1 and live20[0]["label"] == 77


# -- lexical store ----------------------------------------------------------

_BASE_DOCS = [
    (1, "apple banana"),
    (2, "banana cherry banana"),
    (3, "cherry date"),
    (4, "apple date cherry"),
]


def _pstore(spark, tmp_path):
    s = MutablePostingIndexStore(str(tmp_path / "ret_post"))
    s.init_base(spark.createDataFrame(_BASE_DOCS, "doc_id long, text string"))
    return s


def _q(spark, terms=("banana", "cherry")):
    return spark.createDataFrame(
        [(0, list(terms))], "query_id long, qterms array<string>"
    )


def test_posting_delete_ids_sweep(spark, tmp_path):
    s = _pstore(spark, tmp_path)
    ids = spark.createDataFrame([(2,), (3,), (99,)], "id long")  # 99 absent
    assert s.delete_ids(ids) == 2
    hit_ids = {r["id"] for r in s.search(spark, _q(spark), 10).collect()}
    assert hit_ids == {1, 4}
    # idempotent: the swept ids are no longer live
    assert s.delete_ids(ids) == 0
    # survives compaction
    s.compact(spark)
    hit_ids2 = {r["id"] for r in s.search(spark, _q(spark), 10).collect()}
    assert hit_ids2 == {1, 4}
    assert s.delete_ids(ids) == 0


def test_posting_sweep_respects_lww_and_stats(spark, tmp_path):
    """Sweeping doc 2 removes its postings from scores AND from the
    corpus stats (N, avgdl follow the live set)."""
    s = _pstore(spark, tmp_path)
    before = {r["id"]: r["score"] for r in s.search(spark, _q(spark), 10).collect()}
    assert 2 in before
    s.delete_ids(spark.createDataFrame([(2,)], "id long"))
    from distributed_vector_search_system_spark.operators.retrieval import bm25_topk

    want = {
        r["id"]: r["score"]
        for r in bm25_topk(
            spark.createDataFrame(
                [d for d in _BASE_DOCS if d[0] != 2], "doc_id long, text string"
            ),
            _q(spark),
            10,
        ).collect()
    }
    got = {r["id"]: r["score"] for r in s.search(spark, _q(spark), 10).collect()}
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9)


def test_posting_sweep_seq_floor_guard(spark, tmp_path):
    """ADVICE r09: a default sweep seq must clear an attached engine's
    PENDING driver-side seqs, and an explicit colliding seq raises."""
    s = _pstore(spark, tmp_path)
    s.seq_floor = 50  # as an engine with 50 assigned (pending) seqs sets
    with pytest.raises(ValueError, match="sweep seq"):
        s.delete_ids(spark.createDataFrame([(2,)], "id long"), seq=50)
    # default seq clears the floor: the sweep lands ABOVE seq 50, so a
    # later engine mutation at seq <= 50 cannot tie with it
    assert s.delete_ids(spark.createDataFrame([(2,)], "id long")) == 1
    muts = s._all_muts(spark)
    swept = muts.filter(F.col("op") == "delete").agg(F.max("seq")).first()[0]
    assert swept == 51


def test_text_engine_advances_store_seq_floor(spark):
    """The engine pushes its last assigned seq into the attached store
    on every mutation, so default-seq sweeps cannot collide."""
    import tempfile

    from distributed_vector_search_system_spark.text_engine import TextEngine

    docs = spark.createDataFrame(_BASE_DOCS, "doc_id long, text string")
    eng = TextEngine(spark, docs)
    with tempfile.TemporaryDirectory() as root:
        eng.attach_store(root)
        eng.upsert_doc(1, "banana banana")
        eng.delete_doc(4)
        # both mutations are pending (driver-side); the store's floor
        # already covers their seqs
        assert eng._store.seq_floor == 2
        ids = spark.createDataFrame([(2,)], "id long")
        assert eng._store.delete_ids(ids) == 1
        eng.compact()
        hit_ids = {
            r["id"]
            for r in eng.search(_q(spark), 10, method="store").collect()
        }
        assert hit_ids == {1, 3}  # 2 swept, 4 engine-deleted
