"""VectorEngine facade: the 5 service calls + consistency gates +
cache invalidation on write (reference §2.5 G1-G3, M4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.engine import (
    EVENTUAL,
    STRONG,
    VectorEngine,
)
from distributed_vector_search_system_spark.schemas import (
    QUERIES_SCHEMA,
    VECTORS_SCHEMA,
)
from distributed_vector_search_system_spark.sources.config import EngineConfig, ShardConfig


def _engine(spark, **kw):
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], i % 3) for i in range(10)], schema=VECTORS_SCHEMA
    )
    return VectorEngine(spark, vectors, dim=2, **kw)


def _q(spark, qid, vec, k):
    return spark.createDataFrame([(qid, vec, k)], schema=QUERIES_SCHEMA)


def test_search_and_batch_are_one_plan(spark):
    e = _engine(spark)
    q = spark.createDataFrame(
        [(0, [0.0, 0.0], 3), (1, [9.0, 0.0], 3)], schema=QUERIES_SCHEMA
    )
    got = e.search(q, 3).collect()
    assert {r["query_id"] for r in got} == {0, 1}
    top0 = [r["id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == 0]
    assert top0 == [0, 1, 2]


def test_strong_read_sees_pending_mutations(spark):
    """G1: STRONG compacts pending writes before reading; EVENTUAL reads
    the current snapshot (staleness window)."""
    e = _engine(spark)
    e.upsert(100, [0.5, 0.0], label=1)
    eventual_ids = {r["id"] for r in e.search(_q(spark, 0, [0.0, 0.0], 3), 3).collect()}
    assert 100 not in eventual_ids  # not yet applied
    strong_ids = {
        r["id"]
        for r in e.search(_q(spark, 0, [0.0, 0.0], 3), 3, consistency=STRONG).collect()
    }
    assert 100 in strong_ids
    # after the strong read forced the apply, eventual sees it too
    after = {r["id"] for r in e.search(_q(spark, 0, [0.0, 0.0], 3), 3).collect()}
    assert 100 in after


def test_delete_and_size(spark):
    e = _engine(spark)
    assert e.size() == 10
    e.delete(0)
    e.compact()
    assert e.size() == 9
    e.delete(999)  # absent → no-op
    e.compact()
    assert e.size() == 9


def test_unknown_consistency_rejected(spark):
    e = _engine(spark)
    with pytest.raises(ValueError):
        e.search(_q(spark, 0, [0.0, 0.0], 1), 1, consistency="quorum")


def test_cache_invalidated_on_write(spark):
    e = _engine(spark)
    rows1, c1 = e.search_one(0, [3.0, 0.0], 2)
    rows2, c2 = e.search_one(0, [3.0, 0.0], 2)
    assert not c1 and c2 and rows1 == rows2
    e.upsert(50, [3.1, 0.0], label=0)
    rows3, c3 = e.search_one(0, [3.0, 0.0], 2, consistency=STRONG)
    assert not c3  # M4: write cleared the cache
    assert 50 in [r[0] for r in rows3]


def test_upsert_batch(spark):
    e = _engine(spark)
    updates = spark.createDataFrame(
        [(0, [7.0, 7.0], 9), (200, [8.0, 8.0], 9)], schema=VECTORS_SCHEMA
    )
    e.upsert_batch(updates)
    snap = {r["vec_id"]: r["label"] for r in e._snapshot.collect()}
    assert snap[0] == 9 and snap[200] == 9
    assert e.size() == 11


def test_cardinality_by_shard(spark):
    vectors = spark.createDataFrame(
        [(i, [float(i)], None) for i in range(6)], schema=VECTORS_SCHEMA
    ).withColumn("shard_id", (F.col("vec_id") % 2).cast("string"))
    e = VectorEngine(spark, vectors, dim=1, shard_col="shard_id")
    got = {r["shard_id"]: r["n_vectors"] for r in e.cardinality().collect()}
    assert got == {"0": 3, "1": 3}


def test_validate_dimension_on_load(spark):
    bad = spark.createDataFrame([(1, [1.0, 2.0, 3.0], None)], schema=VECTORS_SCHEMA)
    with pytest.raises(ValueError):
        VectorEngine(spark, bad, dim=2, validate=True)


def test_config_defaults_and_validation(tmp_path):
    cfg = EngineConfig(dimension=768, shards=[ShardConfig("s0"), ShardConfig("s1")])
    assert cfg.cache_max_entries == 1024  # reference default config.cc:41
    assert cfg.cache_ttl_seconds == 60  # config.cc:42
    assert cfg.preferred_batch_size == 8  # config.cc:45 (parsed-but-unused)
    with pytest.raises(ValueError):
        EngineConfig(dimension=0)
    with pytest.raises(ValueError):
        EngineConfig(dimension=4, shards=[ShardConfig("a"), ShardConfig("a")])
    p = tmp_path / "cfg.json"
    p.write_text(
        '{"dimension": 64, "shards": [{"shard_id": "s0"}], '
        '"cache": {"max_entries": 2048, "ttl_seconds": 30}}'
    )
    loaded = EngineConfig.from_file(str(p))
    assert loaded.dimension == 64
    assert loaded.cache_max_entries == 2048 and loaded.cache_ttl_seconds == 30


# --- ADVICE round-2 regressions -------------------------------------------

def test_search_with_shard_col(spark):
    """Regression: the expr kNN path with shard_col configured used to
    reference `distance` before it existed (unresolved-column crash)."""
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], None) for i in range(10)], schema=VECTORS_SCHEMA
    ).withColumn("shard_id", (F.col("vec_id") % 2).cast("string"))
    e = VectorEngine(spark, vectors, dim=2, shard_col="shard_id")
    got = e.search(_q(spark, 0, [0.0, 0.0], 3), 3).orderBy("rank").collect()
    assert [r["id"] for r in got] == [0, 1, 2]
    assert [r["shard_id"] for r in got] == ["0", "1", "0"]
    assert got[0].__fields__ == ["query_id", "id", "distance", "shard_id", "rank"]


def test_upsert_batch_respects_pending_write_order(spark):
    """Regression (G3/R1): singles issued BEFORE a batch must not replay
    over the batch's rows at the next compact/STRONG read."""
    e = _engine(spark)
    e.upsert(5, [5.0, 0.0], label=111)   # pending single, issued first
    e.delete(6)                           # pending delete, issued first
    updates = spark.createDataFrame(
        [(5, [5.0, 0.0], 222), (6, [6.0, 0.0], 333)], schema=VECTORS_SCHEMA
    )
    e.upsert_batch(updates)               # batch issued later → must win
    e.compact()  # no-op (nothing pending), but must not resurrect singles
    snap = {r["vec_id"]: r["label"] for r in e._snapshot.collect()}
    assert snap[5] == 222   # batch overrode the earlier single upsert
    assert snap[6] == 333   # batch re-inserted the earlier-deleted id


def test_shard_column_survives_compaction(spark):
    """Regression (M3): compaction used to project the base down to
    (vec_id, embedding, label), losing shard_id — cardinality()/search()
    then crashed on a shard-configured engine."""
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], None) for i in range(6)], schema=VECTORS_SCHEMA
    ).withColumn("shard_id", (F.col("vec_id") % 2).cast("string"))
    e = VectorEngine(spark, vectors, dim=2, shard_col="shard_id")
    e.upsert(100, [1.5, 0.0], shard_id="0")
    e.compact()
    assert "shard_id" in e._snapshot.columns
    got = {r["shard_id"]: r["n_vectors"] for r in e.cardinality().collect()}
    assert got == {"0": 4, "1": 3}
    hits = e.search(_q(spark, 0, [1.5, 0.0], 1), 1).collect()
    assert hits[0]["id"] == 100 and hits[0]["shard_id"] == "0"


def test_checkpoint_bounds_plan_growth(spark, tmp_path):
    """Repeated write→compact cycles layer plan nodes; checkpoint() must
    reset the lineage while preserving the data exactly."""
    e = _engine(spark)
    for i in range(5):
        e.upsert(100 + i, [float(i), 0.0], label=i)
        e.compact()
    deep_plan = e._snapshot._jdf.queryExecution().toString()
    before = sorted((r["vec_id"], r["label"]) for r in e._snapshot.collect())

    e.checkpoint(str(tmp_path / "snap"))
    shallow_plan = e._snapshot._jdf.queryExecution().toString()
    after = sorted((r["vec_id"], r["label"]) for r in e._snapshot.collect())
    assert after == before
    assert len(shallow_plan) < len(deep_plan)
    # and the engine still serves reads/writes on the checkpointed snapshot
    e.upsert(200, [9.0, 9.0], label=7)
    e.compact()
    assert e.size() == len(before) + 1


def test_checkpoint_preserves_shard_column_type(spark, tmp_path):
    """ADVICE r02: a parquet round-trip partitioned by a string shard
    column must not let partition-type inference retype it ('3' → int),
    drifting the snapshot schema vs MUTATIONS_SCHEMA."""
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], i % 3) for i in range(10)], schema=VECTORS_SCHEMA
    ).withColumn("shard_id", (F.col("vec_id") % 2).cast("string"))
    e = VectorEngine(spark, vectors, dim=2, shard_col="shard_id")
    before = dict(e._snapshot.dtypes)
    e.checkpoint(str(tmp_path / "snap"))
    assert dict(e._snapshot.dtypes) == before
    assert e.size() == 10


def test_checkpoint_local_no_path(spark):
    e = _engine(spark)
    e.upsert(100, [1.0, 1.0], label=1)
    e.checkpoint()  # localCheckpoint path
    assert e._pending == 0
    assert e.size() == 11


def test_persistent_cache_tier_cross_engine(spark, tmp_path):
    """A second engine over the same persistent-cache path must serve the
    first engine's results from cache; any write invalidates the tier."""
    from distributed_vector_search_system_spark.operators.cache import (
        PersistentResultCache,
    )

    path = str(tmp_path / "rc")
    e1 = _engine(spark, persistent_cache=PersistentResultCache(spark, path, ttl_seconds=3600))
    rows1, hit1 = e1.search_one(0, [3.0, 0.0], 2)
    assert not hit1

    e2 = _engine(spark, persistent_cache=PersistentResultCache(spark, path, ttl_seconds=3600))
    rows2, hit2 = e2.search_one(0, [3.0, 0.0], 2)
    assert hit2 and [r[:2] for r in rows2] == [r[:2] for r in rows1]

    # M4 across tiers: a write on e2 kills both caches
    e2.upsert(50, [3.05, 0.0], label=0)
    rows3, hit3 = e2.search_one(0, [3.0, 0.0], 2, consistency=STRONG)
    assert not hit3
    assert 50 in [r[0] for r in rows3]


def test_engine_from_config(spark):
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], None) for i in range(6)], schema=VECTORS_SCHEMA
    ).withColumn("shard_id", (F.col("vec_id") % 2).cast("string"))
    cfg = EngineConfig(
        dimension=2,
        shards=[ShardConfig("0"), ShardConfig("1")],
        cache_max_entries=2,
        cache_ttl_seconds=30,
    )
    e = VectorEngine.from_config(spark, vectors, cfg)
    assert e._dim == 2 and e._shard_col == "shard_id"
    assert e.cache._max == 2 and e.cache._ttl == 30
    got = {r["shard_id"]: r["n_vectors"] for r in e.cardinality().collect()}
    assert got == {"0": 3, "1": 3}
    # config dimension is the validated invariant
    bad = spark.createDataFrame([(1, [1.0, 2.0, 3.0], None)], schema=VECTORS_SCHEMA)
    with pytest.raises(ValueError):
        VectorEngine.from_config(spark, bad, cfg)


def test_auto_compaction_policy(spark):
    """auto_compact_threshold folds the pending log on its own; the
    result must equal the explicit-compact sequence, and the plan depth
    stays bounded via auto_checkpoint_every."""
    base = spark.createDataFrame(
        [(i, [float(i), 0.0], i) for i in range(5)], schema=VECTORS_SCHEMA
    )
    eng = VectorEngine(
        spark, base, dim=2, auto_compact_threshold=2, auto_checkpoint_every=2
    )
    eng.upsert(0, [9.0, 9.0], label=90)   # pending=1
    assert eng._pending == 1
    eng.delete(1)                          # pending hits 2 → auto-compact
    assert eng._pending == 0
    eng.upsert(6, [6.0, 6.0], label=60)
    eng.delete(4)                          # second auto-compact → checkpoint
    assert eng._pending == 0 and eng._compactions == 2
    got = {r["vec_id"]: r["label"] for r in eng._read_snapshot("strong").collect()}
    assert got == {0: 90, 2: 2, 3: 3, 6: 60}


def test_engine_quantized_search_matches_expr(spark):
    """The engine's quantized tier must return the same top-k as the
    expression tier at this scale (re-rank covers the coarse error)."""
    import random

    rng = random.Random(7)
    base = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)], i) for i in range(200)],
        schema=VECTORS_SCHEMA,
    )
    eng = VectorEngine(spark, base, dim=8)
    q = base.limit(3).selectExpr("vec_id AS query_id", "embedding AS qvec")
    expr = {(r.query_id, r.rank): r.id for r in eng.search(q, 5).collect()}
    quant = {(r.query_id, r.rank): r.id for r in eng.search(q, 5, method="quantized").collect()}
    assert quant == expr and quant

def test_checkpoint_preserves_shard_value_verbatim(spark, tmp_path):
    """ADVICE r03: the r02 cast-after-inference fix masked dtype drift
    but not VALUE drift — a string shard id '01' inferred as int 1 casts
    back to '1', silently corrupting ('0' vs '00' collide).  Reading
    with the explicit pre-write schema must preserve the raw value."""
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], i % 3) for i in range(6)], schema=VECTORS_SCHEMA
    ).withColumn(
        "shard_id",
        F.when(F.col("vec_id") % 2 == 0, F.lit("01")).otherwise(F.lit("1")),
    )
    e = VectorEngine(spark, vectors, dim=2, shard_col="shard_id")
    before = sorted(
        (r["vec_id"], r["shard_id"]) for r in e._snapshot.collect()
    )
    e.checkpoint(str(tmp_path / "snap"))
    after = sorted((r["vec_id"], r["shard_id"]) for r in e._snapshot.collect())
    assert after == before  # '01' stays '01'; '01' and '1' never merge
    assert dict(e._snapshot.dtypes)["shard_id"] == "string"


def test_pq_search_tier_exact_distances_and_invalidation(spark):
    """method='pq': ADC coarse + exact re-rank through the engine facade;
    codebooks are data-derived and must refresh after a mutation."""
    from pyspark.sql import functions as F

    e = _engine(spark)
    q = _q(spark, 0, [0.0, 0.0], 3)
    exact = {(r["id"], round(r["distance"], 9)) for r in e.search(q, 3).collect()}
    got = {
        (r["id"], round(r["distance"], 9))
        for r in e.search(q, 3, method="pq", pq_m=2, pq_ksub=4).collect()
    }
    # vectors lie on a line: the coarse cut keeps the true neighborhood,
    # and returned distances are exact by construction
    assert got == exact
    books_before = e._pq_books
    assert books_before is not None
    e.upsert(99, [50.0, 0.0])
    e.compact()
    e.search(q, 3, method="pq", pq_m=2, pq_ksub=4).collect()
    assert e._pq_books is not books_before  # snapshot changed → re-derived


def test_pq_books_not_stale_after_eventual_train_then_compact(spark):
    """ADVICE r04: books trained by an EVENTUAL pq search BETWEEN a
    mutation and its compaction are trained on the pre-mutation snapshot
    and must NOT be served after compaction — the memo keys on the
    snapshot epoch (bumps at compact), not the mutation-time version."""
    e = _engine(spark)
    q = _q(spark, 0, [0.0, 0.0], 3)
    e.upsert(99, [50.0, 0.0])          # version bump, snapshot unchanged
    e.search(q, 3, method="pq", pq_m=2, pq_ksub=4).collect()  # EVENTUAL
    stale_books = e._pq_books          # trained on pre-mutation data
    assert stale_books is not None
    e.compact()                        # snapshot now includes the upsert
    e.search(q, 3, method="pq", pq_m=2, pq_ksub=4).collect()
    assert e._pq_books is not stale_books  # retrained on compacted state
    # and a further EVENTUAL search with no new mutations reuses them
    kept = e._pq_books
    e.search(q, 3, method="pq", pq_m=2, pq_ksub=4).collect()
    assert e._pq_books is kept


def test_pq_search_requires_dim_and_no_shard_col(spark):
    import pytest as _pytest

    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], i % 3) for i in range(6)], schema=VECTORS_SCHEMA
    )
    e = VectorEngine(spark, vectors)  # no dim
    with _pytest.raises(ValueError, match="dim"):
        e.search(_q(spark, 0, [0.0, 0.0], 2), 2, method="pq")
    e2 = VectorEngine(spark, vectors, dim=2, shard_col="shard_id")
    with _pytest.raises(ValueError, match="shard"):
        e2.search(_q(spark, 0, [0.0, 0.0], 2), 2, method="pq")


def test_pq_books_rederived_when_geometry_changes(spark):
    """Different pq_m/pq_ksub must never reuse books built for another
    geometry (review finding: memo was keyed by snapshot version only)."""
    e = _engine(spark)
    q = _q(spark, 0, [0.0, 0.0], 3)
    e.search(q, 3, method="pq", pq_m=2, pq_ksub=4).collect()
    books_a = e._pq_books
    e.search(q, 3, method="pq", pq_m=1, pq_ksub=3).collect()
    books_b = e._pq_books
    assert len(books_a) == 2 and len(books_b) == 1  # geometry actually honored
    # and switching back re-derives for the original geometry again
    e.search(q, 3, method="pq", pq_m=2, pq_ksub=4).collect()
    assert len(e._pq_books) == 2


def test_semantic_search_engine_surface(spark):
    """VERDICT r04 item 6: semantic_threshold= on VectorEngine.search —
    probe -> exact on miss -> store fill.  Cache-on results equal
    cache-off results when hits come from identical vectors
    (threshold=1.0-epsilon), served_by marks the serving entry, and
    mutations invalidate the store."""
    e = _engine(spark)
    q1 = _q(spark, 0, [1.0, 0.0], 3)

    # cold store: everything computed, served_by NULL
    r1 = e.search(q1, 3, semantic_threshold=0.999).collect()
    assert len(r1) == 3 and all(r["served_by"] is None for r in r1)

    # same vector, new query id: served semantically with identical rows
    q2 = _q(spark, 7, [1.0, 0.0], 3)
    r2 = e.search(q2, 3, semantic_threshold=0.999).collect()
    assert len(r2) == 3 and all(r["served_by"] is not None for r in r2)
    off = {(r["id"], round(r["distance"], 9), r["rank"])
           for r in e.search(q2, 3).collect()}
    assert {(r["id"], round(r["distance"], 9), r["rank"]) for r in r2} == off

    # mixed batch: dup vector served, new vector computed — and the
    # combined result equals the cache-off search row-for-row
    from pyspark.sql import functions as F
    # note: [4.0, 0.0] would HIT — cosine is scale-invariant, and the
    # cached [1.0, 0.0] is colinear; the miss case needs a new direction
    qmix = spark.createDataFrame(
        [(11, [1.0, 0.0], 3), (12, [0.5, 4.0], 3)], schema=QUERIES_SCHEMA
    )
    rmix = e.search(qmix, 3, semantic_threshold=0.999)
    served_flags = {r["query_id"]: r["served_by"] is not None for r in rmix.collect()}
    assert served_flags[11] is True and served_flags[12] is False
    on = {(r["query_id"], r["id"], round(r["distance"], 9), r["rank"])
          for r in rmix.collect()}
    base = {(r["query_id"], r["id"], round(r["distance"], 9), r["rank"])
            for r in e.search(qmix, 3).collect()}
    assert on == base

    # mutations clear the semantic store (M4)
    e.upsert(99, [50.0, 0.0])
    r3 = e.search(_q(spark, 21, [1.0, 0.0], 3), 3, semantic_threshold=0.999).collect()
    assert all(r["served_by"] is None for r in r3)


def test_semantic_search_threshold_gates_serving(spark):
    """A looser threshold serves a merely-similar query (approximation
    opt-in); a strict one does not."""
    e = _engine(spark)
    e.search(_q(spark, 0, [1.0, 0.1], 3), 3, semantic_threshold=0.9)
    near = [1.0, 0.12]  # cosine to [1.0, 0.1] ~ 0.9998
    strict = e.search(_q(spark, 1, near, 3), 3, semantic_threshold=0.99999999)
    assert all(r["served_by"] is None for r in strict.collect())
    loose = e.search(_q(spark, 2, near, 3), 3, semantic_threshold=0.999)
    assert all(r["served_by"] is not None for r in loose.collect())


# -- filtered search (round 5: where= pre-filter on the engine surface) ----

def test_filtered_search_returns_nearest_matching(spark):
    e = _engine(spark)
    q = _q(spark, 0, [0.0, 0.0], 3)
    got = [
        (r["id"], r["rank"])
        for r in sorted(e.search(q, 3, where="label = 0").collect(),
                        key=lambda r: r["rank"])
    ]
    # label = i % 3 == 0 -> ids 0, 3, 6 are the nearest matching
    assert got == [(0, 1), (3, 2), (6, 3)]


def test_filtered_search_column_predicate_and_methods_agree(spark):
    e = _engine(spark)
    q = _q(spark, 0, [0.0, 0.0], 4)
    pred = F.col("label") != 1
    want = [(r["id"], r["rank"]) for r in sorted(
        e.search(q, 4, where=pred).collect(), key=lambda r: r["rank"])]
    got_np = [(r["id"], r["rank"]) for r in sorted(
        e.search(q, 4, where=pred, method="numpy").collect(),
        key=lambda r: r["rank"])]
    assert want == got_np and len(want) == 4


def test_filtered_search_rejects_semantic_combo(spark):
    e = _engine(spark)
    q = _q(spark, 0, [0.0, 0.0], 3)
    with pytest.raises(ValueError, match="semantic_threshold"):
        e.search(q, 3, where="label = 0", semantic_threshold=0.9)


def test_filtered_search_respects_strong_consistency(spark):
    e = _engine(spark)
    e.upsert(50, [0.1, 0.0], label=0)
    ids = {r["id"] for r in e.search(
        _q(spark, 0, [0.0, 0.0], 2), 2, where="label = 0",
        consistency=STRONG).collect()}
    assert 50 in ids


def test_auto_method_dispatch_matches_expr(spark):
    e = _engine(spark)  # dim=2 -> auto resolves to expr
    q = _q(spark, 0, [0.0, 0.0], 4)
    assert [
        (r["id"], r["rank"])
        for r in sorted(e.search(q, 4, method="auto").collect(),
                        key=lambda r: r["rank"])
    ] == [
        (r["id"], r["rank"])
        for r in sorted(e.search(q, 4, method="expr").collect(),
                        key=lambda r: r["rank"])
    ]


def test_auto_method_picks_gemm_at_reference_width(spark):
    from distributed_vector_search_system_spark.sources.synthetic import (
        synthetic_vectors,
    )
    from distributed_vector_search_system_spark.engine import VectorEngine

    corpus = synthetic_vectors(spark, 200, 768)
    e = VectorEngine(spark, corpus, dim=768)
    q = corpus.filter(F.col("vec_id") == 0).selectExpr(
        "vec_id AS query_id", "embedding AS qvec", "5 AS top_k"
    )
    auto = sorted(
        ((r["id"], r["rank"]) for r in e.search(q, 5, method="auto").collect()),
    )
    gemm = sorted(
        ((r["id"], r["rank"]) for r in e.search(q, 5, method="numpy").collect()),
    )
    assert auto == gemm and len(auto) == 5


# --- persisted-index serving through the engine (round 7, VERDICT r06
# item 4): the reference's single ShardManager::Search surface, with
# the pruned stores behind the same gates as the scan tiers -----------------


def _attach(spark, tmp_path, **kw):
    e = _engine(spark)
    e.attach_index(str(tmp_path / "idx"), num_cells=4, n_probe=4,
                   pq_m=2, pq_ksub=4, **kw)
    return e


def test_indexed_search_requires_attach(spark):
    e = _engine(spark)
    with pytest.raises(ValueError, match="attach_index"):
        e.search(_q(spark, 0, [1.0, 0.0], 3), 3, method="ivf")


def test_indexed_search_matches_expr_at_full_probe(spark, tmp_path):
    """n_probe == num_cells: the indexed result must equal the exact
    scan — routing only prunes, re-rank is the same squared-L2."""
    e = _attach(spark, tmp_path)
    q = _q(spark, 0, [3.2, 0.0], 3)
    for kind in ("ivf", "ivfpq", "sq8"):
        got = {
            (r["rank"], r["id"], round(r["distance"], 6))
            for r in e.search(q, 3, method=kind).collect()
        }
        want = {
            (r["rank"], r["id"], round(r["distance"], 6))
            for r in e.search(q, 3).collect()
        }
        assert got == want and got, kind


def test_indexed_search_reuses_build_until_write(spark, tmp_path):
    """Same epoch -> one build serves every read; a compacted write
    invalidates and the next indexed read REBUILDS (the codebook-memo
    discipline extended to the persisted tier — a stale index can never
    serve a post-write read)."""
    e = _attach(spark, tmp_path)
    q = _q(spark, 0, [3.2, 0.0], 3)
    e.search(q, 3, method="ivf").collect()
    e.search(q, 3, method="ivf").collect()
    assert e.index_builds == 1
    # upsert right at the query point; STRONG forces the compaction
    e.upsert(100, [3.2, 0.0], label=0)
    ids = {
        r["id"]
        for r in e.search(q, 3, method="ivf", consistency=STRONG).collect()
    }
    assert 100 in ids
    assert e.index_builds == 2
    e.delete(100)
    ids = {
        r["id"]
        for r in e.search(q, 3, method="ivf", consistency=STRONG).collect()
    }
    assert 100 not in ids
    assert e.index_builds == 3


def test_indexed_eventual_gate_parity_with_scan_tiers(spark, tmp_path):
    """EVENTUAL between a mutation and its compaction serves the
    pre-mutation snapshot WITHOUT a rebuild — exactly what the scan
    tiers read; after compact() the same call rebuilds and sees the
    write."""
    e = _attach(spark, tmp_path)
    q = _q(spark, 0, [3.2, 0.0], 3)
    e.search(q, 3, method="ivf").collect()
    builds_before = e.index_builds
    e.upsert(100, [3.2, 0.0], label=0)
    ids = {r["id"] for r in e.search(q, 3, method="ivf").collect()}
    assert 100 not in ids and e.index_builds == builds_before
    scan_ids = {r["id"] for r in e.search(q, 3).collect()}
    assert ids == scan_ids  # same staleness window as the scan tier
    e.compact()
    ids = {r["id"] for r in e.search(q, 3, method="ivf").collect()}
    assert 100 in ids and e.index_builds == builds_before + 1


def test_indexed_cosine_kinds(spark, tmp_path):
    """Cosine kinds return (query_id, id, cosine, rank) and match
    brute-force cosine_topk at full probe over the non-zero-norm
    corpus."""
    from distributed_vector_search_system_spark.operators.similarity import (
        cosine_topk,
    )

    e = _attach(spark, tmp_path)
    q = spark.createDataFrame(
        [(0, [1.0, 0.5], 3)], schema=QUERIES_SCHEMA
    )
    nonzero = e._snapshot.filter(F.expr("aggregate(embedding, 0D, (a,x) -> a + x*x) > 0"))
    want = {
        (r["rank"], r["id"], round(r["cosine"], 6))
        for r in cosine_topk(
            nonzero, q.select(F.col("query_id"), F.col("qvec")), 3
        ).collect()
    }
    for kind in ("cosine_ivf", "cosine_ivfpq", "cosine_sq8"):
        got = {
            (r["rank"], r["id"], round(r["cosine"], 6))
            for r in e.search(q, 3, method=kind).collect()
        }
        assert got == want and got, kind


def test_indexed_filtered_search(spark, tmp_path):
    """where= reaches the pruned index scan: the k results are the k
    nearest MATCHING rows."""
    e = _attach(spark, tmp_path)
    q = _q(spark, 0, [3.2, 0.0], 3)
    got = e.search(q, 3, method="ivf", where="label = 1").collect()
    assert got and all(r["id"] % 3 == 1 for r in got)


def test_indexed_requires_dim_for_ivfpq(spark, tmp_path):
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], i % 3) for i in range(10)], schema=VECTORS_SCHEMA
    )
    e = VectorEngine(spark, vectors)  # no dim declared
    e.attach_index(str(tmp_path / "idx"), num_cells=4, pq_m=2, pq_ksub=4)
    with pytest.raises(ValueError, match="dim"):
        e.search(_q(spark, 0, [1.0, 0.0], 3), 3, method="ivfpq")


def test_indexed_rejects_shard_col(spark, tmp_path):
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], i % 3, str(i % 2)) for i in range(10)],
        "vec_id long, embedding array<double>, label int, shard_id string",
    )
    e = VectorEngine(spark, vectors, dim=2, shard_col="shard_id")
    e.attach_index(str(tmp_path / "idx"), num_cells=4)
    with pytest.raises(ValueError, match="shard"):
        e.search(_q(spark, 0, [1.0, 0.0], 3), 3, method="ivf")


def test_attach_index_trained_centroids(spark, tmp_path):
    """centroid_source='trained' runs kmeans_fit per (re)build; routing
    is centroid-agnostic at full probe, so results equal the exact scan
    for the L2 kind and brute-force cosine for the cosine kind."""
    from distributed_vector_search_system_spark.operators.similarity import (
        cosine_topk,
    )

    e = _engine(spark)
    e.attach_index(
        str(tmp_path / "idx"), num_cells=4, n_probe=4,
        centroid_source="trained",
    )
    q = _q(spark, 0, [3.2, 0.0], 3)
    got = {(r["rank"], r["id"]) for r in e.search(q, 3, method="ivf").collect()}
    want = {(r["rank"], r["id"]) for r in e.search(q, 3).collect()}
    assert got == want and e.index_builds == 1
    nonzero = e._snapshot.filter(
        F.expr("aggregate(embedding, 0D, (a,x) -> a + x*x) > 0")
    )
    cgot = {
        (r["rank"], r["id"])
        for r in e.search(q, 3, method="cosine_ivf").collect()
    }
    cwant = {
        (r["rank"], r["id"])
        for r in cosine_topk(
            nonzero, q.select("query_id", "qvec"), 3, query_vector_col="qvec"
        ).collect()
    }
    assert cgot == cwant and e.index_builds == 2
    with pytest.raises(ValueError, match="centroid_source"):
        e.attach_index(str(tmp_path / "idx2"), centroid_source="nope")


# --- incremental store serving (attach_store — VERDICT r07 item 1) --------


def _store_engine(spark, tmp_path, **kw):
    e = _engine(spark)
    e.attach_store(str(tmp_path / "vstore"), num_cells=4, n_probe=4, **kw)
    return e


def _res(df):
    return {(r["query_id"], r["rank"], r["id"], round(r["distance"], 6))
            for r in df.collect()}


def test_store_serves_snapshot_exactly(spark, tmp_path):
    """Full-probe store search == the exact expr scan on the attach-time
    snapshot (probing covers every cell, in-cell ranking is exact)."""
    e = _store_engine(spark, tmp_path)
    q = _q(spark, 0, [3.2, 0.0], 4)
    assert _res(e.search(q, 4, method="store")) == _res(e.search(q, 4))


def test_store_zero_full_rebuilds_across_mutations(spark, tmp_path):
    """THE r07 item-1 contract: upsert → search → delete → search under
    STRONG, served from the store with ZERO full index builds — the
    mutation log reaches the store as O(Δ) appends at compaction (the
    base generation is never rewritten), and every read equals the
    exact scan over the same gated snapshot."""
    e = _store_engine(spark, tmp_path)
    q = _q(spark, 0, [3.2, 0.0], 4)
    e.upsert(100, [3.1, 0.0], label=1)
    got = _res(e.search(q, 4, method="store", consistency=STRONG))
    assert got == _res(e.search(q, 4)) and 100 in {t[2] for t in got}
    e.delete(100)
    got2 = _res(e.search(q, 4, method="store", consistency=STRONG))
    assert got2 == _res(e.search(q, 4)) and 100 not in {t[2] for t in got2}
    # no per-epoch rebuild ran, and the store never re-based
    assert e.index_builds == 0
    assert e.store._current_gen() == "gen-000000"


def test_store_eventual_lags_until_compaction(spark, tmp_path):
    """The gates are uniform across tiers: an EVENTUAL store read
    between a mutation and its compaction serves the pre-write
    snapshot, exactly like the scan tiers."""
    e = _store_engine(spark, tmp_path)
    q = _q(spark, 0, [3.15, 0.0], 1)
    e.upsert(100, [3.15, 0.0], label=1)
    assert 100 not in {t[2] for t in _res(e.search(q, 1, method="store"))}
    e.compact()
    assert 100 in {t[2] for t in _res(e.search(q, 1, method="store"))}


def test_store_lww_across_compactions(spark, tmp_path):
    """Seq remapping (engine._push_to_store): each MutationLog restarts
    its seqs at 1, so a later compaction's upsert must still beat an
    earlier compaction's for the same id — the store-global offset
    keeps pushed seqs monotone."""
    e = _store_engine(spark, tmp_path)
    q = _q(spark, 0, [50.0, 0.0], 1)
    e.upsert(200, [50.0, 0.0], label=1)
    e.compact()
    e.upsert(200, [-50.0, 0.0], label=1)  # move it far away
    e.compact()
    top = _res(e.search(q, 1, method="store"))
    assert top == _res(e.search(q, 1))
    assert 200 not in {t[2] for t in top}  # the LATER write won
    e.delete(200)
    e.compact()
    assert 200 not in {
        t[2] for t in _res(e.search(_q(spark, 0, [-50.0, 0.0], 1), 1, method="store"))
    }


def test_store_upsert_batch_push(spark, tmp_path):
    """The bulk write path pushes its one-generation log too."""
    e = _store_engine(spark, tmp_path)
    ups = spark.createDataFrame(
        [(300, [7.7, 0.0], 1), (3, [7.8, 0.0], 2)],
        "vec_id long, embedding array<double>, label int",
    )
    e.upsert_batch(ups)
    q = _q(spark, 0, [7.7, 0.0], 2)
    got = _res(e.search(q, 2, method="store"))
    assert got == _res(e.search(q, 2))
    assert {t[2] for t in got} == {300, 3}
    # single upserts issued after a bulk batch keep winning (offsets
    # stay monotone across the two push paths)
    e.upsert(300, [90.0, 0.0], label=1)
    e.compact()
    got2 = _res(e.search(q, 2, method="store"))
    assert got2 == _res(e.search(q, 2)) and 300 not in {t[2] for t in got2}


def test_store_compact_store_preserves_and_swaps_generation(spark, tmp_path):
    e = _store_engine(spark, tmp_path)
    e.upsert(100, [3.05, 0.0], label=1)
    e.delete(5)
    e.compact()
    q = _q(spark, 0, [3.0, 0.0], 5)
    before = _res(e.search(q, 5, method="store"))
    e.compact_store()
    assert e.store._current_gen() == "gen-000001"
    assert _res(e.search(q, 5, method="store")) == before


def test_store_guards(spark, tmp_path):
    e = _engine(spark)
    with pytest.raises(ValueError, match="attach_store"):
        e.search(_q(spark, 0, [0.0, 0.0], 2), 2, method="store")
    with pytest.raises(ValueError, match="compact_store"):
        e.compact_store()
    sharded = VectorEngine(
        spark,
        spark.createDataFrame(
            [(i, [float(i), 0.0], None) for i in range(6)], schema=VECTORS_SCHEMA
        ).withColumn("shard_id", (F.col("vec_id") % 2).cast("string")),
        dim=2,
        shard_col="shard_id",
    )
    with pytest.raises(ValueError, match="shard"):
        sharded.attach_store(str(tmp_path / "sstore"))


# --- epoch-directory GC (prune_epochs — VERDICT r07 item 6) ---------------


def test_prune_epochs_keeps_inflight_readers_one_cycle(spark, tmp_path):
    """keep_epochs=1 at compact cadence: the JUST-superseded epoch's
    directory survives the prune that runs at its superseding
    compaction (an in-flight reader can still collect from it), and is
    removed only by the NEXT cycle's prune."""
    import os

    root = str(tmp_path / "gcidx")
    e = _engine(spark)
    e.attach_index(root, num_cells=4, n_probe=4, keep_epochs=1)
    q = _q(spark, 0, [3.2, 0.0], 3)
    e.search(q, 3, method="ivf").collect()  # builds ivf_e0
    # an in-flight reader holding the epoch-0 plan
    inflight = spark.read.parquet(os.path.join(root, "ivf_e0"))
    e.upsert(100, [3.3, 0.0], label=1)
    e.compact()  # prune runs: ivf_e0 is the newest on disk -> survives
    assert os.path.isdir(os.path.join(root, "ivf_e0"))
    assert inflight.count() > 0  # the old reader still drains
    e.search(q, 3, method="ivf").collect()  # builds ivf_e1
    e.upsert(101, [3.4, 0.0], label=1)
    e.compact()  # now ivf_e1 is newest; ivf_e0 goes
    assert not os.path.exists(os.path.join(root, "ivf_e0"))
    assert os.path.isdir(os.path.join(root, "ivf_e1"))


def test_prune_epochs_per_kind_and_guards(spark, tmp_path):
    import os

    root = str(tmp_path / "gcidx2")
    e = _engine(spark)
    with pytest.raises(ValueError, match="attach_index"):
        e.prune_epochs()
    e.attach_index(root, num_cells=4, n_probe=4)
    q = _q(spark, 0, [3.2, 0.0], 3)
    e.search(q, 3, method="ivf").collect()
    e.search(q, 3, method="cosine_ivf").collect()
    e.upsert(100, [3.3, 0.0], label=1)
    e.compact()  # keep_epochs unset: nothing auto-prunes
    e.search(q, 3, method="ivf").collect()
    e.search(q, 3, method="cosine_ivf").collect()
    have = set(os.listdir(root))
    assert {"ivf_e0", "ivf_e1", "cosine_ivf_e0", "cosine_ivf_e1"} <= have
    # a non-epoch file under the root is never touched
    open(os.path.join(root, "README"), "w").write("x")
    removed = e.prune_epochs(keep=1)
    assert sorted(os.path.basename(p) for p in removed) == [
        "cosine_ivf_e0", "ivf_e0",
    ]
    assert os.path.exists(os.path.join(root, "README"))
    with pytest.raises(ValueError, match="keep"):
        e.prune_epochs(keep=0)


def test_text_engine_prune_epochs(spark, tmp_path):
    import os

    from distributed_vector_search_system_spark.text_engine import TextEngine

    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "banana cherry")], "doc_id long, text string"
    )
    te = TextEngine(spark, docs)
    root = str(tmp_path / "lexgc")
    te.attach_index(root, keep_epochs=1)
    q = spark.createDataFrame([(0, ["banana"])], "query_id long, qterms array<string>")
    te.search(q, 2, method="indexed").collect()  # posting_e0
    te.upsert_doc(3, "banana banana")
    te.compact()  # posting_e0 newest -> survives
    assert os.path.isdir(os.path.join(root, "posting_e0"))
    te.search(q, 2, method="indexed").collect()  # posting_e1
    te.upsert_doc(4, "cherry")
    te.compact()
    assert not os.path.exists(os.path.join(root, "posting_e0"))
    assert os.path.isdir(os.path.join(root, "posting_e1"))


def test_bounded_staleness_has_a_real_bound(spark):
    """bounded_staleness tolerates up to max_staleness pending mutations
    (reads stay on the old snapshot, no compaction) and compacts like
    STRONG once the lag exceeds the bound — the declared-but-unbounded
    reference level (search_service_impl.cc:10-12) made concrete.
    max_staleness=0 degenerates to STRONG."""
    from distributed_vector_search_system_spark.engine import (
        BOUNDED_STALENESS,
        VectorEngine,
    )

    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], 0) for i in range(10)], schema=VECTORS_SCHEMA
    )
    e = VectorEngine(spark, vectors, max_staleness=2)
    q = _q(spark, 0, [50.0, 0.0], 3)
    # two pending mutations: within the bound — the read must NOT see
    # them and must not compact
    e.upsert(100, [50.0, 0.0], label=0)
    e.upsert(101, [50.0, 0.0], label=0)
    ids = {r["id"] for r in e.search(q, 3, consistency=BOUNDED_STALENESS).collect()}
    assert 100 not in ids and 101 not in ids
    assert e._pending == 2
    # third pending mutation exceeds the bound: the gate compacts and
    # the read observes ALL pending writes
    e.upsert(102, [50.0, 0.0], label=0)
    ids = {r["id"] for r in e.search(q, 3, consistency=BOUNDED_STALENESS).collect()}
    assert {100, 101, 102} <= ids
    assert e._pending == 0
    # max_staleness=0 == STRONG
    z = VectorEngine(spark, vectors, max_staleness=0)
    z.upsert(100, [50.0, 0.0], label=0)
    ids = {r["id"] for r in z.search(q, 1, consistency=BOUNDED_STALENESS).collect()}
    assert ids == {100} and z._pending == 0
    # the default keeps the reference's lazy behavior for small lags
    d = VectorEngine(spark, vectors)
    d.upsert(100, [50.0, 0.0], label=0)
    d.search(q, 1, consistency=BOUNDED_STALENESS).collect()
    assert d._pending == 1
