"""Mutable standing-query registry (sources/percolator_store.py) and
the engine-gated percolation verbs (text_engine.TextEngine.percolate,
register_query/unregister_query) — VERDICT r10 items 2 and 7.
Exactness vs DuckDB is the ``percolate_store_matches`` row in
test_oracle_parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.percolate import percolate
from distributed_vector_search_system_spark.sources.percolator_store import (
    LOG_SCHEMA,
    PercolatorStore,
)
from distributed_vector_search_system_spark.text_engine import TextEngine


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta"),
        (3, "gamma delta epsilon"),
        (4, "alpha epsilon zeta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stored(spark, rows):
    return spark.createDataFrame(
        rows,
        "query_id long, qterms array<string>, none_terms array<string>, "
        "min_match int",
    )


def _log(spark, rows):
    return spark.createDataFrame(rows, LOG_SCHEMA)


_INIT = [
    (10, ["alpha", "beta"], None, None),          # conjunctive
    (11, ["gamma", "delta", "zeta"], None, 2),    # 2-of-3
    (12, ["alpha"], ["zeta"], None),              # negative veto
]

_MUTS = [
    # update query 10: now 1-of-{beta, epsilon}
    (1, "upsert", 10, ["beta", "epsilon"], None, 1),
    # unregister query 12
    (2, "delete", 12, None, None, None),
    # register a new conjunctive alert
    (3, "upsert", 13, ["epsilon", "zeta"], None, None),
    # unregister an absent id: no-op
    (4, "delete", 999, None, None, None),
]

_FOLDED = [
    (10, ["beta", "epsilon"], None, 1),
    (11, ["gamma", "delta", "zeta"], None, 2),
    (13, ["epsilon", "zeta"], None, None),
]


def _pairs(df):
    return {
        (r["doc_id"], r["query_id"], r["matched"], r["required"])
        for r in df.collect()
    }


def _match(spark, corpus, registry):
    return percolate(
        corpus, registry,
        none_terms_col="none_terms", min_match_col="min_match",
    )


def test_per_query_min_match_column(spark, corpus):
    """NULL min_match = conjunctive; integers clamp (ES semantics)."""
    got = _pairs(_match(spark, corpus, _stored(spark, _INIT)))
    assert got == {
        (1, 10, 2, 2), (2, 10, 2, 2),            # conjunctive pair
        (1, 11, 2, 2), (3, 11, 2, 2),            # 2-of-3
        (1, 12, 1, 1), (2, 12, 1, 1),            # veto kills doc 4
    }
    # per-row threshold above the term count clamps down; below 1 up
    weird = _stored(spark, [(20, ["zeta"], None, 5), (21, ["alpha"], None, 0)])
    got2 = _pairs(_match(spark, corpus, weird))
    assert got2 == {(4, 20, 1, 1), (1, 21, 1, 1), (2, 21, 1, 1), (4, 21, 1, 1)}


def test_store_fold_matches_manual_fold(spark, corpus, tmp_path):
    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, _INIT))
    s.apply_log(_log(spark, _MUTS))
    got = _pairs(_match(spark, corpus, s.registry_view(spark)))
    want = _pairs(_match(spark, corpus, _stored(spark, _FOLDED)))
    assert got == want and got


def test_store_redelivery_idempotent(spark, corpus, tmp_path):
    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, _INIT))
    log = _log(spark, _MUTS)
    s.apply_log(log)
    before = _pairs(_match(spark, corpus, s.registry_view(spark)))
    s.apply_log(log)  # redelivered batch
    assert _pairs(_match(spark, corpus, s.registry_view(spark))) == before


def test_store_compact_preserves_and_keeps_tombstones(spark, corpus, tmp_path):
    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, _INIT))
    s.apply_log(_log(spark, _MUTS))
    before = _pairs(_match(spark, corpus, s.registry_view(spark)))
    s.compact(spark)
    assert not s._is_dirty(spark)
    assert _pairs(_match(spark, corpus, s.registry_view(spark))) == before
    # a redelivered PRE-delete register of query 12 must stay dead
    # (its tombstone survived the fold)
    s.apply_log(_log(spark, [(0, "upsert", 12, ["alpha"], ["zeta"], None)]))
    after = _pairs(_match(spark, corpus, s.registry_view(spark)))
    assert after == before
    # GC keeps current + previous
    assert len(s.generations()) == 2


def test_store_delete_ids_sweep_and_seq_floor(spark, corpus, tmp_path):
    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, _INIT))
    ids = spark.createDataFrame([(10,), (999,)], "query_id long")
    assert s.delete_ids(ids) == 1          # absent id is a no-op
    live = {r["query_id"] for r in s.registry_view(spark).collect()}
    assert live == {11, 12}
    s.seq_floor = 50
    with pytest.raises(ValueError):
        s.delete_ids(ids, seq=50)          # colliding sweep seq rejected


def test_store_generation_pinned_reads(spark, tmp_path):
    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, _INIT))
    s.apply_log(_log(spark, _MUTS))
    s.compact(spark)
    gens = s.generations()
    assert len(gens) == 2
    pinned = s.at(gens[0])
    # the pin freezes the generation at its pre-compact state (its own
    # log included — the sibling stores' semantics): mutations applied
    # to the CURRENT generation are invisible to it
    s.apply_log(_log(spark, [(10, "delete", 10, None, None, None)]))
    assert {r["query_id"] for r in pinned.registry_view(spark).collect()} == {
        10, 11, 13,
    }
    assert {r["query_id"] for r in s.registry_view(spark).collect()} == {11, 13}
    with pytest.raises(ValueError):
        pinned.apply_log(_log(spark, _MUTS))
    with pytest.raises(ValueError):
        s.at("gen-424242")


def test_store_streaming_log_sink(spark, corpus, tmp_path):
    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, _INIT))
    src = str(tmp_path / "stream_src")
    _log(spark, _MUTS).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        _log(spark, _MUTS).schema
    ).parquet(src)
    q = s.streaming_log_sink(
        stream, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = _pairs(_match(spark, corpus, s.registry_view(spark)))
    want = _pairs(_match(spark, corpus, _stored(spark, _FOLDED)))
    assert got == want and got


# -- engine-gated percolation (VERDICT r10 item 7) ---------------------------


def _engine(spark, corpus):
    return TextEngine(spark, corpus)


def test_engine_strong_percolate_folds_registry(spark, corpus):
    e = _engine(spark, corpus)
    e.register_query(10, ["alpha", "beta"])
    # EVENTUAL serves the stale (empty) registry
    assert e.percolate(consistency="eventual").count() == 0
    # STRONG folds the pending registration first
    got = _pairs(e.percolate(consistency="strong"))
    assert got == {(1, 10, 2, 2), (2, 10, 2, 2)}
    # unregister: eventual still serves; strong folds
    e.unregister_query(10)
    assert _pairs(e.percolate(consistency="eventual")) == got
    assert e.percolate(consistency="strong").count() == 0


def test_engine_strong_percolate_folds_corpus_too(spark, corpus):
    """STRONG = fold pending registry AND corpus mutations — the verb
    can never mix a fresh registry with a stale corpus."""
    e = _engine(spark, corpus)
    e.register_query(10, ["omega"])
    e.upsert_doc(9, "omega omega")
    got = _pairs(e.percolate(consistency="strong"))
    assert got == {(9, 10, 1, 1)}
    # a deleted doc stops matching under STRONG
    e.delete_doc(9)
    assert e.percolate(consistency="strong").count() == 0


def test_engine_percolate_external_batch_gates_registry_only(spark, corpus):
    e = _engine(spark, corpus)
    e.register_query(10, ["beta"], none_terms=["zeta"])
    batch = spark.createDataFrame(
        [(100, "beta zeta"), (101, "beta")], "doc_id long, text string"
    )
    got = _pairs(e.percolate(batch, consistency="strong"))
    assert got == {(101, 10, 1, 1)}          # veto kills doc 100


def test_engine_percolate_per_query_min_match_and_validation(spark, corpus):
    e = _engine(spark, corpus)
    e.register_query(11, ["gamma", "delta", "zeta"], min_match=2)
    got = {r["doc_id"] for r in e.percolate(consistency="strong").collect()}
    assert got == {1, 3}
    with pytest.raises(ValueError):
        e.register_query(12, [])
    with pytest.raises(ValueError):
        e.register_query(12, ["a"], min_match=0)
    with pytest.raises(ValueError):
        e.percolate(consistency="linearizable")


def test_engine_scored_percolate_gates(spark, corpus):
    e = _engine(spark, corpus)
    e.register_query(10, ["alpha", "beta"])
    got = e.percolate(consistency="strong", scored=True)
    assert set(got.columns) == {
        "doc_id", "query_id", "matched", "required", "score",
    }
    rows = {r["doc_id"]: r["score"] for r in got.collect()}
    assert set(rows) == {1, 2} and all(v > 0 for v in rows.values())


def test_engine_attached_percolator_store_tracks_registry(spark, corpus, tmp_path):
    e = _engine(spark, corpus)
    e.register_query(10, ["alpha", "beta"])
    e.compact_registry()
    e.attach_percolator(str(tmp_path / "pstore"))
    e.register_query(10, ["beta", "epsilon"], min_match=1)   # update
    e.register_query(13, ["epsilon", "zeta"])
    e.unregister_query(13)
    e.compact_registry()                      # pushes the log as O(Δ)
    store = e._perc_store
    got = _pairs(_match(spark, corpus, store.registry_view(spark)))
    want = _pairs(e.percolate(consistency="strong"))
    assert got == want and got
    # the store survives a registry mutation between reads the same
    # way (percolate_stream restartability under a changing registry)
    e.unregister_query(10)
    e.compact_registry()
    assert store.registry_view(spark).count() == 0


def test_engine_bounded_staleness_registry_lag_bound(spark, corpus):
    e = TextEngine(spark, corpus, max_staleness=2)
    for i, t in enumerate(("alpha", "beta", "gamma")):
        e.register_query(20 + i, [t])
        # 1 and 2 pending: bounded tolerates; 3rd crosses the bound
    got = e.percolate(consistency="bounded_staleness")
    assert got.count() > 0 and e._perc_pending == 0


def test_percolate_stream_survives_registry_mutations(spark, tmp_path):
    """VERDICT r10 item 2 (streaming leg): a store-backed
    percolate_stream re-resolves the folded registry per micro-batch —
    mutations between batches take effect on the next batch, and a
    checkpoint restart percolates only NEW docs against the registry
    as it stands."""
    from distributed_vector_search_system_spark.operators.percolate import (
        percolate_stream,
    )

    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, [(10, ["alpha", "beta"], None, None)]))
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "epsilon zeta")], schema
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = percolate_stream(
        stream, s, out, checkpoint=ckpt,
        none_terms_col="none_terms", min_match_col="min_match",
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10)}
    # mutate the registry BETWEEN batches: register a new alert,
    # unregister the old one
    s.apply_log(
        _log(spark, [
            (1, "upsert", 11, ["epsilon", "zeta"], None, None),
            (2, "delete", 10, None, None, None),
        ])
    )
    spark.createDataFrame(
        [(3, "alpha beta"), (4, "epsilon zeta gamma")], schema
    ).write.mode("append").parquet(src)
    q2 = percolate_stream(
        spark.readStream.schema(schema).parquet(src), s, out,
        checkpoint=ckpt,
        none_terms_col="none_terms", min_match_col="min_match",
    )
    q2.awaitTermination(120)
    got2 = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    }
    # doc 3 matches NOTHING (query 10 is gone), doc 4 matches the new
    # alert; the first batch's alert is not recomputed (checkpointed)
    assert got2 == {(1, 10), (4, 11)}


def test_describe_percolator_store(spark, tmp_path):
    from distributed_vector_search_system_spark.sources.percolator_store import (
        describe_percolator_store,
    )

    s = PercolatorStore(str(tmp_path / "perc"))
    s.init_base(_stored(spark, _INIT))
    d0 = describe_percolator_store(s, spark)
    assert d0["live_queries"] == 3 and not d0["dirty"]
    s.apply_log(_log(spark, _MUTS))
    d1 = describe_percolator_store(s, spark)
    assert d1["dirty"] and d1["mutation_backlog_rows"] == 4
    # tombstones count per-id delete WINNERS — including the absent-id
    # unregister (999), which is a read-path no-op but folds to a
    # tombstone row like any logged delete
    assert d1["live_queries"] == 3 and d1["tombstones"] == 2
    s.compact(spark)
    d2 = describe_percolator_store(s, spark)
    assert not d2["dirty"] and d2["mutation_backlog_rows"] == 0


def test_register_query_dsl_translation(spark, corpus):
    """round 12: DSL-bodied registration stores exactly what the
    positional form stores — percolation results identical."""
    import pytest

    e1 = TextEngine(spark, corpus)
    e1.register_query(1, ["alpha"], min_match=1)
    e1.register_query(2, ["beta", "gamma"], none_terms=["delta"])
    e1.register_query(3, ["alpha", "beta", "gamma"], min_match=2)
    want = _pairs(e1.percolate(consistency="strong"))

    e2 = TextEngine(spark, corpus)
    e2.register_query_dsl(1, {"match": {"terms": ["alpha"]}})
    e2.register_query_dsl(
        2, {"bool": {"must": ["beta", "gamma"], "must_not": ["delta"]}}
    )
    e2.register_query_dsl(
        3, {"bool": {"should": ["alpha", "beta", "gamma"],
                     "minimum_should_match": 2}}
    )
    got = _pairs(e2.percolate(consistency="strong"))
    assert got == want and got

    with pytest.raises(ValueError, match="one clause"):
        e2.register_query_dsl(
            9, {"bool": {"must": ["a"], "should": ["b"]}}
        )
    with pytest.raises(ValueError, match="TEXT only"):
        e2.register_query_dsl(
            9, {"bool": {"must": ["a"],
                         "filter": [{"term": {"lang": "en"}}]}}
        )
    with pytest.raises(ValueError, match="positive clause"):
        e2.register_query_dsl(9, {"bool": {"must_not": ["a"]}})
    with pytest.raises(ValueError, match="match or bool"):
        e2.register_query_dsl(9, {"fuzzy": {"terms": ["a"]}})
