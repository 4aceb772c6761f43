"""Query-cache semantics parity (reference C1-C4, SURVEY.md §5.3):
hit/miss, TTL expiry, LRU eviction, invalidate-on-write, and
cache-on == cache-off results."""

from __future__ import annotations

from distributed_vector_search_system_spark.operators.cache import (
    CachedSearcher,
    QueryCache,
)
from distributed_vector_search_system_spark.schemas import VECTORS_SCHEMA


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_hit_miss_and_ttl():
    clock = FakeClock()
    c = QueryCache(max_entries=10, ttl_seconds=30, clock=clock)
    q = [1.0, 2.0]
    assert c.lookup(q, 5) is None  # miss
    c.insert(q, 5, [("r", 1)])
    assert c.lookup(q, 5) == [("r", 1)]  # hit
    assert c.lookup(q, 3) is None  # same vector, different k → different key
    clock.t = 31.0
    assert c.lookup(q, 5) is None  # TTL-expired, lazily erased
    assert len(c) == 0
    assert c.stats.expired == 1


def test_lru_eviction_and_touch():
    c = QueryCache(max_entries=2, ttl_seconds=1000)
    c.insert([1.0], 1, "a")
    c.insert([2.0], 1, "b")
    assert c.lookup([1.0], 1) == "a"  # touch refreshes LRU position
    c.insert([3.0], 1, "c")  # evicts [2.0] (the LRU tail), not [1.0]
    assert c.lookup([2.0], 1) is None
    assert c.lookup([1.0], 1) == "a"
    assert c.lookup([3.0], 1) == "c"
    assert c.stats.evictions == 1


def test_replace_on_duplicate():
    c = QueryCache()
    c.insert([1.0], 1, "old")
    c.insert([1.0], 1, "new")
    assert len(c) == 1
    assert c.lookup([1.0], 1) == "new"


def test_invalidate_clears_all():
    c = QueryCache()
    c.insert([1.0], 1, "a")
    c.insert([2.0], 1, "b")
    c.invalidate()
    assert len(c) == 0
    assert c.stats.invalidations == 1


def test_cached_searcher_transparent(spark):
    """Same rows with cache on (hit) and off — caching is semantics-invisible."""
    vectors = spark.createDataFrame(
        [(i, [float(i), 0.0], None) for i in range(20)], schema=VECTORS_SCHEMA
    )
    s = CachedSearcher(vectors)
    rows1, from_cache1 = s.search(spark, 0, [3.2, 0.0], 4)
    rows2, from_cache2 = s.search(spark, 0, [3.2, 0.0], 4)
    assert not from_cache1 and from_cache2
    assert rows1 == rows2
    assert s.cache.stats.hits == 1 and s.cache.stats.misses == 1
    # invalidate-on-write (reference shard_manager.cc:90,100-101)
    s.on_mutation()
    rows3, from_cache3 = s.search(spark, 0, [3.2, 0.0], 4)
    assert not from_cache3 and rows3 == rows1


def test_cached_searcher_k_zero(spark):
    vectors = spark.createDataFrame([(1, [0.0], None)], schema=VECTORS_SCHEMA)
    s = CachedSearcher(vectors)
    rows, from_cache = s.search(spark, 0, [0.0], 0)
    assert rows == [] and not from_cache
    assert len(s.cache) == 0  # k=0 short-circuits before the cache


# --- persisted cross-session result cache (reference C2/C3 semantics
# surviving process boundaries; VERDICT r01 item 5) ----------------------

def test_persistent_cache_roundtrip_ttl_and_invalidate(spark, tmp_path):
    import datetime as dt

    from distributed_vector_search_system_spark.operators.cache import (
        PersistentResultCache,
    )

    path = str(tmp_path / "result_cache")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    c = PersistentResultCache(spark, path, ttl_seconds=60)

    assert c.probe([1.0, 2.0], 3, now=t0) is None  # empty table → miss
    hits = [(7, 0.25, "0"), (9, 0.5, None)]
    c.put([1.0, 2.0], 3, hits, now=t0)
    assert c.probe([1.0, 2.0], 3, now=t0) == hits          # hit
    assert c.probe([1.0, 2.0], 4, now=t0) is None          # k is part of the key
    assert c.probe([1.0, 2.1], 3, now=t0) is None          # vector is part of the key
    late = t0 + dt.timedelta(seconds=61)
    assert c.probe([1.0, 2.0], 3, now=late) is None        # TTL expiry

    # replace-on-duplicate: newest write wins at probe time
    hits2 = [(8, 0.1, None)]
    c.put([1.0, 2.0], 3, hits2, now=t0 + dt.timedelta(seconds=1))
    assert c.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=2)) == hits2

    # a NEW cache object over the same path sees the entries (cross-session)
    c2 = PersistentResultCache(spark, path, ttl_seconds=60)
    assert c2.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=2)) == hits2

    # M4: invalidation epoch kills all earlier entries, later puts live on
    c2.invalidate(now=t0 + dt.timedelta(seconds=5))
    assert c2.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=6)) is None
    c2.put([1.0, 2.0], 3, hits, now=t0 + dt.timedelta(seconds=10))
    assert c2.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=11)) == hits

    # prune drops dead rows physically
    kept = c2.prune(now=t0 + dt.timedelta(seconds=11))
    assert kept == 1


def test_persistent_cache_epoch_survives_restart(spark, tmp_path):
    """ADVICE r02: the invalidation epoch must be durable — a NEW cache
    object (fresh process/SparkSession analog) over the same path must
    not serve entries a prior object invalidated, even within TTL."""
    import datetime as dt

    from distributed_vector_search_system_spark.operators.cache import (
        PersistentResultCache,
    )

    path = str(tmp_path / "result_cache")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    c1 = PersistentResultCache(spark, path, ttl_seconds=3600)
    c1.put([1.0, 2.0], 3, [(7, 0.25, None)], now=t0)
    c1.invalidate(now=t0 + dt.timedelta(seconds=5))

    # pre-fix behavior: c2 has no in-memory epoch → stale hit until TTL
    c2 = PersistentResultCache(spark, path, ttl_seconds=3600)
    assert c2.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=10)) is None

    # entries written after the persisted epoch are served normally
    c2.put([1.0, 2.0], 3, [(8, 0.1, None)], now=t0 + dt.timedelta(seconds=20))
    c3 = PersistentResultCache(spark, path, ttl_seconds=3600)
    assert c3.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=30)) == [
        (8, 0.1, None)
    ]


def test_persistent_cache_live_session_sees_later_invalidate(spark, tmp_path):
    """ADVICE r03: a LONG-LIVED cache object must observe another
    session's later invalidate() on its next probe — the epoch is
    re-read per probe, not only at __init__."""
    import datetime as dt

    from distributed_vector_search_system_spark.operators.cache import (
        PersistentResultCache,
    )

    path = str(tmp_path / "result_cache")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    long_lived = PersistentResultCache(spark, path, ttl_seconds=3600)
    long_lived.put([1.0, 2.0], 3, [(7, 0.25, None)], now=t0)
    assert long_lived.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=1)) == [
        (7, 0.25, None)
    ]

    # another session invalidates AFTER long_lived was constructed
    other = PersistentResultCache(spark, path, ttl_seconds=3600)
    other.invalidate(now=t0 + dt.timedelta(seconds=5))

    # pre-fix: long_lived's __init__-time epoch (None) served the stale hit
    assert long_lived.probe([1.0, 2.0], 3, now=t0 + dt.timedelta(seconds=10)) is None


def test_semantic_probe_hit_and_miss(spark):
    """C4 semantic reuse: an identical query vector hits (cosine 1,
    served by its twin); a far vector misses and must fall through
    (served_by NULL); tie-break picks the lowest cached id."""
    from distributed_vector_search_system_spark.operators.cache import semantic_probe

    cached = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [1.0, 0.0, 0.0]), (12, [0.0, 1.0, 0.0])],
        "cached_id long, cvec array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0]), (3, [0.0, 0.9, 0.1])],
        "query_id long, qvec array<double>",
    )
    got = {
        r["query_id"]: (r["served_by"], r["hit"], round(r["cosine"], 6))
        for r in semantic_probe(cached, queries, threshold=0.9).collect()
    }
    assert got[1] == (10, True, 1.0)        # exact twin; id 10 beats 11
    assert got[2] == (None, False, 0.0)     # orthogonal to everything
    # q3 vs cached 12: cos = 0.9/sqrt(0.82) ~= 0.993884 -> hit
    assert got[3][0] == 12 and got[3][1] is True


def test_semantic_probe_empty_cache_yields_miss_rows(spark):
    """Cold start (zero cached entries) must return one miss row per
    query — NULL served_by, hit=false — not zero rows (review finding)."""
    from pyspark.sql import functions as F

    from distributed_vector_search_system_spark.operators.cache import semantic_probe

    cached = spark.createDataFrame(
        [], "cached_id long, cvec array<double>"
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "query_id long, qvec array<double>"
    )
    rows = semantic_probe(cached, queries, threshold=0.8).collect()
    assert {r["query_id"] for r in rows} == {1, 2}
    assert all(r["served_by"] is None and not r["hit"] for r in rows)
