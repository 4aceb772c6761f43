"""Query-result cache — reference C1-C4 (SURVEY.md §2.4).

Reference: ``QueryCache`` maps ``(fnv1a64(query bytes), top_k)`` → cached
hits with LRU eviction + TTL, lazily erasing expired entries on lookup and
fully invalidating on any applied mutation
(include/cache/query_cache.h:15-33, src/cache/query_cache.cc:15-49,
src/index/shard_manager.cc:38-44,54,90,100-101).

Spark shape: result sets are tiny (k rows per query), so the cache is a
driver-side structure — exactly like the reference's per-node in-memory
cache — keyed by a stable digest of the query vector + k.  Caching is
semantics-invisible: ``CachedSearcher`` returns the same rows with the
cache on or off (the real test, per SURVEY §7 Stage 3).  For cross-job
persistence the same rows can be written to a ``result_cache`` parquet
table (RESULT_CACHE_SCHEMA) and probed with
``WHERE digest = ? AND top_k = ? AND expires_at > now()``.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .knn import knn

#: defaults mirror the reference's ConfigLoader defaults
#: (src/util/config.cc:41-42): 1024 entries, 60 s TTL.
DEFAULT_MAX_ENTRIES = 1024
DEFAULT_TTL_SECONDS = 60.0


def _digest(qvec: tuple[float, ...], k: int) -> int:
    """Stable digest of (query vector bytes, k) — the reference hashes the
    raw float bytes with FNV-1a and mixes in top_k
    (src/cache/query_cache.cc:51-56,76-87); only equality matters."""
    import struct

    h = 0xCBF29CE484222325  # FNV-1a offset basis, same constants as reference
    for b in struct.pack(f"<{len(qvec)}f", *qvec):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h ^ (k * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0
    invalidations: int = 0
    expired: int = 0


@dataclass
class _Entry:
    rows: list = field(default_factory=list)
    created_at: float = 0.0


class QueryCache:
    """LRU + TTL cache of materialized top-k results (reference C1-C3)."""

    def __init__(
        self,
        max_entries: int = DEFAULT_MAX_ENTRIES,
        ttl_seconds: float = DEFAULT_TTL_SECONDS,
        clock=time.monotonic,
    ):
        self._max = max_entries
        self._ttl = ttl_seconds
        self._clock = clock
        self._map: OrderedDict[tuple[int, int], _Entry] = OrderedDict()
        self.stats = CacheStats()

    def lookup(self, qvec, k: int):
        """Hit iff present and unexpired; expired entries are erased lazily;
        a hit refreshes LRU position (C2, query_cache.cc:15-29,58-66)."""
        key = (_digest(tuple(qvec), k), k)
        e = self._map.get(key)
        if e is None:
            self.stats.misses += 1
            return None
        if self._clock() - e.created_at > self._ttl:
            del self._map[key]
            self.stats.expired += 1
            self.stats.misses += 1
            return None
        self._map.move_to_end(key)  # Touch
        self.stats.hits += 1
        return e.rows

    def insert(self, qvec, k: int, rows) -> None:
        """Replace-on-duplicate, push-front, evict LRU tail while over
        capacity (C3, query_cache.cc:31-43,68-74)."""
        key = (_digest(tuple(qvec), k), k)
        self._map[key] = _Entry(rows=rows, created_at=self._clock())
        self._map.move_to_end(key)
        while len(self._map) > self._max:
            self._map.popitem(last=False)
            self.stats.evictions += 1

    def invalidate(self) -> None:
        """Full clear on any mutation (C4/M4, query_cache.cc:45-49 called
        from shard_manager.cc:90,100-101)."""
        self._map.clear()
        self.stats.invalidations += 1

    def __len__(self) -> int:
        return len(self._map)


def _signed64(h: int) -> int:
    """Fold an unsigned 64-bit digest into Spark's signed LongType range."""
    h &= 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


def probe_plan(cache_df: DataFrame, now):
    """C2 lookup semantics as a dataflow: for every (digest, top_k) key
    keep the NEWEST entry, and report whether it is live at ``now``
    (reference lazily erases expired entries on lookup,
    src/cache/query_cache.cc:15-29; replace-on-duplicate means the newest
    row is the authoritative one, :31-43).

    Shared by :class:`PersistentResultCache` and the oracle-checked
    ``cache_persistent_probe`` registry query, so the probe predicate the
    driver verifies is the one production uses.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("digest", "top_k").orderBy(
        F.col("created_at").desc(), F.col("expires_at").desc()
    )
    return (
        cache_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("live", F.col("expires_at") > now)
    )


class PersistentResultCache:
    """Cross-session result cache over a parquet table with
    RESULT_CACHE_SCHEMA — the reference's cache survives across requests
    within a node process (src/cache/query_cache.cc:15-43); this one
    survives across SparkSessions by living in storage.

    Writes append (replace-on-duplicate = newest ``created_at`` wins at
    probe time); ``invalidate()`` bumps a version epoch so every earlier
    entry is dead (M4 full-clear, query_cache.cc:45-49) without a
    read-modify-write of the whole table; ``prune()`` is the compaction
    that physically drops dead rows.
    """

    def __init__(self, spark, path: str, *, ttl_seconds: float = DEFAULT_TTL_SECONDS):
        self._spark = spark
        self._path = path
        self._ttl = ttl_seconds
        # entries created before this are invalid; the epoch itself is
        # persisted (tiny single-row parquet beside the table) so the
        # cross-session contract holds: a NEW SparkSession opening the
        # same path must not serve entries a prior session invalidated.
        self._version_ts = self._read_epoch()

    @property
    def _epoch_path(self) -> str:
        return self._path.rstrip("/") + "_epoch"

    def _read_epoch(self):
        # Broad catch (ADVICE r03): besides AnalysisException (path
        # absent), a concurrent _write_epoch's non-atomic overwrite can
        # surface as a Py4J FileNotFound mid-collect; a transiently
        # unreadable epoch must degrade to "no epoch known", not crash
        # the probe.  The writer re-lands the file immediately after.
        # A PERSISTENT failure, though, silently disables cross-session
        # invalidation — so non-absence errors warn once until a read
        # succeeds again.
        from pyspark.errors import AnalysisException

        try:
            rows = self._spark.read.parquet(self._epoch_path).collect()
        except AnalysisException:  # epoch never written
            return None
        except Exception as e:
            if not getattr(self, "_epoch_warned", False):
                import warnings

                warnings.warn(
                    f"persistent cache epoch unreadable ({e!r}); serving "
                    "without cross-session invalidation until it reads again",
                    RuntimeWarning,
                    stacklevel=2,
                )
                self._epoch_warned = True
            return None
        self._epoch_warned = False
        return max((r["epoch"] for r in rows), default=None)

    def _refresh_epoch(self) -> None:
        """Pick up another session's later invalidate() (ADVICE r03: an
        epoch read only at __init__ let a long-lived session serve stale
        hits until TTL).  The epoch is a tiny single-row read; epochs
        only move forward, so take the max with what we already know."""
        stored = self._read_epoch()
        if stored is not None and (
            self._version_ts is None or stored > self._version_ts
        ):
            self._version_ts = stored

    def _write_epoch(self, ts) -> None:
        self._spark.createDataFrame([(ts,)], schema="epoch timestamp").write.mode(
            "overwrite"
        ).parquet(self._epoch_path)

    def _read(self) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        from ..schemas import RESULT_CACHE_SCHEMA

        try:
            return self._spark.read.schema(RESULT_CACHE_SCHEMA).parquet(self._path)
        except AnalysisException:
            return None  # no cache written yet

    def put(self, qvec, k: int, hits, *, now=None) -> None:
        """Insert (C3): hits = [(id, distance, shard_id), ...]."""
        import datetime as _dt

        from ..schemas import RESULT_CACHE_SCHEMA

        now = now if now is not None else _dt.datetime.now()
        expires = now + _dt.timedelta(seconds=self._ttl)
        row = [
            (
                _signed64(_digest(tuple(qvec), k)),
                k,
                [tuple(h) for h in hits],
                now,
                expires,
            )
        ]
        self._spark.createDataFrame(row, schema=RESULT_CACHE_SCHEMA).write.mode(
            "append"
        ).parquet(self._path)

    def probe(self, qvec, k: int, *, now=None):
        """Lookup (C2): newest entry for the key, live and
        post-invalidation only.  Returns the hits list or None."""
        import datetime as _dt

        from pyspark.sql import functions as F

        now = now if now is not None else _dt.datetime.now()
        self._refresh_epoch()
        df = self._read()
        if df is None:
            return None
        key = _signed64(_digest(tuple(qvec), k))
        entries = df.filter((F.col("digest") == key) & (F.col("top_k") == k))
        if self._version_ts is not None:
            entries = entries.filter(F.col("created_at") >= F.lit(self._version_ts))
        best = probe_plan(entries, F.lit(now)).filter(F.col("live"))
        rows = best.select("hits").collect()
        if not rows:
            return None
        return [tuple(h) for h in rows[0]["hits"]]

    def invalidate(self, *, now=None) -> None:
        """M4 full clear as a version-epoch bump — O(1) in the table (no
        rewrite); the epoch is persisted so it survives process restarts
        (ADVICE r02: driver-memory-only epoch leaked pre-invalidation
        entries to the next session until TTL)."""
        import datetime as _dt

        self._version_ts = now if now is not None else _dt.datetime.now()
        self._write_epoch(self._version_ts)

    def prune(self, *, now=None) -> int:
        """Physically drop expired / invalidated rows (C3 eviction analog);
        returns surviving row count."""
        import datetime as _dt

        from pyspark.sql import functions as F

        now = now if now is not None else _dt.datetime.now()
        df = self._read()
        if df is None:
            return 0
        keep = df.filter(F.col("expires_at") > F.lit(now))
        if self._version_ts is not None:
            keep = keep.filter(F.col("created_at") >= F.lit(self._version_ts))
        kept = keep.collect()  # tiny by construction (≤ max_entries · k rows)
        from ..schemas import RESULT_CACHE_SCHEMA

        self._spark.createDataFrame(kept, schema=RESULT_CACHE_SCHEMA).write.mode(
            "overwrite"
        ).parquet(self._path)
        return len(kept)


class CachedSearcher:
    """Search pipeline with the cache short-circuit (reference Q5:
    cache lookup → fan-out+merge on miss → cache fill,
    src/index/shard_manager.cc:30-59)."""

    def __init__(self, vectors: DataFrame, cache: QueryCache | None = None, **knn_kwargs):
        self._vectors = vectors
        self._cache = cache if cache is not None else QueryCache()
        self._knn_kwargs = knn_kwargs

    @property
    def cache(self) -> QueryCache:
        return self._cache

    def search(self, spark, query_id: int, qvec, k: int) -> tuple[list, bool]:
        """Single search; returns (rows, served_from_cache)."""
        if k <= 0:
            return [], False
        cached = self._cache.lookup(qvec, k)
        if cached is not None:
            return cached, True
        from ..schemas import QUERIES_SCHEMA

        qdf = spark.createDataFrame(
            [(query_id, [float(x) for x in qvec], k)], schema=QUERIES_SCHEMA
        )
        rows = [
            (r["id"], r["distance"], r["rank"])
            for r in knn(self._vectors, qdf, k, **self._knn_kwargs)
            .orderBy("rank")
            .collect()
        ]
        self._cache.insert(qvec, k, rows)
        return rows, False

    def on_mutation(self) -> None:
        self._cache.invalidate()


def semantic_probe(
    cached: DataFrame,
    queries: DataFrame,
    *,
    threshold: float,
    cached_id_col: str = "cached_id",
    cached_vec_col: str = "cvec",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """C4 made live: the reference declares an ``exact_match`` flag on its
    cache-lookup surface but never wires it (include/cache/query_cache.h:30-33
    — dead code, SURVEY §2.4).  This is the feature that flag implies:
    SEMANTIC cache reuse — an incoming query may be served by the stored
    result of the nearest previously-cached query when the two query
    vectors are close enough, instead of requiring digest equality.

    For each incoming query: nearest cached entry by cosine (tie-break
    lowest cached id); ``hit`` iff cosine ≥ ``threshold``; ``served_by``
    is the serving cache entry's id (NULL on miss — caller falls through
    to the exact search path, as ``CachedSearcher`` does on digest miss).

    Scale shape: the cache is small by contract (reference default 1024
    entries) → broadcast; the corpus-side work is one map-side pass, a
    partitioned rank, no shuffle of the query table beyond its own key.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.distance import cosine_similarity

    scored = queries.join(F.broadcast(cached), how="cross").select(
        F.col(query_id_col).alias("query_id"),
        F.col(cached_id_col).alias("_cid"),
        cosine_similarity(F.col(query_vec_col), F.col(cached_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("_cid").asc())
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    # left join from the query set: an EMPTY cache (cold start) must
    # yield a miss row per query — NULL cosine, hit=false — not zero
    # rows, or the caller would fall through for no query at all
    out = queries.select(F.col(query_id_col).alias("query_id")).join(
        best.drop("_rn"), on="query_id", how="left"
    )
    hit = F.col("cosine").isNotNull() & (F.col("cosine") >= float(threshold))
    return out.select(
        "query_id",
        F.when(hit, F.col("_cid")).alias("served_by"),
        "cosine",
        hit.alias("hit"),
    )
