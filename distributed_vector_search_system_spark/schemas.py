"""Declared schemas — the engine never relies on inference.

The reference declares every wire type in its four .proto files and
enforces a single config-declared vector dimension across shards
(reference: proto/config.proto:9, src/index/shard_manager.cc:20-23,
src/index/vector_shard.cc:36-38).  We mirror that: vectors are
``array<float>`` with a load-time dimension assertion, ids are signed
64-bit (the reference itself narrows uint64 to signed faiss::idx_t at
src/index/vector_shard.cc:52).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- vector-engine schemas ------------------------------------------------

#: A stored vector point (reference: proto/search.proto:14-16 + id).
VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: One query row (reference: proto/search.proto:18-24 SearchRequest).
QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("qvec", T.ArrayType(T.FloatType(), False), False),
        T.StructField("top_k", T.IntegerType(), True),
    ]
)

#: Search hit (reference: proto/search.proto:26-35 ScoredPoint).
RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("distance", T.DoubleType(), False),
        T.StructField("shard_id", T.StringType(), True),
        T.StructField("rank", T.IntegerType(), False),
    ]
)

#: Append-only mutation log row (reference: proto/mutation.proto:7-14
#: CommandEnvelope + proto/raft.proto LocalLogEntry; the Raft total order
#: becomes a driver-assigned dense ``seq``).
MUTATIONS_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # 'upsert' | 'delete'
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("shard_id", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: Persisted query-result cache row (reference: include/cache/query_cache.h
#: QueryCache entries, keyed by (digest(query bytes), top_k) with TTL).
RESULT_CACHE_SCHEMA = T.StructType(
    [
        T.StructField("digest", T.LongType(), False),
        T.StructField("top_k", T.IntegerType(), False),
        T.StructField(
            "hits",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType(), False),
                        T.StructField("distance", T.DoubleType(), False),
                        T.StructField("shard_id", T.StringType(), True),
                    ]
                )
            ),
            False,
        ),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("expires_at", T.TimestampType(), False),
    ]
)

# --- fixture tables (TPC-H-ish, per FIXTURES.md) --------------------------

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def assert_vector_dimension(df, dim: int, vector_col: str = "embedding") -> None:
    """Cheap load-time dimension invariant (reference validates dimension on
    load src/index/vector_shard.cc:36-38, on upsert :47-49 and on every
    query src/index/shard_manager.cc:121-124).

    Executes one aggregation; call at load time, not per-query.
    """
    from pyspark.sql import functions as F

    bad = df.filter(F.size(F.col(vector_col)) != dim).limit(1).count()
    if bad:
        raise ValueError(
            f"dimension invariant violated: found rows where size({vector_col}) != {dim}"
        )
