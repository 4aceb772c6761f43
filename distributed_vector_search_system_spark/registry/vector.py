"""Vector-search query surface (reference SURVEY.md §2.2-§2.3).

Each entry pairs the Spark plan with a DuckDB oracle computing the same
thing.  Query sets are deterministic slices of ``embeddings`` (FIXTURES.md:
queries are drawn from embeddings rows so the oracle can compute the same
squared-L2 distances).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.knn import knn, shard_cardinality, sharded_knn
from ..operators.mutations import apply_mutations
from ..tables import load_table

# ---------------------------------------------------------------------------
# helpers

#: squared-L2 in DuckDB, double-promoted, matching functions.distance.squared_l2
_SQL_SQ_L2 = (
    "(SELECT SUM((CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE)) * "
    "(CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE))) "
    "FROM (SELECT UNNEST({q}) AS a, UNNEST({v}) AS b) u)"
)


def _knn_oracle(query_pred: str, vector_pred: str, k: int) -> str:
    dist = _SQL_SQ_L2.format(q="q.qe", v="v.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE {query_pred}),
v AS (SELECT vec_id, embedding FROM embeddings WHERE {vector_pred}),
scored AS (SELECT q.query_id, v.vec_id AS id, {dist} AS distance FROM q CROSS JOIN v),
ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= {k}
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _query_set(emb: DataFrame, pred) -> DataFrame:
    return emb.filter(pred).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _round_result(df: DataFrame) -> DataFrame:
    return df.select("query_id", "id", F.round("distance", 6).alias("distance"), "rank")


# ---------------------------------------------------------------------------
# Q5: single search (one query row through the full pipeline)

def q_knn_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") == 0)
    return _round_result(knn(emb, q, 10))


# Q6: batch search — N query rows, same single plan (the idiomatic win).
# Served from the Arrow/GEMM tier (round-13 optimization): one BLAS
# matrix multiply per Arrow batch + per-batch partial top-k instead of
# per-pair zip_with folds — measured 1.28 s → 0.53 s at sf0.1 (guide
# §4.2, "hand whole batches to vectorized native libraries").  Results
# are tier-independent by the rank_key discipline (knn_batch_numpy has
# shared this row's oracle verbatim since round 2; re-verified at
# sf0.001/0.01/0.1); the expr tier stays driver-covered via knn_single
# / knn_sharded / knn_edge_k and the cross-tier equivalence tests.

def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 50 == 0)
    return _round_result(knn(emb, q, 10, method="numpy"))


# Q3+Q4: explicit per-shard partial top-k + global merge; results must be
# identical to the unsharded plan, so it shares the plain-knn oracle.

def q_knn_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn("shard_id", (F.col("vec_id") % 6).cast("string"))
    q = _query_set(emb, F.col("vec_id") % 100 == 1)
    return sharded_knn(emb, q, 7, shard_col="shard_id").select(
        "query_id", "id", F.round("distance", 6).alias("distance"), "rank"
    )


# Q1/Q5 edge cases, merged into one driver entry (keeps the registry
# within the driver's 50-query correctness window):
#  - k larger than the table returns every row (FAISS pads with -1
#    labels which the reference drops, src/index/vector_shard.cc:83-86);
#  - top_k == 0 short-circuits to empty (src/index/shard_manager.cc:31-36)
#    — the union proves the k=0 branch contributes exactly zero rows.

def q_knn_edge_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    vectors = emb.filter(F.col("vec_id") < 15)
    q = _query_set(emb, F.col("vec_id") % 250 == 2)
    exceeds = _round_result(knn(vectors, q, 40))
    zero = _round_result(knn(emb, q, 0))
    return exceeds.unionByName(zero)


# Q8: per-shard cardinality

def q_shard_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn("shard_id", (F.col("vec_id") % 6).cast("string"))
    return shard_cardinality(emb)


# ---------------------------------------------------------------------------
# M1/M2/R11: deterministic mutation log folded into the base snapshot.
#
# Log (derived from embeddings so the oracle can rebuild it):
#   seq=id*10+1  upsert  label+1000          for vec_id % 10 == 0
#   seq=id*10+2  upsert  label+2000          for vec_id % 20 == 0   (LWW within log)
#   seq=id*10+3  delete                      for vec_id % 17 == 3   (may override upserts)
#   seq=id*10+4  upsert  NEW id vec_id+10^6  for vec_id % 100 == 0  (insert of absent id)
#   seq=1        delete  id 999999999        (delete of absent id → no-op)

def _mutation_log(emb: DataFrame) -> DataFrame:
    """One scan, not five: each embeddings row emits its 0-4 derived log
    entries through a conditional array + explode, instead of four
    separate filtered scans union'd together.  Identical rows; the plan
    shrinks from 5 scans + 4 unions to 1 scan + 1 generator, which cuts
    both codegen and stage-scheduling overhead (and at 100 TB reads the
    base table once instead of four times)."""
    i, e, lb = F.col("vec_id"), F.col("embedding"), F.col("label")
    null_emb = F.lit(None).cast("array<float>")
    null_int = F.lit(None).cast("int")

    def entry(seq, op, vid, emb_col, label_col):
        return F.struct(
            seq.cast("long").alias("seq"),
            F.lit(op).alias("op"),
            vid.cast("long").alias("vec_id"),
            emb_col.alias("embedding"),
            label_col.cast("int").alias("label"),
        )

    candidates = F.array(
        F.when(i % 10 == 0, entry(i * 10 + 1, "upsert", i, e, lb + 1000)),
        F.when(i % 20 == 0, entry(i * 10 + 2, "upsert", i, e, lb + 2000)),
        F.when(i % 17 == 3, entry(i * 10 + 3, "delete", i, null_emb, null_int)),
        F.when(i % 100 == 0, entry(i * 10 + 4, "upsert", i + 1000000, e, lb)),
    )
    derived = (
        emb.select(F.explode(F.array_compact(candidates)).alias("m"))
        .select("m.seq", "m.op", "m.vec_id", "m.embedding", "m.label")
    )
    absent = emb.sparkSession.range(1).select(
        F.lit(1).cast("long").alias("seq"),
        F.lit("delete").alias("op"),
        F.lit(999999999).cast("long").alias("vec_id"),
        null_emb.alias("embedding"),
        null_int.alias("label"),
    )
    return (
        derived.unionByName(absent)
        .withColumn("shard_id", F.lit(None).cast("string"))
        .select("seq", "op", "vec_id", "shard_id", "embedding", "label")
    )


_MUTATION_LOG_SQL = """
log AS (
  SELECT vec_id * 10 + 1 AS seq, 'upsert' AS op, vec_id, embedding, label + 1000 AS label
    FROM embeddings WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id * 10 + 2, 'upsert', vec_id, embedding, label + 2000
    FROM embeddings WHERE vec_id % 20 = 0
  UNION ALL
  SELECT vec_id * 10 + 3, 'delete', vec_id, NULL, NULL
    FROM embeddings WHERE vec_id % 17 = 3
  UNION ALL
  SELECT vec_id * 10 + 4, 'upsert', vec_id + 1000000, embedding, label
    FROM embeddings WHERE vec_id % 100 = 0
  UNION ALL
  SELECT 1, 'delete', 999999999, NULL, NULL
),
latest AS (
  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY seq DESC) AS _rn FROM log)
  WHERE _rn = 1
),
compacted AS (
  SELECT b.vec_id, b.embedding, b.label
    FROM embeddings b LEFT JOIN latest l ON b.vec_id = l.vec_id WHERE l.vec_id IS NULL
  UNION ALL
  SELECT vec_id, embedding, label FROM latest WHERE op = 'upsert'
)
"""


def _compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return apply_mutations(emb, _mutation_log(emb))


def q_mutations_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW compaction result, projected to hash-stable columns."""
    return _compacted(spark, sf_dir).select(
        "vec_id", "label", F.size("embedding").alias("dim")
    )


def q_mutations_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 alone: anti-join tombstone semantics (delete-of-absent = no-op)."""
    emb = _emb(spark, sf_dir)
    dels = emb.filter(F.col("vec_id") % 17 == 3).select("vec_id").union(
        emb.limit(1).select(F.lit(999999999).cast("long").alias("vec_id"))
    )
    return emb.join(dels, on="vec_id", how="left_anti").select("vec_id", "label")


# R11 end-to-end: search must observe the mutations (replay-then-read).

def q_knn_after_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GEMM tier over the compacted snapshot (same rationale and
    # tier-equivalence contract as q_knn_batch; the replay-then-read
    # semantics live in _compacted, not in the scan tier)
    compacted = _compacted(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 100 == 0)
    return _round_result(knn(compacted, q, 5, method="numpy"))


QUERIES = {
    "knn_single": q_knn_single,
    "knn_batch": q_knn_batch,
    "knn_sharded": q_knn_sharded,
    "knn_edge_k": q_knn_edge_k,
    "shard_cardinality": q_shard_cardinality,
    "mutations_compact": q_mutations_compact,
    "mutations_delete": q_mutations_delete,
    "knn_after_mutations": q_knn_after_mutations,
}

_KNN_AFTER_MUT_DIST = _SQL_SQ_L2.format(q="q.qe", v="v.embedding")

ORACLES = {
    "knn_single": _knn_oracle("vec_id = 0", "TRUE", 10),
    "knn_batch": _knn_oracle("vec_id % 50 = 0", "TRUE", 10),
    "knn_sharded": _knn_oracle("vec_id % 100 = 1", "TRUE", 7),
    # k=0 contributes zero rows by construction, so the merged edge-case
    # query shares the k-exceeds oracle
    "knn_edge_k": _knn_oracle("vec_id % 250 = 2", "vec_id < 15", 40),
    "shard_cardinality": (
        "SELECT CAST(vec_id % 6 AS VARCHAR) AS shard_id, COUNT(*) AS n_vectors "
        "FROM embeddings GROUP BY 1"
    ),
    "mutations_compact": f"""
WITH {_MUTATION_LOG_SQL}
SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim FROM compacted
""",
    "mutations_delete": """
WITH dels AS (
  SELECT vec_id FROM embeddings WHERE vec_id % 17 = 3
  UNION ALL SELECT 999999999
)
SELECT b.vec_id, b.label FROM embeddings b LEFT JOIN dels d ON b.vec_id = d.vec_id
WHERE d.vec_id IS NULL
""",
    "knn_after_mutations": f"""
WITH {_MUTATION_LOG_SQL},
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, v.vec_id AS id, {_KNN_AFTER_MUT_DIST} AS distance
  FROM q CROSS JOIN compacted v),
ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 5
""",
}


# ---------------------------------------------------------------------------
# C1/C2 as data operations (the in-engine cache itself is driver-side and
# semantics-invisible — tests/test_cache.py; these exercise the keying and
# TTL-expiry machinery as oracle-checkable dataflows).

def q_cache_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 cache-key build, portable form: digest over the canonical
    (query id, top_k) string — reference BuildKey combines the query
    bytes hash with top_k (query_cache.cc:51-56)."""
    from ..functions.hashing import portable_hash64

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.lit(10).alias("top_k"),
    )
    return q.select(
        "query_id",
        "top_k",
        portable_hash64(
            F.concat_ws(":", F.col("query_id").cast("string"), F.col("top_k").cast("string"))
        ).alias("digest"),
    )


_CACHE_DIGEST_SQL = """
SELECT vec_id AS query_id, 10 AS top_k,
  CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':' || '10'), 1, 15)) AS BIGINT)
    AS digest
FROM embeddings WHERE vec_id % 25 = 0
"""


def q_cache_ttl_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C3 TTL semantics as a table op: synthetic result-cache rows
    (created_at = event ts, expires_at = ts + 30 min) pruned against a
    fixed 'now'; survivors counted per event_type."""
    from ..tables import load_table

    ev = load_table(spark, sf_dir, "events")
    cache = ev.select(
        F.col("event_id").alias("digest"),
        "event_type",
        F.col("ts").alias("created_at"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("expires_at"),
    )
    now = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    return (
        cache.filter(F.col("expires_at") > now)
        .groupBy("event_type")
        .agg(F.count("*").alias("live_entries"))
    )


_CACHE_TTL_SQL = """
SELECT event_type, COUNT(*) AS live_entries
FROM (SELECT event_type, ts + INTERVAL 30 MINUTE AS expires_at FROM events)
WHERE expires_at > TIMESTAMP '2024-01-15 00:00:00'
GROUP BY event_type
"""


def q_knn_batch_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow/GEMM fast path (Q1 FAISS-scan analog) against the same
    oracle as knn_batch — proves the two tiers agree end-to-end."""
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 50 == 0)
    return _round_result(knn(emb, q, 10, method="numpy"))


def q_knn_shard_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 shard routing (shard_manager.cc:80-103) as a read: search only
    shard '2'.  The shard filter is a partition-pruning predicate — on a
    shard-partitioned table the other shards' files are never opened."""
    emb = _emb(spark, sf_dir).withColumn(
        "shard_id", (F.col("vec_id") % 6).cast("string")
    )
    q = _query_set(emb, F.col("vec_id") % 125 == 4)
    routed = emb.filter(F.col("shard_id") == "2")
    return _round_result(knn(routed, q, 5))


def q_vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the shuffle-light
    array aggregate every clustering / IVF-training pipeline needs.
    posexplode → per-(label, pos) partial avg (map-side combine) →
    re-assemble ordered arrays.  At 100 TB the width-d explode stays
    bounded: rows × d intermediate, combined map-side before shuffle.

    The centroid array is serialized to a CSV of micro-unit integers
    (``round(v * 1e6)``) because the driver's canonicalizer cannot hash
    array columns (CORRECTNESS_r01 TypeError) — same encoding on both
    sides, so the values are still compared element-for-element."""
    emb = _emb(spark, sf_dir)
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("v"))
    )
    return (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(
            "label",
            F.array_join(
                F.transform(
                    "pv",
                    lambda s: F.round(s.getField("v") * 1e6).cast("long").cast("string"),
                ),
                ",",
            ).alias("centroid_csv"),
            F.size("pv").alias("dim"),
        )
    )


_CENTROID_SQL = """
WITH flat AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         UNNEST(embedding) AS val
  FROM embeddings
),
per_dim AS (
  SELECT label, pos, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS v
  FROM flat GROUP BY label, pos
)
SELECT label,
       array_to_string(
         list_transform(LIST(v ORDER BY pos),
                        x -> CAST(CAST(ROUND(x * 1000000) AS BIGINT) AS VARCHAR)),
         ',') AS centroid_csv,
       CAST(COUNT(*) AS INT) AS dim
FROM per_dim GROUP BY label
"""


def q_cache_persistent_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted result-cache probe (reference C2 across sessions,
    src/cache/query_cache.cc:15-43): a synthetic RESULT_CACHE-shaped
    table (digest with collisions, created_at = event ts, TTL 30 min) is
    probed with the SAME ``probe_plan`` the production
    ``PersistentResultCache`` uses — newest entry per (digest, top_k),
    live iff unexpired at the fixed 'now'.  Ties on created_at are
    output-invariant (live depends only on created_at), so the
    row_number tie-break needs no extra key."""
    from ..operators.cache import probe_plan

    ev = load_table(spark, sf_dir, "events")
    cache = ev.select(
        (F.col("event_id") % 40).alias("digest"),
        F.lit(10).alias("top_k"),
        F.col("ts").alias("created_at"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("expires_at"),
    )
    now = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    return probe_plan(cache, now).select(
        "digest",
        "top_k",
        F.date_format("created_at", "yyyy-MM-dd HH:mm:ss").alias("created_at"),
        "live",
    )


_CACHE_PROBE_SQL = """
WITH c AS (
  SELECT event_id % 40 AS digest, 10 AS top_k, ts AS created_at,
         ts + INTERVAL 30 MINUTE AS expires_at
  FROM events
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY digest, top_k
                               ORDER BY created_at DESC, expires_at DESC) AS rn
  FROM c
)
SELECT digest, top_k, STRFTIME(created_at, '%Y-%m-%d %H:%M:%S') AS created_at,
       expires_at > TIMESTAMP '2024-01-15 00:00:00' AS live
FROM r WHERE rn = 1
"""


QUERIES.update(
    {
        "cache_digest": q_cache_digest,
        "cache_persistent_probe": q_cache_persistent_probe,
        "knn_batch_numpy": q_knn_batch_numpy,
        "knn_shard_routed": q_knn_shard_routed,
    }
)
ORACLES.update(
    {
        "cache_digest": _CACHE_DIGEST_SQL,
        "cache_persistent_probe": _CACHE_PROBE_SQL,
        "knn_batch_numpy": ORACLES["knn_batch"],
        "knn_shard_routed": _knn_oracle("vec_id % 125 = 4", "vec_id % 6 = 2", 5),
    }
)

# ---------------------------------------------------------------------------
# int8 scalar-quantization tier (operators/quantize.py): the storage-side
# 100 TB lever the float-only reference lacks.  Both the codes and the full
# two-phase (coarse int8 scan → exact float re-rank) search are
# deterministic, so each gets an exact oracle.

def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector max-abs int8 quantization: scale, codes (CSV — the
    driver's canonicalizer cannot hash arrays) and the max
    reconstruction error, which must be ≤ scale/2 by construction."""
    from ..operators.quantize import dequantize_expr, quantize_vectors

    emb = _emb(spark, sf_dir)
    qz = quantize_vectors(emb)
    # bind the RAW scale column explicitly: the select below re-aliases
    # the rounded value as "qscale", and a string reference here would
    # resolve to that lateral alias (rounded scale → wrong error)
    err = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            dequantize_expr(qz["qcodes"], qz["qscale"]),
            lambda x, d: F.abs(x.cast("double") - d),
        ),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return qz.select(
        "vec_id",
        F.round("qscale", 6).alias("qscale"),
        F.array_join(F.transform("qcodes", lambda c: c.cast("string")), ",").alias(
            "codes_csv"
        ),
        F.round(err, 6).alias("max_err"),
    )


_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
    (SELECT MAX(ABS(CAST(u.a AS DOUBLE))) FROM (SELECT UNNEST(embedding) AS a) u)
      / 127.0 AS scale
  FROM embeddings
),
c AS (
  SELECT vec_id, scale, embedding,
    CASE WHEN scale = 0
         THEN list_transform(embedding, x -> 0)
         ELSE list_transform(embedding, x -> CAST(GREATEST(-127.0,
                LEAST(127.0, FLOOR(CAST(x AS DOUBLE) / scale + 0.5))) AS INT))
    END AS codes
  FROM s
)
SELECT vec_id, ROUND(scale, 6) AS qscale,
  array_to_string(list_transform(codes, x -> CAST(x AS VARCHAR)), ',') AS codes_csv,
  ROUND((SELECT MAX(ABS(CAST(u.a AS DOUBLE) - u.b * scale))
         FROM (SELECT UNNEST(embedding) AS a, UNNEST(codes) AS b) u), 6) AS max_err
FROM c
"""


#: process-level memo of materialized int8-tier paths, keyed by sf_dir
_QTIER_PATHS: dict[str, str] = {}


#: id-bucket granularity of the stored tiers — small so the fixtures
#: split into several directories and pruning is exercised for real
_TIER_BUCKET_ROWS = 64


def quantized_tier_path(spark: SparkSession, sf_dir: str) -> str:
    """The STORED int8 tier: ``quantize_vectors`` output materialized
    once per process as an id-bucketed RERANK STORE and read back, so
    downstream plans scan the on-disk ``qcodes``/``qscale`` columns
    (VERDICT r03 item 2) AND the exact re-rank reads only candidate
    id-buckets instead of the whole float column (VERDICT r06 finding
    #1 — the driver-verified plan must be the IO-bounded one)."""
    import os
    import tempfile

    from ..operators.quantize import quantize_vectors
    from ..sources.rerank_store import write_rerank_store

    path = _QTIER_PATHS.get(sf_dir)
    if path is None:
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_qtier_{os.getpid()}", name
        )
        write_rerank_store(
            quantize_vectors(_emb(spark, sf_dir)),
            path,
            bucket_rows=_TIER_BUCKET_ROWS,
        )
        _QTIER_PATHS[sf_dir] = path
    return path


def quantized_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(quantized_tier_path(spark, sf_dir))


def q_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase search over the STORED quantized tier: coarse top-15 on
    the dequantized on-disk int8 codes (the float column never enters
    phase 1's scan — plan-asserted in tests/test_plans.py), exact float
    re-rank to top-5 served from the tier's id-bucketed layout (only
    candidate buckets' float bytes are read — PartitionFilters,
    tests/test_rerank_store.py).  Deterministic end to end — stored
    codes are bit-identical to derived codes and the bounded re-rank is
    result-identical to the full join — so the oracle replays the
    identical pipeline from the raw embeddings."""
    from ..operators.quantize import quantized_knn

    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 40 == 7)
    path = quantized_tier_path(spark, sf_dir)
    return _round_result(
        quantized_knn(
            spark.read.parquet(path), q, 5, rerank=3, rerank_store=path
        )
    )


_QKNN_COARSE_DIST = _SQL_SQ_L2.format(q="q.qe", v="d.dq")
_QKNN_EXACT_DIST = _SQL_SQ_L2.format(q="c.qe", v="v.embedding")

def _qknn_oracle(query_pred: str, k: int, rerank: int) -> str:
    """Quantized two-phase replay, parameterized on the query set — used
    by the knn_quantized row and the quantized leg of ann_recall."""
    return f"""
WITH s AS (
  SELECT vec_id, embedding,
    (SELECT MAX(ABS(CAST(u.a AS DOUBLE))) FROM (SELECT UNNEST(embedding) AS a) u)
      / 127.0 AS scale
  FROM embeddings
),
d AS (
  SELECT vec_id, embedding,
    CASE WHEN scale = 0
         THEN list_transform(embedding, x -> 0.0)
         ELSE list_transform(embedding, x -> GREATEST(-127.0,
                LEAST(127.0, FLOOR(CAST(x AS DOUBLE) / scale + 0.5))) * scale)
    END AS dq
  FROM s
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE {query_pred}),
coarse AS (
  SELECT q.query_id, d.vec_id AS id, q.qe, {_QKNN_COARSE_DIST} AS cd
  FROM q CROSS JOIN d
),
cand AS (
  SELECT query_id, id, qe FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((cd) * 1e6, 0) / 1e6, id) AS crn
    FROM coarse)
  WHERE crn <= {k * rerank}
),
exact AS (
  SELECT c.query_id, c.id, {_QKNN_EXACT_DIST} AS distance
  FROM cand c JOIN embeddings v ON c.id = v.vec_id
)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
  FROM exact)
WHERE rank <= {k}
"""


_QKNN_SQL = _qknn_oracle("vec_id % 40 = 7", 5, 3)

# the int8 two-phase search is DRIVER-tier (promoted in round 2):
# deterministic end to end, so it earns a driver correctness row
QUERIES["knn_quantized"] = q_knn_quantized
ORACLES["knn_quantized"] = _QKNN_SQL


# ---------------------------------------------------------------------------
# persisted partition-pruned IVF search (sources/ivf_index.py) — the
# engine's analog of the reference scanning only the relevant inverted
# structure (src/index/vector_shard.cc:72-94 generalized): vectors live
# in parquet partitioned by cell id, and a probe's `cell_id IN (...)`
# becomes PartitionFilters, so unprobed cell directories never open
# (plan-locked in tests/test_ivf_index.py).  Promoted to a DRIVER row in
# round 4 (VERDICT r03 item 3): centroid selection is the same
# portable_hash64-thinned sample as ann_ivf_topk, so the oracle replays
# centroid choice, cell assignment, probing, and the exact re-rank.

_IVF_NUM_CELLS, _IVF_NPROBE = 16, 4
_IVF_INDEX_STATE: dict[str, tuple[str, list[list[float]]]] = {}


def _ivf_thinned_centroids(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """The ann_ivf_topk default centroid sample (similarity.py): thin to
    ~4× num_cells candidates by portable hash, take the first num_cells
    by id — deterministic and SQL-replayable (shared sampler:
    operators/sampling.thinned_head_rows)."""
    from ..operators.sampling import thinned_head_rows
    from ..operators.similarity import IVF_THIN_SEED

    rows = thinned_head_rows(
        _emb(spark, sf_dir).select("vec_id", "embedding"),
        _IVF_NUM_CELLS,
        seed=IVF_THIN_SEED,
        id_col="vec_id",
        count_key=f"{sf_dir}:embeddings",
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def persisted_ivf_index(spark: SparkSession, sf_dir: str) -> tuple[str, list[list[float]]]:
    """Materialize the cell-partitioned IVF index once per process;
    returns (path, centroids).  At 100 TB this is the one-time index
    build; every search after it reads only probed cells' files."""
    import os
    import tempfile

    from ..sources.ivf_index import write_ivf_index

    state = _IVF_INDEX_STATE.get(sf_dir)
    if state is None:
        cents = _ivf_thinned_centroids(spark, sf_dir)
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivf_{os.getpid()}", name
        )
        write_ivf_index(_emb(spark, sf_dir), path, cents)
        state = (path, cents)
        _IVF_INDEX_STATE[sf_dir] = state
    return state


def q_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.ivf_index import search_ivf_index

    path, cents = persisted_ivf_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 100 == 11)
    return search_ivf_index(spark, path, q, 5, cents, n_probe=_IVF_NPROBE).select(
        "query_id", "id", F.round("distance", 6).alias("distance"), "rank"
    )


def _ivf_persisted_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qe", v="a.embedding")
    # write_ivf_index enumerates centroids 0..N-1 in list order (vec_id
    # order of the thinned sample), hence ROW_NUMBER()-1; assignment and
    # probe tie-break on (distance, cell_id) exactly like the array_sort
    # over (d, cid) structs in clustering.nearest_centroid_expr /
    # ivf_index._probe_cells_expr
    return f"""
WITH nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM embeddings v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 11),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_IVF_NPROBE}),
scored AS (SELECT qp.query_id, a.vec_id AS id, {l2_qa} AS distance
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
ranked AS (SELECT query_id, id, distance,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 5
"""


QUERIES["ivf_persisted_topk"] = q_ivf_persisted_topk
ORACLES["ivf_persisted_topk"] = _ivf_persisted_oracle()

# --- semantic cache reuse (C4 made live; VERDICT r03 item 8) --------------

_SEMCACHE_THRESHOLD = 0.8

#: cosine in DuckDB, double-promoted, matching functions.distance
#: .cosine_similarity (same macro shape as registry/llm._SQL_COSINE)
_SQL_COSINE_VEC = (
    "(SELECT SUM(CAST(u.a AS DOUBLE) * CAST(u.b AS DOUBLE)) / "
    "(SQRT(SUM(CAST(u.a AS DOUBLE) * CAST(u.a AS DOUBLE))) * "
    "SQRT(SUM(CAST(u.b AS DOUBLE) * CAST(u.b AS DOUBLE)))) "
    "FROM (SELECT UNNEST({x}) AS a, UNNEST({y}) AS b) u)"
)


def q_semantic_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dead ``exact_match`` cache flag
    (include/cache/query_cache.h:30-33) as a live feature: incoming
    queries are served by the nearest previously-cached query's stored
    result when cosine ≥ threshold (operators/cache.semantic_probe).
    The 'cached' set is every 40th query vector; incoming is every 20th
    — so half the incoming queries have an exact cached twin (hit at
    cosine 1) and the rest hit only if a semantically-close neighbor
    was cached."""
    from ..operators.cache import semantic_probe

    emb = _emb(spark, sf_dir)
    cached = emb.filter(F.col("vec_id") % 40 == 3).select(
        F.col("vec_id").alias("cached_id"), F.col("embedding").alias("cvec")
    )
    q = emb.filter(F.col("vec_id") % 20 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    r = semantic_probe(cached, q, threshold=_SEMCACHE_THRESHOLD)
    return r.select(
        "query_id", "served_by", F.round("cosine", 6).alias("cosine"), "hit"
    )


_SEMCACHE_COS = _SQL_COSINE_VEC.format(x="q.qe", y="c.cvec")
_SEMCACHE_SQL = f"""
WITH c AS (SELECT vec_id AS cached_id, embedding AS cvec FROM embeddings WHERE vec_id % 40 = 3),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 20 = 3),
scored AS (SELECT q.query_id, c.cached_id, {_SEMCACHE_COS} AS cosine FROM q CROSS JOIN c),
best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cached_id) AS rn
         FROM scored)
SELECT query_id,
       CASE WHEN cosine >= {_SEMCACHE_THRESHOLD} THEN cached_id ELSE NULL END AS served_by,
       ROUND(cosine, 6) AS cosine,
       cosine >= {_SEMCACHE_THRESHOLD} AS hit
FROM best WHERE rn = 1
"""

# --- product-quantization tier (operators/pq.py) ---------------------------
# The next rung of the compression ladder past int8 (32× less coarse-scan
# IO: 64 float32 → 8 code bytes).  Codebooks here are the deterministic
# zero-iteration sample (pq_sample_codebooks — portable-hash-thinned rows
# sliced per subspace), so the ORACLE REPLAYS THE WHOLE PIPELINE IN SQL:
# codebook selection, per-subspace argmin encoding, per-query ADC lookup
# sums, and the exact re-rank.  Trained codebooks (pq_fit) are
# pytest-verified instead (recall + monotone reconstruction MSE —
# tests/test_pq.py).

_PQ_DIM, _PQ_M, _PQ_KSUB, _PQ_DSUB = 64, 8, 16, 8
_PQ_RERANK = 10
_PQ_BOOKS: dict[str, list] = {}
_PQ_TIER_PATHS: dict[str, str] = {}


def pq_books(spark: SparkSession, sf_dir: str) -> list:
    """Deterministic sample codebooks, memoized per fixture dir."""
    from ..operators.pq import pq_sample_codebooks

    books = _PQ_BOOKS.get(sf_dir)
    if books is None:
        books = pq_sample_codebooks(
            _emb(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
            count_key=f"{sf_dir}:embeddings",
        )
        _PQ_BOOKS[sf_dir] = books
    return books


def pq_tier_path(spark: SparkSession, sf_dir: str) -> str:
    """The STORED PQ tier: ``pq_encode`` output materialized once per
    process as an id-bucketed RERANK STORE, so the ADC coarse scan
    reads the on-disk 8-byte code column (VERDICT r03 item 2) and the
    exact re-rank reads only candidate id-buckets (VERDICT r06
    finding #1) — the same stored-tier discipline as
    ``quantized_tier_path``."""
    import os
    import tempfile

    from ..operators.pq import pq_encode
    from ..sources.rerank_store import write_rerank_store

    path = _PQ_TIER_PATHS.get(sf_dir)
    if path is None:
        books = pq_books(spark, sf_dir)
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_pqtier_{os.getpid()}", name
        )
        write_rerank_store(
            pq_encode(_emb(spark, sf_dir), books),
            path,
            bucket_rows=_TIER_BUCKET_ROWS,
        )
        _PQ_TIER_PATHS[sf_dir] = path
    return path


def pq_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(pq_tier_path(spark, sf_dir))


def q_embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode parity: the stored code array per vector, CSV-encoded
    (integer-exact — the strongest kind of oracle row)."""
    return pq_tier(spark, sf_dir).select(
        "vec_id",
        F.concat_ws(
            ",", F.transform(F.col("pq_codes"), lambda c: c.cast("string"))
        ).alias("codes_csv"),
    )


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase PQ search off the stored code tier: per-query ADC
    lookup-table coarse scan (m adds per pair, float column untouched),
    exact squared-L2 re-rank of the k·rerank survivors served from the
    tier's id-bucketed layout (only candidate buckets' float bytes are
    read — VERDICT r06 finding #1; result-identical to the full
    join)."""
    from ..operators.pq import pq_adc_topk

    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 100 == 7)
    path = pq_tier_path(spark, sf_dir)
    return _round_result(
        pq_adc_topk(
            spark.read.parquet(path), q, 5, pq_books(spark, sf_dir),
            rerank=_PQ_RERANK, rerank_store=path,
        )
    )


def _pq_oracle_ctes() -> str:
    """Shared CTE prefix: codebook selection replay (portable-hash
    thinning, first ksub rows by id — same scheme as the IVF oracles)
    plus per-(vec, subspace) argmin code assignment."""
    from ..functions.hashing import portable_hash64_sql
    from ..operators.pq import PQ_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=PQ_THIN_SEED)
    sub_lo = f"(cb.sub * {_PQ_DSUB} + 1)"
    sub_hi = f"((cb.sub + 1) * {_PQ_DSUB})"
    d_vc = (
        "(SELECT SUM((CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE)) * "
        "(CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE))) "
        f"FROM (SELECT UNNEST(list_slice(v.embedding, {sub_lo}, {sub_hi})) AS a, "
        "UNNEST(cb.cvec) AS b) u)"
    )
    return f"""
nt AS (SELECT GREATEST(COUNT(*) // {_PQ_KSUB * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_PQ_KSUB}
),
zrows AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS z, embedding
  FROM sel
),
cb AS (
  SELECT s.sub, z.z,
         list_slice(z.embedding, s.sub * {_PQ_DSUB} + 1, (s.sub + 1) * {_PQ_DSUB}) AS cvec
  FROM (SELECT UNNEST(range({_PQ_M})) AS sub) s CROSS JOIN zrows z
),
vd AS (
  SELECT v.vec_id, cb.sub, cb.z, {d_vc} AS d
  FROM embeddings v CROSS JOIN cb
),
asg AS (
  SELECT vec_id, sub, z FROM
    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, z) AS rn FROM vd)
  WHERE rn = 1
)"""


def _pq_codes_oracle() -> str:
    return f"""
WITH {_pq_oracle_ctes()}
SELECT vec_id,
       string_agg(CAST(z AS VARCHAR), ',' ORDER BY sub) AS codes_csv
FROM asg GROUP BY vec_id
"""


def _pq_topk_oracle() -> str:
    d_qc = (
        "(SELECT SUM((CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE)) * "
        "(CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE))) "
        f"FROM (SELECT UNNEST(list_slice(q.qe, cb.sub * {_PQ_DSUB} + 1, "
        f"(cb.sub + 1) * {_PQ_DSUB})) AS a, UNNEST(cb.cvec) AS b) u)"
    )
    d_exact = _SQL_SQ_L2.format(q="c.qe", v="v.embedding")
    return f"""
WITH {_pq_oracle_ctes()},
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 7),
qd AS (
  SELECT q.query_id, q.qe, cb.sub, cb.z, {d_qc} AS d
  FROM q CROSS JOIN cb
),
adc AS (
  SELECT qd.query_id, a.vec_id AS id, SUM(qd.d) AS adist
  FROM asg a JOIN qd ON qd.sub = a.sub AND qd.z = a.z
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, id FROM
    (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((adist) * 1e6, 0) / 1e6, id) AS crn FROM adc)
  WHERE crn <= {5 * _PQ_RERANK}
),
exact AS (
  SELECT c.query_id, c.id, {d_exact} AS distance
  FROM (SELECT cand.query_id, cand.id, q.qe FROM cand JOIN q USING (query_id)) c
  JOIN embeddings v ON c.id = v.vec_id
)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
  FROM exact)
WHERE rank <= 5
"""


# --- merge-on-read streaming IVF search (streaming/ivf_stream.py) -----------
# The LSM-style index maintenance as an ORACLE-VERIFIED row: base built
# once, the derived mutation log streamed in as three append batches
# (batch boundaries are immaterial — LWW arbitrates on seq), then a
# partition-pruned probe over base+delta+arbiter.  The oracle replays
# the END STATE: SQL LWW compaction (the mutations_compact CTE), IVF
# centroid/assignment replay over the compacted rows, probes, exact
# re-rank — so the row proves streamed-in mutations and the pruned
# merge-on-read search land exactly where batch compaction + search
# would.

_IVF_STREAM_STATE: dict[str, object] = {}


def ivf_stream_store(spark: SparkSession, sf_dir: str):
    """Build the merge-on-read index once per process: base at seq 0,
    then the derived mutation log appended in three batches."""
    import tempfile

    from ..streaming.ivf_stream import IvfIndexStore

    store = _IVF_STREAM_STATE.get(sf_dir)
    if store is None:
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        root = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivfstream_{os.getpid()}", name
        )
        store = IvfIndexStore(root, _ivf_thinned_centroids(spark, sf_dir))
        store.init_base(_emb(spark, sf_dir))
        log = _mutation_log(_emb(spark, sf_dir))
        for i in range(3):  # arbitrary batching: LWW is order-insensitive
            store.append_batch(log.filter(F.pmod(F.col("seq"), F.lit(3)) == i))
        _IVF_STREAM_STATE[sf_dir] = store
    return store


def q_ivf_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = ivf_stream_store(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 100 == 0)
    return _round_result(store.search(spark, q, 5, n_probe=_IVF_NPROBE))


def _ivf_stream_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qe", v="a.embedding")
    return f"""
WITH {_MUTATION_LOG_SQL},
nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM compacted v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_IVF_NPROBE}),
scored AS (SELECT qp.query_id, a.vec_id AS id, {l2_qa} AS distance
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
ranked AS (SELECT query_id, id, distance,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 5
"""


# --- bucketed zero-exchange compaction (sources/bucketed.py) ----------------
# The mutation path's 100 TB mechanism as a QUERY row: base + derived
# log persisted as co-bucketed (CLUSTERED BY vec_id) tables, so the LWW
# compaction plan needs no Exchange — only the layout changes, never
# the values, hence the row SHARES mutations_compact's oracle verbatim.

_BUCKETED_STATE: dict[str, tuple[str, str]] = {}


def bucketed_mutation_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write the fixture base and its derived mutation log as co-bucketed
    tables once per process (the one-time layout cost a 100 TB table
    pays at ingest, not per compaction)."""
    import re

    from ..sources.bucketed import write_bucketed

    state = _BUCKETED_STATE.get(sf_dir)
    if state is None:
        # pid-suffixed names: a fresh process has a fresh in-memory
        # catalog, and an older process's warehouse dirs would otherwise
        # collide (LOCATION_ALREADY_EXISTS) with a catalog-unknown table
        tag = re.sub(r"[^A-Za-z0-9]", "_", os.path.basename(os.path.normpath(sf_dir)))
        base_t = f"dvss_bkt_base_{tag}_{os.getpid()}"
        log_t = f"dvss_bkt_log_{tag}_{os.getpid()}"
        emb = _emb(spark, sf_dir)
        write_bucketed(emb, base_t, buckets=32)
        write_bucketed(_mutation_log(emb), log_t, buckets=32)
        state = (base_t, log_t)
        _BUCKETED_STATE[sf_dir] = state
    return state


def q_mutations_compact_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mutations_compact over the co-bucketed layout: identical rows
    (plan-asserted Exchange-free in tests/test_bucketed.py)."""
    from ..sources.bucketed import compact_bucketed

    base_t, log_t = bucketed_mutation_tables(spark, sf_dir)
    return compact_bucketed(spark, base_t, log_t).select(
        "vec_id", "label", F.size("embedding").alias("dim")
    )


# --- persisted IVF+PQ index (sources/ivfpq_index.py) -----------------------
# The composed 100 TB serving plan: a probe reads (n_probe/num_cells) ×
# (1/32) of the corpus bytes — partition-pruned cell directories holding
# 8-byte PQ codes — then re-ranks exactly.  Every stage is deterministic
# (hash-thinned centroids, hash-thinned codebooks), so the oracle
# replays centroid choice, codebook choice, cell routing, code
# assignment, ADC sums, and the re-rank end-to-end in SQL.

#: built lazily — Column construction needs an active SparkContext
_IVFPQ_QPRED_SPARK = lambda: F.col("vec_id") % 100 == 23  # noqa: E731
_IVFPQ_QPRED_SQL = "vec_id % 100 = 23"
_IVFPQ_RERANK = 10
_IVFPQ_STATE: dict[str, str] = {}


def ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the cell-partitioned PQ-coded index once per process;
    returns its path (centroids/codebooks come from the memoized
    builders shared with the plain IVF and PQ rows)."""
    import os
    import tempfile

    from ..sources.ivfpq_index import write_ivfpq_index

    path = _IVFPQ_STATE.get(sf_dir)
    if path is None:
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivfpq_{os.getpid()}", name
        )
        write_ivfpq_index(
            _emb(spark, sf_dir),
            path,
            _ivf_thinned_centroids(spark, sf_dir),
            pq_books(spark, sf_dir),
        )
        _IVFPQ_STATE[sf_dir] = path
    return path


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.ivfpq_index import search_ivfpq_index

    path = ivfpq_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, _IVFPQ_QPRED_SPARK())
    return _round_result(
        search_ivfpq_index(
            spark,
            path,
            q,
            5,
            _ivf_thinned_centroids(spark, sf_dir),
            pq_books(spark, sf_dir),
            n_probe=_IVF_NPROBE,
            rerank=_IVFPQ_RERANK,
        )
    )


def _ivfpq_oracle(qpred: str = _IVFPQ_QPRED_SQL) -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    ih = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    d_ql = (
        "(SELECT SUM((CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE)) * "
        "(CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE))) "
        f"FROM (SELECT UNNEST(list_slice(q.qe, cb.sub * {_PQ_DSUB} + 1, "
        f"(cb.sub + 1) * {_PQ_DSUB})) AS a, UNNEST(cb.cvec) AS b) u)"
    )
    d_exact = _SQL_SQ_L2.format(q="c.qe", v="v.embedding")
    return f"""
WITH {_pq_oracle_ctes()},
int_nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
isel AS (
  SELECT vec_id, embedding FROM embeddings, int_nt
  WHERE ({ih}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM isel
),
cvd AS (SELECT v.vec_id, c.cell_id, {l2_vc} AS d
        FROM embeddings v CROSS JOIN cents c),
casg AS (SELECT vec_id, cell_id FROM
         (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
          FROM cvd)
         WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE {qpred}),
qcd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qcd)
       WHERE rn <= {_IVF_NPROBE}),
qlut AS (SELECT q.query_id, cb.sub, cb.z, {d_ql} AS d FROM q CROSS JOIN cb),
adc AS (
  SELECT qp.query_id, cv.vec_id AS id, SUM(l.d) AS adist
  FROM qp
  JOIN casg cv ON cv.cell_id = qp.cell_id
  JOIN asg a ON a.vec_id = cv.vec_id
  JOIN qlut l ON l.query_id = qp.query_id AND l.sub = a.sub AND l.z = a.z
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, id FROM
    (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((adist) * 1e6, 0) / 1e6, id) AS crn FROM adc)
  WHERE crn <= {5 * _IVFPQ_RERANK}
),
exact AS (
  SELECT c.query_id, c.id, {d_exact} AS distance
  FROM (SELECT cand.query_id, cand.id, q.qe FROM cand JOIN q USING (query_id)) c
  JOIN embeddings v ON c.id = v.vec_id
)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
  FROM exact)
WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Round-5 search-surface generalizations: filtered / radius / grouped
# search (operators/knn.py range_search + grouped_topk; filtered = the
# predicate composes with the scan, reference shards carry no attributes
# so this is pure Spark-side capability).

def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered kNN: the k nearest vectors SATISFYING a metadata
    predicate (pre-filter semantics — the filter reaches the parquet
    scan, so candidate generation already excludes non-matching rows)."""
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 250 == 2)
    return _round_result(knn(emb.filter(F.col("label") % 3 == 0), q, 10))


def q_knn_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search: every vector within squared-L2 1.55 of each query,
    ranked by distance (FAISS range_search analog)."""
    from ..operators.knn import range_search

    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 250 == 2)
    return _round_result(range_search(emb, q, 1.55))


def q_knn_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted search: top-3 nearest per (query, label) in one plan."""
    from ..operators.knn import grouped_topk

    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 250 == 2)
    out = grouped_topk(emb, q, 3, group_col="label")
    return out.select(
        "query_id",
        F.col("group").alias("grp"),
        "id",
        F.round("distance", 6).alias("distance"),
        "rank",
    )


_RADIUS_DIST = _SQL_SQ_L2.format(q="q.qe", v="v.embedding")

_KNN_RADIUS_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 250 = 2),
scored AS (SELECT q.query_id, v.vec_id AS id, {_RADIUS_DIST} AS distance
           FROM q CROSS JOIN embeddings v),
within AS (SELECT * FROM scored WHERE distance <= 1.55)
SELECT query_id, id, ROUND(distance, 6) AS distance,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
FROM within
"""

_KNN_GROUPED_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 250 = 2),
scored AS (SELECT q.query_id, v.label AS grp, v.vec_id AS id, {_RADIUS_DIST} AS distance
           FROM q CROSS JOIN embeddings v),
ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id, grp
                                             ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, grp, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Round-5: large-to-large ANN kNN JOIN (operators/similarity.knn_join) —
# neither side broadcast; candidates from one shuffle equi-join on the
# shared IVF cell.  The oracle replays centroid thinning, both sides'
# cell routing, and the per-left top-k, like _ivf_persisted_oracle.

_KNNJOIN_LEFT_PRED = "vec_id % 3 = 1"
_KNNJOIN_K = 3


def q_ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_join

    emb = _emb(spark, sf_dir)
    left = emb.filter(F.expr(_KNNJOIN_LEFT_PRED))
    out = knn_join(
        left,
        emb,
        _KNNJOIN_K,
        num_cells=_IVF_NUM_CELLS,
        n_probe=_IVF_NPROBE,
        thin_count_key=f"{sf_dir}:embeddings",
    )
    return out.select(
        "left_id", "right_id", F.round("distance", 6).alias("distance"), "rank"
    )


def _knn_join_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_lc = _SQL_SQ_L2.format(q="l.le", v="c.cvec")
    l2_lr = _SQL_SQ_L2.format(q="lp.le", v="a.embedding")
    return f"""
WITH nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM embeddings v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
l AS (SELECT vec_id AS left_id, embedding AS le FROM embeddings
      WHERE {_KNNJOIN_LEFT_PRED}),
ld AS (SELECT l.left_id, l.le, c.cell_id, {l2_lc} AS d FROM l CROSS JOIN cents c),
lp AS (SELECT left_id, le, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY left_id ORDER BY d, cell_id) AS rn
        FROM ld)
       WHERE rn <= {_IVF_NPROBE}),
scored AS (SELECT lp.left_id, a.vec_id AS right_id, {l2_lr} AS distance
           FROM lp JOIN asg a ON a.cell_id = lp.cell_id),
ranked AS (SELECT left_id, right_id, distance,
           CAST(ROW_NUMBER() OVER (PARTITION BY left_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, right_id) AS INT) AS rank
           FROM scored)
SELECT left_id, right_id, ROUND(distance, 6) AS distance, rank
FROM ranked WHERE rank <= {_KNNJOIN_K}
"""


# ---------------------------------------------------------------------------
# Round-6: the TRAINED-centroid IVF tier under the independent driver
# (VERDICT r05 item 4).  Lloyd's algorithm cannot be replayed in SQL, so
# the registry row serves from centroids a kmeans_fit run PRODUCED and
# we froze as literals (registry/trained_cents.py); the oracle replays
# assignment / probe routing / exact re-rank from the same literals —
# the established _knn_join_oracle pattern.  This is the serving-quality
# configuration (recall 0.92-1.00 at n_probe 4-8 vs the hash-sampled
# tier's 0.50, bench recall curve), previously pytest-floor-only.

_TRAINED_NPROBE = 4
_TRAINED_QPRED = "vec_id % 100 = 31"
_TRAINED_INDEX_STATE: dict[str, tuple[str, list[list[float]]]] = {}


def trained_ivf_index(spark: SparkSession, sf_dir: str) -> tuple[str, list[list[float]]]:
    """Cell-partitioned index built from the frozen trained centroids,
    memoized per process like persisted_ivf_index."""
    import os
    import tempfile

    from ..sources.ivf_index import write_ivf_index
    from .trained_cents import TRAINED_CENTROIDS_SF001

    state = _TRAINED_INDEX_STATE.get(sf_dir)
    if state is None:
        cents = TRAINED_CENTROIDS_SF001
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivf_trained_{os.getpid()}", name
        )
        write_ivf_index(_emb(spark, sf_dir), path, cents)
        state = (path, cents)
        _TRAINED_INDEX_STATE[sf_dir] = state
    return state


def q_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.ivf_index import search_ivf_index

    path, cents = trained_ivf_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.expr(_TRAINED_QPRED))
    return search_ivf_index(
        spark, path, q, 5, cents, n_probe=_TRAINED_NPROBE
    ).select("query_id", "id", F.round("distance", 6).alias("distance"), "rank")


def _ivf_trained_oracle() -> str:
    from .trained_cents import TRAINED_CENTROIDS_SF001

    rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(TRAINED_CENTROIDS_SF001)
    )
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qe", v="a.embedding")
    return f"""
WITH cents(cell_id, cvec) AS (VALUES
  {rows}
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM embeddings v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE {_TRAINED_QPRED}),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_TRAINED_NPROBE}),
scored AS (SELECT qp.query_id, a.vec_id AS id, {l2_qa} AS distance
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
ranked AS (SELECT query_id, id, distance,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Round-6: cosine-metric IVF serving (sources/ivf_index.py cosine tier).
# The index stores L2-NORMALIZED vectors; routing and ranking are L2 in
# normalized space (== cosine ranking), similarity recovered exactly as
# cos = 1 − d²/2.  Centroids are the sf0.01 hash-thinned sample frozen
# in NORMALIZED space (trained_cents.COSINE_CENTROIDS_SF001) so the
# oracle replays routing from byte-identical doubles; the oracle
# normalizes corpus and query vectors in SQL and replays assignment,
# probing, ranking, and the cosine conversion.

_COSINE_IVF_NPROBE = 4
_COSINE_IVF_QPRED = "vec_id % 100 = 47"
_COSINE_IVF_STATE: dict[str, tuple[str, list[list[float]]]] = {}

#: DuckDB L2 norm of an array column (zip idiom; same double-promoted
#: arithmetic as functions.distance.l2_norm).  DuckDB lambdas cannot
#: contain subqueries, so normalization is a two-step CTE: compute the
#: norm as a column, then divide inside list_transform.
_SQL_L2NORM = (
    "(SELECT SQRT(SUM(CAST(u.a AS DOUBLE) * CAST(u.a AS DOUBLE))) "
    "FROM (SELECT UNNEST({x}) AS a) u)"
)


def cosine_ivf_index(spark: SparkSession, sf_dir: str) -> tuple[str, list[list[float]]]:
    import os
    import tempfile

    from ..sources.ivf_index import write_cosine_ivf_index
    from .trained_cents import COSINE_CENTROIDS_SF001

    state = _COSINE_IVF_STATE.get(sf_dir)
    if state is None:
        cents = COSINE_CENTROIDS_SF001
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivf_cos_{os.getpid()}", name
        )
        write_cosine_ivf_index(_emb(spark, sf_dir), path, cents)
        state = (path, cents)
        _COSINE_IVF_STATE[sf_dir] = state
    return state


def q_ann_cosine_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.ivf_index import search_cosine_ivf_index

    path, cents = cosine_ivf_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.expr(_COSINE_IVF_QPRED))
    return search_cosine_ivf_index(
        spark, path, q, 5, cents, n_probe=_COSINE_IVF_NPROBE
    ).select("query_id", "id", F.round("cosine", 6).alias("cosine"), "rank")


def _cosine_ivf_oracle() -> str:
    from .trained_cents import COSINE_CENTROIDS_SF001

    rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(COSINE_CENTROIDS_SF001)
    )
    l2_vc = _SQL_SQ_L2.format(q="v.e", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qe", v="a.e")
    norm_col = _SQL_L2NORM.format(x="embedding")
    return f"""
WITH cents(cell_id, cvec) AS (VALUES
  {rows}
),
nz AS (SELECT vec_id, embedding, {norm_col} AS nrm FROM embeddings),
nv AS (SELECT vec_id,
              list_transform(embedding, v -> CAST(v AS DOUBLE) / nrm) AS e
       FROM nz WHERE nrm > 0),
vd AS (SELECT v.vec_id, v.e, c.cell_id, {l2_vc} AS d
       FROM nv v CROSS JOIN cents c),
asg AS (SELECT vec_id, e, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE) / nrm) AS qe
      FROM nz WHERE {_COSINE_IVF_QPRED} AND nrm > 0),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_COSINE_IVF_NPROBE}),
scored AS (SELECT qp.query_id, a.vec_id AS id, {l2_qa} AS distance
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
ranked AS (SELECT query_id, id, distance,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(1.0 - distance / 2.0, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
"""


# --- pytest-only tier (beyond the driver's 50-query correctness window;
# verified by tests/test_oracle_parity.py with the same DuckDB harness) ----

# Round-5 promotions (VERDICT r04 item 2): the round-4 flagship tiers —
# PQ ADC search, the persisted IVF+PQ index, and merge-on-read streaming
# IVF — move INTO the driver window so the independent oracle checks
# them (three thin relational rows demoted in exchange).
QUERIES["ann_pq_topk"] = q_ann_pq_topk
ORACLES["ann_pq_topk"] = _pq_topk_oracle()
QUERIES["ann_ivfpq_topk"] = q_ann_ivfpq_topk
ORACLES["ann_ivfpq_topk"] = _ivfpq_oracle()
QUERIES["ivf_stream_topk"] = q_ivf_stream_topk
ORACLES["ivf_stream_topk"] = _ivf_stream_oracle()
# round-5 flagship: the large-to-large ANN kNN join is DRIVER-tier (the
# r04 item-2 rotation policy; a thin relational row was demoted in
# exchange — registry/relational.py)
QUERIES["ann_knn_join"] = q_ann_knn_join
ORACLES["ann_knn_join"] = _knn_join_oracle()
# round-6 rotation (VERDICT r05 items 4+5): the trained-centroid serving
# tier and the filtered-ANN contract move INTO the driver window (two
# thin relational rows demoted in exchange — registry/relational.py)
QUERIES["ivf_trained_topk"] = q_ivf_trained_topk
ORACLES["ivf_trained_topk"] = _ivf_trained_oracle()
QUERIES["knn_filtered"] = q_knn_filtered
ORACLES["knn_filtered"] = _knn_oracle("vec_id % 250 = 2", "label % 3 = 0", 10)

# round-7 rotation (VERDICT r06 item 2): the round-6 cosine-metric IVF
# serving tier moves INTO the driver window (knn_edge_k demoted — its
# semantics are knn_batch at boundary k, already driver-covered)
QUERIES["ann_cosine_ivf_topk"] = q_ann_cosine_ivf_topk
ORACLES["ann_cosine_ivf_topk"] = _cosine_ivf_oracle()
_EDGE_K_DEMOTED = QUERIES.pop("knn_edge_k")
_EDGE_K_ORACLE = ORACLES.pop("knn_edge_k")

EXTRA_QUERIES = {
    "cache_ttl_prune": q_cache_ttl_prune,
    "embedding_quantize": q_embedding_quantize,
    "semantic_cache_reuse": q_semantic_cache_reuse,
    "embedding_pq_codes": q_embedding_pq_codes,
    "mutations_compact_bucketed": q_mutations_compact_bucketed,
    "knn_radius": q_knn_radius,
    "knn_grouped": q_knn_grouped,
    "knn_edge_k": _EDGE_K_DEMOTED,
}
EXTRA_ORACLES = {
    "cache_ttl_prune": _CACHE_TTL_SQL,
    "embedding_quantize": _QUANTIZE_SQL,
    "semantic_cache_reuse": _SEMCACHE_SQL,
    "embedding_pq_codes": _pq_codes_oracle(),
    # bucketing is layout, not semantics: same oracle as the driver row
    "mutations_compact_bucketed": ORACLES["mutations_compact"],
    "knn_radius": _KNN_RADIUS_SQL,
    "knn_grouped": _KNN_GROUPED_SQL,
    "knn_edge_k": _EDGE_K_ORACLE,
}


# ---------------------------------------------------------------------------
# Round-7: cosine-metric IVF+PQ serving (sources/ivfpq_index.py cosine
# tier — VERDICT r06 item 3).  The index stores L2-NORMALIZED vectors
# with PQ codes encoded in normalized space; routing, ADC, and re-rank
# are all L2 in normalized space (== cosine ranking), similarity
# recovered exactly as cos = 1 − d²/2.  Centroids are the frozen
# normalized-space sample (trained_cents.COSINE_CENTROIDS_SF001, same
# as ann_cosine_ivf_topk) and codebooks are the deterministic
# hash-thinned sample drawn FROM THE NORMALIZED corpus, so the oracle
# replays normalization, codebook selection, cell assignment, code
# assignment, probing, ADC, exact re-rank, and the cosine conversion.

_COSINE_IVFPQ_NPROBE = 4
_COSINE_IVFPQ_RERANK = 10
_COSINE_IVFPQ_QPRED = "vec_id % 100 = 31"
_COSINE_IVFPQ_STATE: dict[str, str] = {}
_COSINE_PQ_BOOKS: dict[str, list] = {}


def _norm_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-zero-norm corpus, L2-normalized — the space every cosine
    index artifact (centroids, codebooks, codes) lives in."""
    from ..functions.distance import l2_norm, l2_normalize

    emb = _emb(spark, sf_dir)
    return emb.filter(l2_norm(F.col("embedding")) > 0.0).withColumn(
        "embedding", l2_normalize("embedding")
    )


def cosine_pq_books(spark: SparkSession, sf_dir: str) -> list:
    """Deterministic sample codebooks over the NORMALIZED corpus —
    same thinning as ``pq_books``, different space."""
    from ..operators.pq import pq_sample_codebooks

    books = _COSINE_PQ_BOOKS.get(sf_dir)
    if books is None:
        books = pq_sample_codebooks(
            _norm_emb(spark, sf_dir), dim=_PQ_DIM, m=_PQ_M, ksub=_PQ_KSUB,
            count_key=f"{sf_dir}:embeddings_norm",
        )
        _COSINE_PQ_BOOKS[sf_dir] = books
    return books


def cosine_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from ..sources.ivfpq_index import write_cosine_ivfpq_index
    from .trained_cents import COSINE_CENTROIDS_SF001

    path = _COSINE_IVFPQ_STATE.get(sf_dir)
    if path is None:
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivfpq_cos_{os.getpid()}", name
        )
        write_cosine_ivfpq_index(
            _emb(spark, sf_dir), path,
            COSINE_CENTROIDS_SF001, cosine_pq_books(spark, sf_dir),
        )
        _COSINE_IVFPQ_STATE[sf_dir] = path
    return path


def q_ann_cosine_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-5 from the persisted cosine IVF+PQ index: partition-
    pruned probes over normalized-space PQ codes, exact normalized-L2
    re-rank, cos = 1 − d²/2."""
    from ..sources.ivfpq_index import search_cosine_ivfpq_index
    from .trained_cents import COSINE_CENTROIDS_SF001

    path = cosine_ivfpq_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.expr(_COSINE_IVFPQ_QPRED))
    return search_cosine_ivfpq_index(
        spark, path, q, 5, COSINE_CENTROIDS_SF001, cosine_pq_books(spark, sf_dir),
        n_probe=_COSINE_IVFPQ_NPROBE, rerank=_COSINE_IVFPQ_RERANK,
    ).select("query_id", "id", F.round("cosine", 6).alias("cosine"), "rank")


def _cosine_ivfpq_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.pq import PQ_THIN_SEED
    from .trained_cents import COSINE_CENTROIDS_SF001

    cent_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(COSINE_CENTROIDS_SF001)
    )
    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=PQ_THIN_SEED)
    norm_col = _SQL_L2NORM.format(x="embedding")
    l2_vc = _SQL_SQ_L2.format(q="v.e", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    # per-(vec, sub) distance to a codebook entry, in normalized space
    sub_lo = f"(cb.sub * {_PQ_DSUB} + 1)"
    sub_hi = f"((cb.sub + 1) * {_PQ_DSUB})"
    d_vcb = (
        "(SELECT SUM((CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE)) * "
        "(CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE))) "
        f"FROM (SELECT UNNEST(list_slice(v.e, {sub_lo}, {sub_hi})) AS a, "
        "UNNEST(cb.cvec) AS b) u)"
    )
    d_qcb = (
        "(SELECT SUM((CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE)) * "
        "(CAST(u.a AS DOUBLE) - CAST(u.b AS DOUBLE))) "
        f"FROM (SELECT UNNEST(list_slice(q.qe, cb.sub * {_PQ_DSUB} + 1, "
        f"(cb.sub + 1) * {_PQ_DSUB})) AS a, UNNEST(cb.cvec) AS b) u)"
    )
    d_exact = _SQL_SQ_L2.format(q="c.qe", v="v.e")
    return f"""
WITH cents(cell_id, cvec) AS (VALUES
  {cent_rows}
),
nz AS (SELECT vec_id, embedding, {norm_col} AS nrm FROM embeddings),
nv AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS e
       FROM nz WHERE nrm > 0),
nt AS (SELECT GREATEST(COUNT(*) // {_PQ_KSUB * 4}, 1) AS step FROM nv),
sel AS (
  SELECT vec_id, e FROM nv, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_PQ_KSUB}
),
zrows AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS z, e
  FROM sel
),
cb AS (
  SELECT s.sub, z.z,
         list_slice(z.e, s.sub * {_PQ_DSUB} + 1, (s.sub + 1) * {_PQ_DSUB}) AS cvec
  FROM (SELECT UNNEST(range({_PQ_M})) AS sub) s CROSS JOIN zrows z
),
cellasg AS (
  SELECT vec_id, cell_id FROM
    (SELECT v.vec_id, c.cell_id,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {l2_vc}, c.cell_id) AS rn
     FROM nv v CROSS JOIN cents c)
  WHERE rn = 1
),
codes AS (
  SELECT vec_id, sub, z FROM
    (SELECT v.vec_id, cb.sub, cb.z,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id, cb.sub ORDER BY {d_vcb}, cb.z) AS rn
     FROM nv v CROSS JOIN cb)
  WHERE rn = 1
),
q AS (SELECT z.vec_id AS query_id,
             list_transform(z.embedding, x -> CAST(x AS DOUBLE) / z.nrm) AS qe
      FROM nz z WHERE {_COSINE_IVFPQ_QPRED} AND z.nrm > 0),
qp AS (
  SELECT query_id, qe, cell_id FROM
    (SELECT q.query_id, q.qe, c.cell_id,
            ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY {l2_qc}, c.cell_id) AS rn
     FROM q CROSS JOIN cents c)
  WHERE rn <= {_COSINE_IVFPQ_NPROBE}
),
lut AS (
  SELECT q.query_id, cb.sub, cb.z, {d_qcb} AS d
  FROM q CROSS JOIN cb
),
adc AS (
  SELECT qp.query_id, a.vec_id AS id, SUM(lut.d) AS adist
  FROM codes a
  JOIN cellasg ca ON ca.vec_id = a.vec_id
  JOIN qp ON qp.cell_id = ca.cell_id
  JOIN lut ON lut.query_id = qp.query_id AND lut.sub = a.sub AND lut.z = a.z
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, id FROM
    (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((adist) * 1e6, 0) / 1e6, id) AS crn FROM adc)
  WHERE crn <= {5 * _COSINE_IVFPQ_RERANK}
),
exact AS (
  SELECT c.query_id, c.id, {d_exact} AS distance
  FROM (SELECT cand.query_id, cand.id, q.qe FROM cand JOIN q USING (query_id)) c
  JOIN nv v ON c.id = v.vec_id
)
SELECT query_id, id, ROUND(1.0 - distance / 2.0, 6) AS cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
  FROM exact)
WHERE rank <= 5
"""


# round-7 rotation (the established policy: each round's headline
# features get an INDEPENDENT driver check the same round): the cosine
# IVF+PQ tier joins the driver window; vector_centroids (its kmeans
# literals are already driver-replayed through ivf_trained_topk's
# frozen-centroid oracle) moves to the pytest tier with the identical
# DuckDB comparison.
QUERIES["ann_cosine_ivfpq_topk"] = q_ann_cosine_ivfpq_topk
ORACLES["ann_cosine_ivfpq_topk"] = _cosine_ivfpq_oracle()
EXTRA_QUERIES["vector_centroids"] = q_vector_centroids
EXTRA_ORACLES["vector_centroids"] = _CENTROID_SQL

# round-8 rotation (VERDICT r07 item 2): two thin vector rows leave the
# driver window for the round-7 flagships (registry/llm.py) — the
# sharded fan-out's result-equality with plain knn and the per-shard
# count stay verified with the identical DuckDB comparison here, plus
# dedicated semantics tests (tests/test_knn.py).
for _name in ("knn_sharded", "shard_cardinality"):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# --- engine-served incremental vector store (round 8, VERDICT r07 #1) -------
# VectorEngine.attach_store under the independent oracle: engine
# mutations flow to the merge-on-read IvfIndexStore as O(Δ) appends at
# every compaction (never a full index rebuild), and search(
# method='store') under STRONG must equal an IVF probe over the
# LWW-compacted corpus with the attach-time centroids.  The scenario
# deliberately spans TWO pushes (a STRONG read between the mutation
# groups forces an intermediate compact→push), so the row also proves
# the store-global seq remapping: each compacted MutationLog restarts
# its seqs at 1, and without the engine's monotone offset the second
# push's replacement of vec 3 would LOSE arbitration to the first
# push's row and resurrect the older embedding.

def q_knn_store_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace/delete/insert through the ENGINE, served from the
    incremental store (engine.attach_store → streaming/ivf_stream.py;
    replaces the reference's full-index-rewrite-per-mutation,
    src/index/vector_shard.cc:101-106, with O(Δ) maintenance)."""
    import shutil
    import tempfile

    from ..engine import VectorEngine

    emb = _emb(spark, sf_dir)
    eng = VectorEngine(spark, emb.select("vec_id", "embedding", "label"))
    root = os.path.join(
        tempfile.gettempdir(), f"dvss_spark_vecstore_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)  # stale store from a prior run
    eng.attach_store(root, num_cells=_IVF_NUM_CELLS, n_probe=_IVF_NPROBE)
    src = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin([5, 7, 9])).collect()
    }
    q = _query_set(emb, F.col("vec_id") % 100 == 0)
    # push 1: replace vec 3 (borrows vec 5's embedding), delete vec 4
    eng.upsert(3, src[5], label=1003)
    eng.delete(4)
    eng.search(q, 5, method="store", consistency="strong")  # compact→push 1
    # push 2: SUPERSEDE push 1's vec-3 row, insert a new id (borrowing
    # vec 7's embedding — the duplicate-distance tie the rounded rank
    # key must break by id), delete an absent id (tombstone no-op)
    eng.upsert(3, src[9], label=2003)
    eng.upsert(1000003, src[7], label=7)
    eng.delete(999999999)
    return _round_result(
        eng.search(q, 5, method="store", consistency="strong")
    )


def _knn_store_mutations_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    l2_qa = _SQL_SQ_L2.format(q="qp.qe", v="a.embedding")
    return f"""
WITH mut AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id NOT IN (3, 4)
  UNION ALL
  SELECT CAST(3 AS BIGINT), (SELECT embedding FROM embeddings WHERE vec_id = 9)
  UNION ALL
  SELECT CAST(1000003 AS BIGINT), (SELECT embedding FROM embeddings WHERE vec_id = 7)
),
nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM mut v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_IVF_NPROBE}),
scored AS (SELECT qp.query_id, a.vec_id AS id, {l2_qa} AS distance
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
ranked AS (SELECT query_id, id, distance,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 5
"""


EXTRA_QUERIES["knn_store_mutations"] = q_knn_store_mutations
EXTRA_ORACLES["knn_store_mutations"] = _knn_store_mutations_oracle()


# --- persisted IVF+SQ8 index (round 8, sources/ivfsq_index.py) ---------------
# The middle rung of the compressed serving ladder (FAISS
# IndexIVFScalarQuantizer re-expressed as parquet layout + pruning):
# cell-partitioned int8 codes + per-vector scale, ~8x less coarse scan
# IO than the float cells, no codebook training, shallow exact re-rank.
# Every stage is deterministic (hash-thinned centroids, max-abs affine
# encode), so the oracle replays centroid choice, cell routing,
# quantization, the coarse cut, and the re-rank end-to-end in SQL.

_SQ8_RERANK = 3
_SQ8_STATE: dict[str, str] = {}


def sq8_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the cell-partitioned SQ8 index once per process."""
    import tempfile

    from ..sources.ivfsq_index import write_ivf_sq8_index

    path = _SQ8_STATE.get(sf_dir)
    if path is None:
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivfsq_{os.getpid()}", name
        )
        write_ivf_sq8_index(
            _emb(spark, sf_dir), path, _ivf_thinned_centroids(spark, sf_dir)
        )
        _SQ8_STATE[sf_dir] = path
    return path


def q_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.ivfsq_index import search_ivf_sq8_index

    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 100 == 31)
    return _round_result(
        search_ivf_sq8_index(
            spark, sq8_index(spark, sf_dir), q, 5,
            _ivf_thinned_centroids(spark, sf_dir),
            n_probe=_IVF_NPROBE, rerank=_SQ8_RERANK,
        )
    )


def _ann_sq8_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    l2_qd = _SQL_SQ_L2.format(q="qp.qe", v="a.dq")
    l2_ex = _SQL_SQ_L2.format(q="c.qe", v="v.embedding")
    return f"""
WITH nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
sq AS (
  SELECT vec_id, embedding,
    (SELECT MAX(ABS(CAST(u.a AS DOUBLE))) FROM (SELECT UNNEST(embedding) AS a) u)
      / 127.0 AS scale
  FROM embeddings
),
dq AS (
  SELECT vec_id, embedding,
    CASE WHEN scale = 0
         THEN list_transform(embedding, x -> 0.0)
         ELSE list_transform(embedding, x -> GREATEST(-127.0,
                LEAST(127.0, FLOOR(CAST(x AS DOUBLE) / scale + 0.5))) * scale)
    END AS dq
  FROM sq
),
vd AS (SELECT v.vec_id, v.embedding, d.dq, c.cell_id, {l2_vc} AS d
       FROM embeddings v JOIN dq d USING (vec_id) CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, dq, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 31),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_IVF_NPROBE}),
coarse AS (SELECT qp.query_id, a.vec_id AS id, qp.qe, {l2_qd} AS cd
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
cand AS (
  SELECT query_id, id, qe FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((cd) * 1e6, 0) / 1e6, id) AS crn
    FROM coarse)
  WHERE crn <= {5 * _SQ8_RERANK}
),
exact AS (
  SELECT c.query_id, c.id, {l2_ex} AS distance
  FROM cand c JOIN embeddings v ON c.id = v.vec_id
)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
  FROM exact)
WHERE rank <= 5
"""


EXTRA_QUERIES["ann_sq8_topk"] = q_ann_sq8_topk
EXTRA_ORACLES["ann_sq8_topk"] = _ann_sq8_oracle()


# --- binary (1-bit) quantization tier (round 8) ------------------------------
# The bottom rung of the compression ladder: sign bits packed into
# longs, integer Hamming coarse rank (no rounded key needed — ties are
# exact), exact re-rank.  The oracle replays the Hamming as the
# per-dimension sign-disagreement count (equal to the packed popcount
# by construction: bit = 1 iff x > 0 on both sides), then the same
# exact re-rank as the int8 tier.

_BINARY_RERANK = 8
_BINARY_QPRED_SPARK = lambda: F.col("vec_id") % 40 == 9  # noqa: E731
_BINARY_QPRED_SQL = "vec_id % 40 = 9"


def q_knn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantize import binary_knn

    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    q = _query_set(emb, _BINARY_QPRED_SPARK())
    return _round_result(
        binary_knn(emb, q, 5, dim, rerank=_BINARY_RERANK)
    )


_BIN_HD = (
    "(SELECT SUM(CASE WHEN (CAST(u.a AS DOUBLE) > 0) <> (CAST(u.b AS DOUBLE) > 0) "
    "THEN 1 ELSE 0 END) FROM (SELECT UNNEST({q}) AS a, UNNEST({v}) AS b) u)"
)


def _knn_binary_oracle() -> str:
    hd = _BIN_HD.format(q="q.qe", v="v.embedding")
    ex = _SQL_SQ_L2.format(q="c.qe", v="v.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE {_BINARY_QPRED_SQL}),
coarse AS (
  SELECT q.query_id, v.vec_id AS id, q.qe, {hd} AS hd
  FROM q CROSS JOIN embeddings v
),
cand AS (
  SELECT query_id, id, qe FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hd, id) AS crn
    FROM coarse)
  WHERE crn <= {5 * _BINARY_RERANK}
),
exact AS (
  SELECT c.query_id, c.id, {ex} AS distance
  FROM cand c JOIN embeddings v ON c.id = v.vec_id
)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
  FROM exact)
WHERE rank <= 5
"""


EXTRA_QUERIES["knn_binary"] = q_knn_binary
EXTRA_ORACLES["knn_binary"] = _knn_binary_oracle()


# --- persisted IVF+binary index (round 9, sources/ivfbin_index.py) -----------
# The 1-bit rung composed with cell pruning (VERDICT r08 item 3): the
# packed sign bits get the same cell-partitioned layout as the float /
# SQ8 / PQ tiers, so the ~64x-smaller coarse column is ALSO partition
# pruned.  Every stage is deterministic (hash-thinned centroids, sign
# packing, integer Hamming with exact id tie-break), so the oracle
# replays routing, the sign-disagreement coarse cut (== the packed
# popcount by construction), and the exact re-rank end-to-end in SQL.

_IVFBIN_RERANK = 16
_IVFBIN_STATE: dict[str, str] = {}


def ivfbin_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the cell-partitioned binary index once per process."""
    import tempfile

    from ..sources.ivfbin_index import write_ivf_binary_index

    path = _IVFBIN_STATE.get(sf_dir)
    if path is None:
        name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        path = os.path.join(
            tempfile.gettempdir(), f"dvss_spark_ivfbin_{os.getpid()}", name
        )
        emb = _emb(spark, sf_dir)
        dim = len(emb.select("embedding").first()[0])
        write_ivf_binary_index(
            emb, path, _ivf_thinned_centroids(spark, sf_dir), dim
        )
        _IVFBIN_STATE[sf_dir] = path
    return path


def q_ann_ivfbin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.ivfbin_index import search_ivf_binary_index

    emb = _emb(spark, sf_dir)
    q = _query_set(emb, F.col("vec_id") % 100 == 43)
    return _round_result(
        search_ivf_binary_index(
            spark, ivfbin_index(spark, sf_dir), q, 5,
            _ivf_thinned_centroids(spark, sf_dir),
            n_probe=_IVF_NPROBE, rerank=_IVFBIN_RERANK,
        )
    )


def _ann_ivfbin_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    l2_qc = _SQL_SQ_L2.format(q="q.qe", v="c.cvec")
    hd = _BIN_HD.format(q="qp.qe", v="a.embedding")
    l2_ex = _SQL_SQ_L2.format(q="c.qe", v="v.embedding")
    return f"""
WITH nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id, v.embedding, c.cell_id, {l2_vc} AS d
       FROM embeddings v CROSS JOIN cents c),
asg AS (SELECT vec_id, embedding, cell_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 43),
qd AS (SELECT q.query_id, q.qe, c.cell_id, {l2_qc} AS d FROM q CROSS JOIN cents c),
qp AS (SELECT query_id, qe, cell_id FROM
       (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell_id) AS rn
        FROM qd)
       WHERE rn <= {_IVF_NPROBE}),
coarse AS (SELECT qp.query_id, a.vec_id AS id, qp.qe, {hd} AS hd
           FROM qp JOIN asg a ON a.cell_id = qp.cell_id),
cand AS (
  SELECT query_id, id, qe FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hd, id) AS crn
    FROM coarse)
  WHERE crn <= {5 * _IVFBIN_RERANK}
),
exact AS (
  SELECT c.query_id, c.id, {l2_ex} AS distance
  FROM cand c JOIN embeddings v ON c.id = v.vec_id
)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
  FROM exact)
WHERE rank <= 5
"""


EXTRA_QUERIES["ann_ivfbin_topk"] = q_ann_ivfbin_topk
EXTRA_ORACLES["ann_ivfbin_topk"] = _ann_ivfbin_oracle()


# --- hot-cell splitting (round 8, sources/ivf_index.py) ----------------------
# Incremental IVF rebalancing as a registry row: build a fresh
# cell-partitioned layout, split every cell above 1.5x the mean via
# sub-clustering + dynamic partition overwrite, return the post-split
# histogram.  kmeans sub-training has no SQL form, so the row is
# weak-checked (rows-only) — the invariants (row preservation, cold
# partitions untouched byte-for-byte, full-probe exactness unchanged)
# live in tests/test_ivf_index.py.

def q_ivf_cell_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOMATIC skew maintenance (round 9, VERDICT r08 item 4): a
    skew-concentrated append batch drives one cell over the bound, the
    next ``compact(max_cell_rows=...)`` splits it INSIDE the uncommitted
    generation, and the row returns the post-split FULL-probe search.
    Full probe is exact regardless of the physical cell layout, so the
    oracle — plain exact kNN over the mutated corpus — checks the
    invariant that matters: the kmeans-driven split changed WHERE rows
    live, never WHAT a search returns (upgraded from the r08
    histogram-only weak check).  The split itself is asserted
    driver-side (centroid list must grow), so a silently-skipped split
    fails the row rather than passing vacuously."""
    import shutil
    import tempfile

    from ..operators.mutations import UPSERT
    from ..streaming.ivf_stream import IvfIndexStore

    emb = _emb(spark, sf_dir)
    cents = _ivf_thinned_centroids(spark, sf_dir)
    n = emb.count()
    threshold = max((3 * n) // (2 * _IVF_NUM_CELLS), 1)
    m = threshold + 1  # guarantees the target cell exceeds the bound
    root = os.path.join(
        tempfile.gettempdir(), f"dvss_spark_rebal_{os.getpid()}",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
    )
    shutil.rmtree(root, ignore_errors=True)  # fresh store every call
    store = IvfIndexStore(root, cents, max_cell_rows=threshold)
    store.init_base(emb.select("vec_id", "embedding", "label"))
    # m identical copies of vec 5's embedding: they all route to one
    # cell, which therefore exceeds the bound after the fold
    src = emb.filter(F.col("vec_id") == 5).select(
        F.col("embedding").alias("_e"), F.col("label").alias("_l")
    )
    batch = spark.range(m).crossJoin(F.broadcast(src)).select(
        (F.lit(2_000_000) + F.col("id")).alias("vec_id"),
        F.col("_e").alias("embedding"),
        F.col("_l").alias("label"),
        (F.col("id") + 1).cast("long").alias("seq"),
        F.lit(UPSERT).alias("op"),
    )
    store.append_batch(batch)
    store.compact(spark)  # consults max_cell_rows -> auto-split
    assert len(store.centroids) > len(cents), (
        "compact(max_cell_rows) did not split the hot cell"
    )
    q = _query_set(emb, F.col("vec_id") % 100 == 0)
    return _round_result(
        store.search(spark, q, 5, n_probe=len(store.centroids))
    )


def _ivf_rebalance_oracle() -> str:
    """Exact kNN over base ∪ skew appends — full probe of the split
    layout must equal it (no centroid replay needed: probing every cell
    is exact whatever the layout)."""
    l2 = _SQL_SQ_L2.format(q="q.qe", v="v.embedding")
    return f"""
WITH nt AS (SELECT GREATEST((3 * COUNT(*)) // (2 * {_IVF_NUM_CELLS}), 1) + 1 AS m
            FROM embeddings),
mut AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT CAST(2000000 + i AS BIGINT) AS vec_id,
         (SELECT embedding FROM embeddings WHERE vec_id = 5) AS embedding
  FROM (SELECT UNNEST(range((SELECT m FROM nt))) AS i)
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
scored AS (SELECT q.query_id, v.vec_id AS id, {l2} AS distance FROM q CROSS JOIN mut v),
ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= 5
"""


EXTRA_QUERIES["ivf_cell_rebalance"] = q_ivf_cell_rebalance
EXTRA_ORACLES["ivf_cell_rebalance"] = _ivf_rebalance_oracle()


# round-9 rotation (VERDICT r08 item 1, the established policy: each
# round's flagships get an INDEPENDENT driver check the next round):
# round 8's two vector flagships — the O(Δ) engine-served vector store
# (whose store-global seq remap most deserves independent verification;
# engine.py:attach_store) and the IVF+SQ8 middle compression rung —
# join the driver window.  The numpy batch-kernel variant leaves in
# exchange: it shares knn_batch's oracle (already driver-verified) and
# keeps the identical DuckDB comparison in the pytest tier plus the
# kernel-parity tests in tests/test_knn.py.
for _name in ("knn_store_mutations", "ann_sq8_topk"):
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    ORACLES[_name] = EXTRA_ORACLES.pop(_name)
EXTRA_QUERIES["knn_batch_numpy"] = QUERIES.pop("knn_batch_numpy")
EXTRA_ORACLES["knn_batch_numpy"] = ORACLES.pop("knn_batch_numpy")
del _name


# round-9 close rotation (same policy, applied at round end so the
# round's OWN flagship gets its independent driver check immediately):
# the IVF+binary rung — the compression ladder's new bottom tier, whose
# packed-popcount == sign-disagreement identity and cell routing most
# deserve the external replay — joins the driver window.  The
# kmeans-trained persisted-IVF variant leaves in exchange: its serving
# path is the SAME search_ivf_index plan the driver still verifies via
# ivf_persisted_topk (only the centroid source differs — frozen
# literals whose training is locked by tests/test_clustering.py), and
# it keeps the IDENTICAL DuckDB comparison in the pytest tier.
QUERIES["ann_ivfbin_topk"] = EXTRA_QUERIES.pop("ann_ivfbin_topk")
ORACLES["ann_ivfbin_topk"] = EXTRA_ORACLES.pop("ann_ivfbin_topk")
EXTRA_QUERIES["ivf_trained_topk"] = QUERIES.pop("ivf_trained_topk")
EXTRA_ORACLES["ivf_trained_topk"] = ORACLES.pop("ivf_trained_topk")


# ---------------------------------------------------------------------------
# Round-9: bulk retention deletes on the merge-on-read store.
# `IvfIndexStore.delete_where` is the missing maintenance verb for a
# 100 TB corpus under data-governance pressure: retention windows, GDPR
# erasure, policy removal of a label class — ONE O(matching) tombstone
# append evaluated against the LIVE folded view (so it sees
# post-mutation values), physical removal deferred to compaction.  The
# scenario mixes per-id mutations WITH the sweep: an upsert moves vec 3
# OUT of the retention class (survives) and vec 5 INTO it (swept) —
# proving the sweep arbitrates against mutated state, not the base
# snapshot.  Full-probe search afterward must equal exact kNN over the
# fold-then-filter corpus, which keeps the oracle centroid-free.

_RET_QPRED = "vec_id % 100 = 0"
_RET_K = 5


def q_retention_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..schemas import MUTATIONS_SCHEMA
    from ..streaming.ivf_stream import IvfIndexStore

    emb = _emb(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(), f"dvss_spark_retention_{os.getpid()}",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
    )
    shutil.rmtree(root, ignore_errors=True)  # stale store from a prior run
    store = IvfIndexStore(root, _ivf_thinned_centroids(spark, sf_dir))
    store.init_base(emb)
    v7 = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    store.append_batch(
        spark.createDataFrame(
            [
                (1, "upsert", 3, None, v7, 1000),  # out of the class
                (2, "upsert", 5, None, v7, 10),    # into the class
                (3, "delete", 11, None, None, None),
            ],
            MUTATIONS_SCHEMA,
        )
    )
    store.delete_where(spark, "label % 7 = 3")
    q = _query_set(emb, F.expr(_RET_QPRED))
    return _round_result(
        store.search(spark, q, _RET_K, n_probe=len(store.centroids))
    )


def _retention_oracle() -> str:
    dist = _SQL_SQ_L2.format(q="q.qe", v="v.embedding")
    return f"""
WITH mut AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id NOT IN (3, 5, 11)
  UNION ALL
  SELECT CAST(3 AS BIGINT), (SELECT embedding FROM embeddings WHERE vec_id = 7),
         CAST(1000 AS INT)
  UNION ALL
  SELECT CAST(5 AS BIGINT), (SELECT embedding FROM embeddings WHERE vec_id = 7),
         CAST(10 AS INT)
),
v AS (SELECT vec_id, embedding FROM mut WHERE NOT (label % 7 = 3)),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE {_RET_QPRED}),
scored AS (SELECT q.query_id, v.vec_id AS id, {dist} AS distance FROM q CROSS JOIN v),
ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY round_even((distance) * 1e6, 0) / 1e6, id) AS INT) AS rank
           FROM scored)
SELECT query_id, id, ROUND(distance, 6) AS distance, rank FROM ranked WHERE rank <= {_RET_K}
"""


EXTRA_QUERIES["retention_delete"] = q_retention_delete
EXTRA_ORACLES["retention_delete"] = _retention_oracle()


# round-9 NEW-capability rotation (vector side; see registry/llm.py for
# the policy note): the retention sweep — this round's governance verb
# on the merge-on-read store — joins the driver window; the LSH ANN row
# leaves in exchange (the ANN family keeps IVF/PQ/SQ8/binary/cosine
# driver rows; LSH keeps its identical oracle in the pytest tier).
QUERIES["retention_delete"] = EXTRA_QUERIES.pop("retention_delete")
ORACLES["retention_delete"] = EXTRA_ORACLES.pop("retention_delete")


# round-11 opening rotation, vector side (see registry/llm.py for the
# round-10 flagship promotions these three demotions balance):
# knn_quantized (the int8 rung; the compression ladder keeps SQ8 /
# IVF+PQ / cosine-IVF+PQ / IVF+binary driver rows), ann_pq_topk (the
# flat-PQ rung; ann_ivfpq_topk keeps ADC + rerank driver-side), and
# cache_persistent_probe (the cache family keeps cache_digest
# driver-side; TTL/LRU/semantic rows already live in the pytest
# tier).  Identical DuckDB comparisons retained in the pytest tier.
for _name in ("knn_quantized", "ann_pq_topk", "cache_persistent_probe"):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# round-11 opening rotation, vector side (see registry/llm.py for the
# six round-10 flagship promotions these three demotions balance):
# ivf_persisted_topk (the IVF family keeps ivf_stream_topk and
# ann_cosine_ivf_topk driver-side), ann_cosine_ivfpq_topk (cosine
# keeps ann_cosine_ivf_topk; the PQ rung keeps ann_ivfpq_topk), and
# mutations_delete (the mutation family keeps mutations_compact,
# knn_after_mutations, retention_delete, and all four _store_mutations
# rows driver-side).  Identical DuckDB comparisons retained in the
# pytest tier.
for _name in ("ivf_persisted_topk", "ann_cosine_ivfpq_topk", "mutations_delete"):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# round-11 CLOSE rotation, vector side (see registry/llm.py for the
# six round-11 flagship promotions this demotion balances):
# ann_knn_join leaves — the kNN family keeps knn_single / knn_batch /
# knn_filtered / knn_shard_routed / knn_after_mutations /
# knn_store_mutations driver rows; identical DuckDB comparison
# retained in the pytest tier.
EXTRA_QUERIES["ann_knn_join"] = QUERIES.pop("ann_knn_join")
EXTRA_ORACLES["ann_knn_join"] = ORACLES.pop("ann_knn_join")


# ---------------------------------------------------------------------------
# round 11 (post-close): cluster-balanced corpus subsampling
# (operators/sampling.cluster_balanced_sample) — the topic-quota verb
# after dedup: cap each embedding-cluster's representation

_CBS_CAP = 40
_CBS_SEED = 11


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import cluster_balanced_sample

    emb = _emb(spark, sf_dir)
    return cluster_balanced_sample(
        emb, _ivf_thinned_centroids(spark, sf_dir), _CBS_CAP,
        seed=_CBS_SEED,
    )


def _cluster_balanced_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql
    from ..operators.similarity import IVF_THIN_SEED

    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)", seed=IVF_THIN_SEED)
    hk = portable_hash64_sql("CAST(id AS VARCHAR)", seed=_CBS_SEED)
    l2_vc = _SQL_SQ_L2.format(q="v.embedding", v="c.cvec")
    return f"""
WITH nt AS (SELECT GREATEST(COUNT(*) // {_IVF_NUM_CELLS * 4}, 1) AS step FROM embeddings),
sel AS (
  SELECT vec_id, embedding FROM embeddings, nt
  WHERE ({h}) % step = 0
  ORDER BY vec_id LIMIT {_IVF_NUM_CELLS}
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         embedding AS cvec
  FROM sel
),
vd AS (SELECT v.vec_id AS id, c.cell_id, {l2_vc} AS d
       FROM embeddings v CROSS JOIN cents c),
asg AS (SELECT id, cell_id AS cluster_id FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, cell_id) AS rn
         FROM vd)
        WHERE rn = 1),
capped AS (SELECT id, cluster_id FROM
           (SELECT id, cluster_id,
                   ROW_NUMBER() OVER (PARTITION BY cluster_id
                        ORDER BY {hk}, id) AS crn
            FROM asg)
           WHERE crn <= {_CBS_CAP})
SELECT id, cluster_id FROM capped
"""


EXTRA_QUERIES["cluster_balanced_sample"] = q_cluster_balanced_sample
EXTRA_ORACLES["cluster_balanced_sample"] = _cluster_balanced_oracle()
