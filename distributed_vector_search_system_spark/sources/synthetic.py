"""Deterministic synthetic vector corpus, generated INSIDE Spark.

The fixtures are 64-dim, but the reference serves 768-dim vectors
(reference config/node1.textproto:13,18 — ``dimension: 768``), and
expression cost, PQ geometry, and GEMM crossover all change with
width.  This generator produces an arbitrary-size, arbitrary-dimension
corpus with the same latent shape as the fixture embeddings (vectors
drawn around ``n_clusters`` hash-derived centers) WITHOUT any
driver-side data: every component is a pure expression of (vec_id, j),
so a 1000-executor cluster materializes any slice independently and
two runs anywhere produce bit-identical rows — the property that makes
benchmarks and parity tests at non-fixture widths reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    *,
    n_clusters: int = 10,
    noise_seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """(vec_id, label, embedding[dim]) — vec i sits near center i%k.

    Centers and noise both derive from ``xxhash64``: center component
    (cluster, j) spans [0, 10); per-vector noise (i, j, seed) spans
    [0, 0.2).  Deterministic under any partitioning.
    """
    base = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    return (
        base.select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_clusters).cast("int").alias("label"),
        )
        .withColumn(
            "embedding",
            F.expr(
                f"""
                transform(sequence(0, {dim - 1}), j ->
                  CAST(pmod(xxhash64(vec_id % {n_clusters}, j), 1000) AS DOUBLE) / 100.0
                  + CAST(pmod(xxhash64(vec_id, j, {noise_seed}), 200) AS DOUBLE) / 1000.0
                )
                """
            ),
        )
    )


def synthetic_zipf_postings(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int,
    terms_per_doc: int,
    *,
    seed: int = 7,
    partitions: int | None = None,
) -> DataFrame:
    """Zipf-vocabulary weighted postings ``(id, term, weight)`` — the
    geometry champion lists exist for (VERDICT r09 item 2).

    The fixture documents table has a FLAT small vocabulary (every
    query term matches most docs), which is the rank-capped tier's
    adversarial case by construction.  Real corpora are Zipfian: a few
    head terms with huge document frequency (where a per-term cap
    bounds IO and barely moves scores) and a long tail with df below
    any reasonable cap (unaffected).  This generator draws each (doc,
    slot) term rank log-uniformly — ``rank = floor(V^u)``, the s=1
    Zipf inverse-CDF — so term rank r has df ∝ 1/r, and weights
    EXPONENTIALLY (``-ln u`` — learned-sparse impact weights are
    heavy-tailed, which is precisely why champion lists work: a term's
    top-B postings carry most of its score mass).  Pure expressions of (id, slot, seed):
    deterministic under any partitioning, no driver-side data
    (``synthetic_vectors``' discipline).  Duplicate (doc, term) draws
    keep the max weight.
    """
    base = (
        spark.range(0, n_docs, 1, partitions) if partitions
        else spark.range(n_docs)
    )
    drawn = base.select(
        F.col("id"),
        F.explode(F.sequence(F.lit(0), F.lit(terms_per_doc - 1))).alias("_s"),
    ).select(
        "id",
        F.concat(
            F.lit("t"),
            F.floor(
                F.pow(
                    F.lit(float(vocab_size)),
                    (
                        F.pmod(F.xxhash64("id", "_s", F.lit(seed)), F.lit(1_000_000))
                        .cast("double") + F.lit(0.5)
                    ) / F.lit(1_000_000.0),
                )
            ).cast("long").alias("_r"),
        ).alias("term"),
        (
            -F.log(
                (
                    F.pmod(F.xxhash64("id", "_s", F.lit(seed + 1)), F.lit(1_000_000))
                    .cast("double") + F.lit(0.5)
                ) / F.lit(1_000_000.0)
            )
        ).alias("weight"),
    )
    return drawn.groupBy("id", "term").agg(F.max("weight").alias("weight"))


def synthetic_zipf_queries(
    spark: SparkSession,
    n_queries: int,
    vocab_size: int,
    terms_per_query: int,
    *,
    seed: int = 99,
) -> DataFrame:
    """Query postings ``(query_id, term, weight)`` drawn from the SAME
    log-uniform rank distribution as :func:`synthetic_zipf_postings`
    (queries follow the corpus vocabulary — head terms are queried
    often, tail terms rarely), weights exponential like the corpus side."""
    drawn = spark.range(n_queries).select(
        F.col("id").alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(terms_per_query - 1))).alias("_s"),
    ).select(
        "query_id",
        F.concat(
            F.lit("t"),
            F.floor(
                F.pow(
                    F.lit(float(vocab_size)),
                    (
                        F.pmod(
                            F.xxhash64("query_id", "_s", F.lit(seed)),
                            F.lit(1_000_000),
                        ).cast("double") + F.lit(0.5)
                    ) / F.lit(1_000_000.0),
                )
            ).cast("long").alias("_r"),
        ).alias("term"),
        (
            -F.log(
                (
                    F.pmod(
                        F.xxhash64("query_id", "_s", F.lit(seed + 1)),
                        F.lit(1_000_000),
                    ).cast("double") + F.lit(0.5)
                ) / F.lit(1_000_000.0)
            )
        ).alias("weight"),
    )
    return drawn.groupBy("query_id", "term").agg(F.max("weight").alias("weight"))
