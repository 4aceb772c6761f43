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
