"""Deterministic fixture up-scaling — the >sf0.1 anchor generator.

The driver ships fixtures up to sf0.1 only; every 100x claim in this
repo otherwise rests on plan-shape tests.  This module materializes an
N-fold copy of a fixture directory with per-copy key offsets so one
measured data point ABOVE sf0.1 exists (VERDICT r04 item 4) and
scaling verdicts are empirical, not extrapolated.

Correct up-scaling is not naive replication:

- **Foreign keys stay consistent per copy**: every key column in copy
  ``c`` is offset by ``c * stride(table)``, with the same stride used
  on both sides of each FK edge (orders.o_custkey moves exactly like
  customer.c_custkey), so joins produce 10x the rows, never 100x.
- **Dimension tables (region, nation) are NOT copied** — real
  deployments scale facts, not dims; nation keys referenced by copied
  customers/suppliers resolve against the single dim copy.
- **Document text is made copy-distinct** (every whitespace token gets
  an ATTACHED alphanumeric ``c<copy>x`` prefix): replicated text would
  make every doc an exact/near duplicate of its 9 clones, and dedup
  pair counts would blow up quadratically in copies — a DATA artifact
  that would mask the plan-scaling signal the anchor exists to
  measure.  The prefix must survive the analysis tokenizer as part of
  its token (see the inline comment in ``_scaled``): then cross-copy
  shingle overlap is zero AND the per-copy bigram/df structure is
  byte-for-byte isomorphic to the base, so dedup work scales linearly
  like the corpus.
- **Embeddings get per-copy deterministic jitter** (±5e-4 per
  component, derived from the new vec_id) so copies are not exact
  ties in distance ranking while remaining semantically identical.

Everything is expression-only — the generator runs distributed and
reproducibly at any multiple.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-table key strides (>= the key domain of the largest shipped
#: fixture, with headroom) — one shared constant per FK family
STRIDES = {
    "custkey": 10_000_000,
    "suppkey": 1_000_000,
    "partkey": 10_000_000,
    "orderkey": 100_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

#: fact tables and (column -> stride family); dims are passed through
_FACTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
_DIMS = ("region", "nation")


def _scaled(df: DataFrame, table: str, copies: int) -> DataFrame:
    """Explode ``df`` into ``copies`` key-offset copies (map-side)."""
    out = df.withColumn("_copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))))
    for col, family in _FACTS[table].items():
        out = out.withColumn(
            col, (F.col(col) + F.col("_copy") * STRIDES[family]).cast("long")
        )
    if table == "documents":
        # copy-distinct tokens: zero cross-copy shingle overlap (see
        # module docstring); copy 0 keeps the original text verbatim.
        # The marker MUST stay alphanumeric and attached ("c3xfoo"):
        # round-5 found that a separator marker ("c3·foo") re-tokenizes
        # under functions.text.tokens' [^a-z0-9]+ split into a FREE
        # "c3" token inserted between every pair of original tokens —
        # destroying word-bigram shingles (every doc in a copy then
        # shares a "c3 <word>" shingle with every doc containing that
        # word, and minhash candidate pairs explode ~quadratically:
        # 56.8M candidates at 10x sf0.1 vs the expected ~3k).  An
        # attached prefix preserves token count, bigram structure, and
        # df distribution exactly, per copy.
        out = out.withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    r"(\S+)",
                    F.concat(F.lit("c"), F.col("_copy").cast("string"), F.lit("x$1")),
                )
            ),
        )
    if table == "embeddings":
        # deterministic +-5e-4 jitter per component for copies > 0
        out = out.withColumn(
            "embedding",
            F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
                F.expr(
                    "transform(embedding, (x, j) -> CAST("
                    "x + (CAST(pmod(xxhash64(vec_id, j), 1000) AS DOUBLE) - 500.0)"
                    " / 1000000.0 AS FLOAT))"
                )
            ),
        )
    return out.drop("_copy")


def scale_fixture_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    copies: int = 10,
    overwrite: bool = False,
) -> str:
    """Materialize ``copies``-fold parquet fixtures at ``dst_dir``.

    Idempotent: an existing complete directory is reused unless
    ``overwrite`` (a ``_SCALE_OK`` marker commits completeness, so a
    crashed half-write is redone).  Returns ``dst_dir``."""
    marker = os.path.join(dst_dir, "_SCALE_OK")
    if not overwrite and os.path.exists(marker):
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    for table in _DIMS:
        df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dst_dir, f"{table}.parquet"))
    for table in _FACTS:
        df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
        _scaled(df, table, copies).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{table}.parquet")
        )
    with open(marker, "w", encoding="ascii") as f:
        f.write(f"copies={copies} src={src_dir}\n")
    return dst_dir
