"""Vector distance/similarity kernels.

Two tiers, both distributed:

1. **Expression tier** (default): pure ``pyspark.sql.functions`` column
   expressions (``zip_with`` + ``aggregate``).  Stays inside JVM
   whole-stage codegen — no Python in the loop — and is the tier the
   DuckDB correctness oracle mirrors term-for-term.
2. **NumPy tier** (hot path): Arrow-batched kernels used by
   ``operators.knn.knn(..., method="numpy")`` — one BLAS matrix
   multiply per Arrow batch instead of per-row expression evaluation.

Semantics note: the reference uses FAISS ``IndexFlatL2`` which returns
**squared** L2 (no sqrt) — reference src/index/vector_shard.cc:41.  All
arithmetic is done in double to keep cross-engine (Spark vs DuckDB
oracle) results bit-comparable; float32 inputs are promoted first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return col.cast("double")


def squared_l2(a, b) -> Column:
    """Squared L2 distance between two array<float|double> columns.

    Matches FAISS IndexFlatL2 (squared, un-rooted) — reference
    src/index/vector_shard.cc:41.  Element-wise ``(a-b)^2`` in double,
    sequential left-fold sum (same order as the oracle's UNNEST sum).
    """
    diffs = F.zip_with(
        a, b, lambda x, y: (_to_double(x) - _to_double(y)) * (_to_double(x) - _to_double(y))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def dot_product(a, b) -> Column:
    prods = F.zip_with(a, b, lambda x, y: _to_double(x) * _to_double(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _to_double(x) * _to_double(x))
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity in double; 0.0 for zero-norm inputs."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)
