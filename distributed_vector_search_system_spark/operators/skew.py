"""Skew-handling join/aggregation: key salting.

AQE's skew-join splitting (enabled in session.py) handles skew it can
detect at shuffle time; salting is the explicit, planner-independent
form for the pathological case every 100 TB pipeline eventually hits —
one key holding a double-digit percent of the rows (the empty-string
document, the null user, the default shard).

- ``salted_join``: fact×dim equi-join where a handful of dim keys are
  hot.  The fact side appends a deterministic salt in [0, buckets); the
  dim side is replicated ``buckets``× (explode of a literal range — dim
  rows are small by assumption).  The join key becomes (key, salt), so
  one hot key spreads over ``buckets`` reducers instead of one.
- ``salted_agg``: two-phase aggregation — partial agg on (key, salt),
  final agg on key.  Spark's own partial aggregation usually makes this
  unnecessary for algebraic aggregates; the explicit form exists for
  aggregates that buffer per-group state (collect_list/percentile) where
  the single hot reducer, not the map side, is the bottleneck.

The salt is ``pmod(xxhash64(fact columns...), buckets)`` — deterministic
(reruns and retries land rows in the same bucket; no rand() in the
plan), uniform, and computed in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def _salt(cols: list[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    buckets: int = 8,
    how: str = "inner",
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the dim side replicated across salt buckets.

    ``salt_source`` defaults to every fact column — any deterministic,
    roughly-uniform set of columns works; pass an explicit subset (e.g. a
    row id) when the fact table is wide.  Result equals
    ``fact.join(dim, on, how)`` for ``how`` in (inner, left) — verified
    in tests/test_skew.py.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    src = salt_source if salt_source is not None else fact.columns
    salted_fact = fact.withColumn(SALT_COL, _salt(src, buckets))
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_fact.join(replicated_dim, on=keys + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, str],
    *,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates.

    ``aggs`` maps output column name → (input column, fn) expressed as
    ``"fn:col"`` — supported fns: sum, count, min, max.  Phase one
    aggregates on (keys, salt); phase two folds the ≤ ``buckets``
    partials per key (sum→sum, count→sum, min→min, max→max).
    """
    klist = [keys] if isinstance(keys, str) else list(keys)
    partial_exprs, final_exprs = [], []
    for out_name, spec in aggs.items():
        fn, col = spec.split(":", 1)
        p = f"_p_{out_name}"
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out_name))
        elif fn == "count":
            partial_exprs.append(F.count(col if col != "*" else "*").alias(p))
            final_exprs.append(F.sum(p).alias(out_name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out_name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out_name))
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")
    salted = df.withColumn(SALT_COL, _salt(df.columns, buckets))
    partial = salted.groupBy(*klist, SALT_COL).agg(*partial_exprs)
    return partial.groupBy(*klist).agg(*final_exprs)
