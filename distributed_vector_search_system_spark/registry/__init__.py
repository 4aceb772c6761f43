"""Driver-contract query registry.

Aggregates every implemented operator's ``(spark, sf_dir) -> DataFrame``
builder plus (where SQL-expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` re-exports these for the correctness harness.

Tiering (VERDICT r01 item 1): the external driver verifies only the
FIRST 50 registry entries, so

- module order is ``(vector, llm, relational)`` — the 16 LLM-pipeline
  queries (dedup / ANN / text / multimodal) sit inside the window;
- ``queries()``/``oracle_sql()`` export exactly ``DRIVER_LIMIT`` entries
  (near-duplicate relational entries from round 1 were merged to fit);
- the remaining coverage lives in ``extra_queries()`` /
  ``extra_oracle_sql()`` and is verified by the repo's own mirror
  harness (tests/test_oracle_parity.py) with the identical DuckDB
  comparison.

Conventions (FIXTURES.md):
- squared L2, un-rooted, computed in double in BOTH engines;
- OUTPUT distances rounded to 6 decimals in BOTH engines (Spark
  ``F.round`` / DuckDB ``ROUND`` — kills last-ulp summation-order
  noise while keeping 1e-6 discrimination);
- distance-space top-k RANKS on the shared half-even key
  ``rint(x*1e6)/1e6`` (Spark ``functions.distance.rank_key``, DuckDB
  ``round_even((x)*1e6, 0)/1e6``, numpy ``np.round(x, 6)`` — all
  three bit-identical, so expr / numpy / oracle tiers select the same
  rows; ADVICE r07), then ties break on ``id``;
- every computed column aliased identically on both sides;
- integer SUMs CAST to BIGINT in DuckDB oracles (HUGEINT → float64
  otherwise); array outputs serialized to CSV strings on both sides
  (the driver's canonicalizer cannot hash array cells).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import llm, relational, vector

_MODULES = (vector, llm, relational)

#: the external driver's correctness window — the exported registry must
#: never exceed it, or tail entries silently lose verification
DRIVER_LIMIT = 50


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    assert len(out) <= DRIVER_LIMIT, (
        f"registry has {len(out)} driver entries > {DRIVER_LIMIT}; "
        "move overflow to EXTRA_QUERIES or merge entries"
    )
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.EXTRA_QUERIES)
    return out


def extra_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.EXTRA_ORACLES)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver tier + pytest tier — what the local harness and bench use."""
    return {**queries(), **extra_queries()}


def all_oracle_sql() -> dict[str, str]:
    return {**oracle_sql(), **extra_oracle_sql()}
