"""Driver-style differential test: every registered query with an oracle
must match DuckDB at sf=0.01 (the driver's t2 correctness gate)."""

from __future__ import annotations

import pytest

from distributed_vector_search_system_spark import registry

from .oracle_util import compare

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_oracle, name):
    df = _QUERIES[name](spark, sf_oracle)
    ok, msg = compare(df, _ORACLES[name], sf_oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_weak_check_runs(spark, sf_oracle, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, sf_oracle)
    assert df.columns
    assert df.count() >= 0
