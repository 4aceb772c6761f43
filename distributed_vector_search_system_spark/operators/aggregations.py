"""Search-analytics metric aggregations, round 11: extended stats,
percentiles, cardinality, top-hits — the ES metric-aggregation family
(``extended_stats`` / ``percentiles`` / ``cardinality`` / ``top_hits``)
next to round 9/10's bucket aggregations (facets, histogram,
significant terms).

The reference has no aggregation surface (its one read is vector
top-k, ``src/rpc/search_service_impl.cc``); a corpus-scale deployment
of the same engine answers "what does this slice of the data look
like" constantly — latency percentiles over events, distinct-user
cardinality, per-bucket exemplar rows for a dashboard.  Each operator
below groups by an optional bucket column list, so they compose with
any upstream restriction (a filter, a match set's semi-join) the way
the facet verbs do.

Exact vs approximate, the repo's two-tier convention:

- the EXACT forms carry the DuckDB oracles (``percentile`` /
  ``count_distinct`` are deterministic and SQL-replayable);
- the APPROXIMATE forms are the 100 TB path — ``percentile_approx``
  (GK sketch: bounded memory per group, mergeable map-side, accuracy
  knob) and ``approx_count_distinct`` (HyperLogLog++: O(1) memory,
  rsd knob).  Exact percentiles BUFFER every value of a group on one
  executor and exact count_distinct shuffles every distinct value —
  both are oracle-carriers here, not serving plans (the same stance
  as ``bm25_topk`` vs ``bm25_index_topk``).  The approximate tiers'
  error is property-tested against the exact tiers in
  tests/test_aggregations.py.

Everything is one hash aggregate with map-side partial combine; the
only window is ``top_hits``' per-bucket rank over bucket-restricted
rows.  Deterministic output → exact SQL replay (doubles rounded to 6,
the repo convention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grouped(df: DataFrame, by: Sequence[str] | None):
    return df.groupBy(*by) if by else df.groupBy()


#: serving-tier guard (VERDICT r11 item 6): the exact percentile /
#: cardinality tiers buffer a group's values on one executor / shuffle
#: every distinct value — they exist as deterministic ORACLE CARRIERS,
#: not serving plans.  Above this many input rows the exact forms
#: refuse and direct callers to the GK / HLL++ tier; the probe costs a
#: threshold-bounded incremental scan (CollectLimit grows partitions
#: geometrically), never a full count of the corpus.
EXACT_TIER_MAX_ROWS = 10_000_000

#: probe cache (round 13, ADVICE r12 item 3): the guard's
#: threshold-bounded CollectLimit probe is an eager Spark job, and a
#: search_request with several exact agg nodes would otherwise probe
#: the SAME restricted plan once per node.  Keyed by the analyzed
#: plan's semantic hash + the threshold, so semantically-equal plans
#: (including the same DataFrame object reused across agg nodes) probe
#: once per process.  This is a foot-gun guard, not a semantics gate:
#: if the data under an identical plan grows past the threshold later
#: in the process, the cached verdict stands — callers who need a
#: fresh probe clear the cache or pass max_exact_rows explicitly.
_GUARD_PROBE_CACHE: dict[tuple[int, int], bool] = {}
_GUARD_PROBE_CACHE_MAX = 512


def _guard_exact_tier(
    df: DataFrame, what: str, max_exact_rows: int | None
) -> None:
    if max_exact_rows is None:
        return
    try:
        key = (df.semanticHash(), max_exact_rows)
    except Exception:  # pragma: no cover - connect-mode / analysis edge
        key = None
    if key is not None and key in _GUARD_PROBE_CACHE:
        exceeds = _GUARD_PROBE_CACHE[key]
    else:
        exceeds = df.limit(max_exact_rows + 1).count() > max_exact_rows
        if key is not None:
            if len(_GUARD_PROBE_CACHE) >= _GUARD_PROBE_CACHE_MAX:
                _GUARD_PROBE_CACHE.clear()
            _GUARD_PROBE_CACHE[key] = exceeds
    if exceeds:
        raise ValueError(
            f"exact {what} over more than {max_exact_rows:,} input rows "
            "is the oracle tier, not a serving plan (it buffers group "
            "values / shuffles distinct values); pass exact=False for "
            "the bounded-memory GK / HLL++ tier, or raise "
            "max_exact_rows deliberately"
        )


def extended_stats(
    df: DataFrame,
    value_col: str,
    *,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """ES ``extended_stats``: count / min / max / sum / avg /
    sum_of_squares / variance / std_deviation per bucket (POPULATION
    variance, the ES default).  NULL values are ignored (count counts
    non-null values, the SQL and ES convention); doubles rounded to 6.
    """
    v = F.col(value_col).cast("double")
    return _grouped(df, by).agg(
        F.count(v).alias("n"),
        F.round(F.min(v), 6).alias("min_v"),
        F.round(F.max(v), 6).alias("max_v"),
        F.round(F.sum(v), 6).alias("sum_v"),
        F.round(F.avg(v), 6).alias("avg_v"),
        F.round(F.sum(v * v), 6).alias("sum_sq"),
        F.round(F.var_pop(v), 6).alias("variance"),
        F.round(F.stddev_pop(v), 6).alias("std_dev"),
    )


def percentiles(
    df: DataFrame,
    value_col: str,
    percents: Sequence[float] = (50.0, 90.0, 99.0),
    *,
    by: Sequence[str] | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
    max_exact_rows: int | None = EXACT_TIER_MAX_ROWS,
) -> DataFrame:
    """ES ``percentiles``: one ``p<N>`` column per requested percent.

    ``exact=True`` uses the exact aggregate with linear interpolation
    (DuckDB ``quantile_cont`` semantics — the oracle tier; it buffers
    the group's values, so it is NOT the 100 TB plan and REFUSES above
    ``max_exact_rows`` input rows — VERDICT r11 item 6; ``None``
    disables the guard).  ``exact=False`` is ``percentile_approx``
    (Greenwald-Khanna): bounded memory, mergeable partials, error ≤
    1/``accuracy`` of the rank — the serving tier, tested against the
    exact one.
    """
    if not percents:
        raise ValueError("percents must be non-empty")
    for p in percents:
        if not 0.0 <= p <= 100.0:
            raise ValueError(f"percent {p} outside [0, 100]")
    if exact:
        _guard_exact_tier(df, "percentiles", max_exact_rows)
    v = F.col(value_col).cast("double")
    aggs = []
    for p in percents:
        frac = F.lit(float(p) / 100.0)
        expr = (
            F.percentile(v, frac)
            if exact
            else F.percentile_approx(v, frac, F.lit(int(accuracy)))
        )
        name = ("p%g" % p).replace(".", "_")
        aggs.append(F.round(expr, 6).alias(name))
    return _grouped(df, by).agg(*aggs)


def cardinality(
    df: DataFrame,
    value_col: str,
    *,
    by: Sequence[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
    max_exact_rows: int | None = EXACT_TIER_MAX_ROWS,
) -> DataFrame:
    """ES ``cardinality``: distinct count of ``value_col`` per bucket.

    ``exact=True`` is ``count_distinct`` (the oracle tier — shuffles
    the distinct values; REFUSES above ``max_exact_rows`` input rows,
    VERDICT r11 item 6, ``None`` disables); ``exact=False`` is
    HyperLogLog++ (``approx_count_distinct``, relative standard
    deviation ``rsd``): O(1) memory per group, one pass, mergeable —
    the only cardinality plan that survives 100 TB of
    high-cardinality keys.
    """
    if exact:
        _guard_exact_tier(df, "cardinality", max_exact_rows)
    v = F.col(value_col)
    expr = (
        F.count_distinct(v)
        if exact
        else F.approx_count_distinct(v, rsd)
    )
    return _grouped(df, by).agg(expr.alias("n_distinct"))


def top_hits(
    df: DataFrame,
    k: int,
    sort_col: str,
    *,
    by: Sequence[str],
    tie_col: str,
    ascending: bool = False,
) -> DataFrame:
    """ES ``top_hits``: the per-bucket top-``k`` rows by ``sort_col``
    (``ascending=False`` = largest first), ties broken on ``tie_col``
    ascending (the repo's determinism convention — without a total
    order the "top" rows are not SQL-replayable).  Output keeps every
    input column plus a per-bucket ``rank``.

    Scale: the window partitions on the bucket columns — the same
    shuffle a groupBy on them pays — and the partial top-k
    (WindowGroupLimit) truncates each partition to ``k`` rows before
    the exchange, the ``merge_topk`` discipline.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not by:
        raise ValueError(
            "top_hits requires bucket columns; for a global top-k use "
            "the ranked-leg operators"
        )
    key = F.col(sort_col).asc() if ascending else F.col(sort_col).desc()
    w = Window.partitionBy(*by).orderBy(key, F.col(tie_col).asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def boxplot(
    df: DataFrame,
    value_col: str,
    *,
    by: Sequence[str] | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
    max_exact_rows: int | None = EXACT_TIER_MAX_ROWS,
) -> DataFrame:
    """ES ``boxplot``: min / q1 / q2 / q3 / max per bucket (round 13).
    Quartiles follow the same two-tier convention as
    :func:`percentiles` — ``exact=True`` is linear-interpolated
    (DuckDB ``quantile_cont``, the oracle tier; guarded above
    ``max_exact_rows``), ``exact=False`` is the GK sketch.  One hash
    aggregate; NULLs ignored."""
    if exact:
        _guard_exact_tier(df, "boxplot", max_exact_rows)
    v = F.col(value_col).cast("double")

    def q(frac: float):
        return (
            F.percentile(v, F.lit(frac))
            if exact
            else F.percentile_approx(v, F.lit(frac), F.lit(int(accuracy)))
        )

    return _grouped(df, by).agg(
        F.round(F.min(v), 6).alias("min_v"),
        F.round(q(0.25), 6).alias("q1"),
        F.round(q(0.5), 6).alias("q2"),
        F.round(q(0.75), 6).alias("q3"),
        F.round(F.max(v), 6).alias("max_v"),
    )


def weighted_avg(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    *,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """ES ``weighted_avg``: ``Σ v·w / Σ w`` per bucket (round 13).
    Rows with a NULL value OR a NULL weight are excluded entirely (the
    ES skip-missing default — excluding only one side would corrupt
    the ratio).  One hash aggregate, map-side combine."""
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    both = F.when(v.isNotNull() & w.isNotNull(), F.lit(1))
    return _grouped(df, by).agg(
        F.round(
            F.sum(F.when(both.isNotNull(), v * w))
            / F.sum(F.when(both.isNotNull(), w)),
            6,
        ).alias("value")
    )


def percentile_ranks(
    df: DataFrame,
    value_col: str,
    values: Sequence[float],
    *,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """ES ``percentile_ranks``: the inverse of :func:`percentiles` —
    for each requested value, the PERCENTAGE of observations ≤ it
    (round 13).  Exact by definition (a counting ratio, no
    interpolation ambiguity — ES's tdigest approximates this same
    quantity), so it is its own oracle tier: one hash aggregate with
    one conditional count per requested value.  NULLs ignored."""
    if not values:
        raise ValueError("values must be non-empty")
    v = F.col(value_col).cast("double")
    aggs = []
    for x in values:
        name = ("r%g" % float(x)).replace(".", "_").replace("-", "m")
        aggs.append(
            F.round(
                F.lit(100.0)
                * F.count(F.when(v <= float(x), F.lit(1)))
                / F.count(v),
                6,
            ).alias(name)
        )
    return _grouped(df, by).agg(*aggs)


_INTERVALS = ("hour", "day", "week", "month", "quarter", "year")


def date_histogram(
    df: DataFrame,
    ts_col: str,
    *,
    interval: str = "day",
    by: Sequence[str] | None = None,
    value_col: str | None = None,
    extra_aggs=None,
) -> DataFrame:
    """ES ``date_histogram`` with CALENDAR intervals — per-bucket
    ``(bucket, n[, sum_v])`` where ``bucket`` is the interval start
    (``date_trunc`` semantics: weeks start Monday, the ES/ISO
    convention — identical in DuckDB, which is what keeps the oracle
    exact).  Buckets with no rows are absent (min_doc_count=1, the
    same convention as ``facets.histogram_facet``; the fixed-interval
    numeric form lives there).  ``value_col`` adds the classic sum
    sub-aggregation.

    Scale: one hash aggregate keyed on (bucket, by) — map-side
    partial combine, exchange carries bucket cardinality only.

    ``extra_aggs`` (round 12): pre-aliased aggregate Columns computed
    per bucket in the SAME hash aggregate — ES sub-aggregations cost
    no extra shuffle.
    """
    if interval not in _INTERVALS:
        raise ValueError(f"interval must be one of {_INTERVALS}")
    b = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    keys = [*(by or ()), b]
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("double")), 6).alias("sum_v")
        )
    aggs.extend(extra_aggs or ())
    return df.groupBy(*keys).agg(*aggs)


def pipeline_aggs(
    series: DataFrame,
    value_col: str,
    *,
    order_col: str,
    by: Sequence[str] | None = None,
    window: int = 3,
) -> DataFrame:
    """ES pipeline aggregations over an already-bucketed series:
    ``cumulative_sum``, ``derivative`` (bucket-over-bucket delta;
    NULL for each partition's first bucket, the ES contract), and a
    trailing ``moving_avg`` over the last ``window`` buckets
    (including the current one).  Output keeps every input column
    plus ``cum_sum`` / ``deriv`` / ``moving_avg`` (rounded to 6).

    The input is a BUCKETED series (e.g. :func:`date_histogram`'s
    output) — buckets-per-partition is bounded by the time range, not
    the corpus, so the unavoidable ordered windows run over tiny
    partitions.  ``by`` partitions the windows (the repo's
    no-unpartitioned-windows lock applies: omit ``by`` only for a
    single global series, which is one partition by construction —
    pass at least one bucket key when the series is per-entity).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    v = F.col(value_col).cast("double")
    base = Window.partitionBy(*(by or ())).orderBy(F.col(order_col).asc())
    return (
        series.withColumn(
            "cum_sum",
            F.round(
                F.sum(v).over(base.rowsBetween(Window.unboundedPreceding, 0)),
                6,
            ),
        )
        .withColumn("deriv", F.round(v - F.lag(v, 1).over(base), 6))
        .withColumn(
            "moving_avg",
            F.round(
                F.avg(v).over(base.rowsBetween(-(window - 1), 0)), 6
            ),
        )
    )


def composite_buckets(
    df: DataFrame,
    keys: Sequence[str],
    size: int,
    *,
    after: Sequence | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation: the first ``size`` group-by
    buckets in ascending key order, resuming STRICTLY AFTER the
    ``after`` key tuple — stateless bucket pagination, the aggregation
    analog of ``search_after`` (ES built composite precisely because
    ``terms`` aggs cannot page deterministically).  Output is the key
    columns + ``n`` (+ ``sum_v`` with ``value_col``); feed the last
    row's key tuple back as ``after`` for the next page.  Rows with a
    NULL key are skipped (``missing_bucket: false``, the ES default).

    Scale: the cursor predicate is applied to the RAW rows BELOW the
    aggregate (a map-side lexicographic filter Catalyst can push into
    the scan), so page N aggregates only the keys past the cursor —
    the same page-N-costs-page-1 property ``search_after`` gives
    hits.  The final ascending sort + limit runs over bucket
    cardinality, not rows.
    """
    if size < 1:
        raise ValueError("size must be >= 1")
    if not keys:
        raise ValueError("composite requires at least one key column")
    if after is not None and len(after) != len(keys):
        raise ValueError("after must have one value per key")
    out = df
    for c in keys:
        out = out.filter(F.col(c).isNotNull())
    if after is not None:
        # lexicographic strictly-greater: (k1 > a1) OR (k1 = a1 AND
        # (k2 > a2 OR ...)) — composed innermost-first
        pred = F.lit(False)
        for c, a in reversed(list(zip(keys, after))):
            pred = (F.col(c) > F.lit(a)) | (
                (F.col(c) == F.lit(a)) & pred
            )
        out = out.filter(pred)
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("double")), 6).alias("sum_v")
        )
    return (
        out.groupBy(*keys)
        .agg(*aggs)
        .orderBy(*[F.col(c).asc() for c in keys])
        .limit(size)
    )


def matrix_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """ES ``matrix_stats`` for a field pair: per bucket the pairwise
    row count (rows where BOTH fields are non-null — the SQL
    covariance convention), means, population covariance, and Pearson
    correlation.  One hash aggregate; doubles rounded to 6."""
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    both = df.filter(a.isNotNull() & b.isNotNull())
    return _grouped(both, by).agg(
        F.count("*").alias("n"),
        F.round(F.avg(a), 6).alias("mean_a"),
        F.round(F.avg(b), 6).alias("mean_b"),
        F.round(F.covar_pop(a, b), 6).alias("covariance"),
        F.round(F.corr(a, b), 6).alias("correlation"),
    )
