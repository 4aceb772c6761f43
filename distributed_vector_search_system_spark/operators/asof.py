"""As-of and range joins composed from built-in operators.

The reference has no general joins (SURVEY.md §2.7) — these are part of
the relational surface our engine adds.  Spark lacks a native as-of join;
the composition below is inequality-join + per-left-row top-1, which
Catalyst executes as a broadcast/shuffle join followed by a
WindowGroupLimit-optimized row_number — no Python in the loop.

Scale note: an as-of join where the right side is large should pre-bucket
both sides by the equality key so the inequality part stays within
co-located partitions; with AQE the skewed keys split automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    left_key: str | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' = earliest
    right row with ``right_ts >= left_ts``), matching on the equality key
    ``on``.  Unmatched left rows are kept (left outer semantics).

    ``left_key`` must uniquely identify left rows (defaults to all left
    columns via a synthetic id when absent).
    """
    lkey = left_key
    if lkey is None:
        left = left.withColumn("_asof_lid", F.monotonically_increasing_id())
        lkey = "_asof_lid"

    r = right.select(
        F.col(on).alias("_asof_on"),
        F.col(right_ts).alias(f"{right_prefix}{right_ts}"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    rts = F.col(f"{right_prefix}{right_ts}")
    lts = F.col(left_ts)
    if direction == "backward":
        cond = (F.col(on) == F.col("_asof_on")) & (rts <= lts)
        order = [rts.desc()]
    elif direction == "forward":
        cond = (F.col(on) == F.col("_asof_on")) & (rts >= lts)
        order = [rts.asc()]
    else:
        raise ValueError(f"unknown direction: {direction}")
    if tolerance_seconds is not None:
        tol = F.lit(tolerance_seconds)
        gap = F.abs(lts.cast("double") - rts.cast("double"))
        cond = cond & (gap <= tol)

    joined = left.join(r, on=cond, how="left")
    rn = F.row_number().over(Window.partitionBy(lkey).orderBy(*order))
    out = joined.withColumn("_asof_rn", rn).filter(F.col("_asof_rn") == 1)
    drop = ["_asof_rn", "_asof_on"] + (["_asof_lid"] if left_key is None else [])
    return out.drop(*drop)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_point: str,
    right_lo: str,
    right_hi: str,
    extra_cond=None,
) -> DataFrame:
    """Point-in-interval join: ``right_lo <= left_point < right_hi``.

    At scale, bucket the point into interval-width bins on both sides
    first so the join has an equality component; here we express the
    plain inequality form and let Catalyst/AQE handle it.
    """
    cond = (F.col(right_lo) <= F.col(left_point)) & (F.col(left_point) < F.col(right_hi))
    if extra_cond is not None:
        cond = cond & extra_cond
    return left.join(right, on=cond, how="inner")
