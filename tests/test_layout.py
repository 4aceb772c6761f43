"""Z-order layout (operators/layout.py): multi-column data skipping.

The metric is physical: how many parquet row groups a min/max
statistics-pruning scan must read under each layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_search_system_spark.operators.layout import (
    rowgroups_matching,
    zorder_key,
    zorder_write,
)
from distributed_vector_search_system_spark.tables import load_table


def test_zorder_key_is_monotone_in_each_dim(spark):
    """Fixing one coordinate, the key must grow with the other — the
    defining locality property of the Morton curve."""
    df = spark.range(8).select(
        F.col("id").alias("x"), F.lit(3).alias("y")
    )
    keys = [
        r.k
        for r in df.select(
            zorder_key(["x", "y"], [(0, 7), (0, 7)], bits=3).alias("k")
        ).orderBy("x").collect()
    ]
    assert keys == sorted(keys)
    assert len(set(keys)) == 8


def test_zorder_key_rejects_overflowing_bit_budget(spark):
    """ADVICE r02: bits*cols > 63 would shiftleft past the long width
    (JVM wraps mod 64 → silently corrupted key) — must raise instead."""
    import pytest

    cols = ["a", "b", "c", "d"]
    ranges = [(0, 1)] * 4
    with pytest.raises(ValueError, match="63"):
        zorder_key(cols, ranges, bits=16)
    # 15 bits × 4 cols = 60 ≤ 63 still fine
    zorder_key(cols, ranges, bits=15)


def test_zorder_skips_on_both_columns(spark, sf_oracle, tmp_path):
    """events written sorted-by-event_id vs Z-ordered on
    (user_id, event_id), 16 files each.  A user_id range predicate must
    prune far better under Z-order; an event_id predicate must still
    prune (the curve trades a little leading-column locality for a lot
    of second-column locality)."""
    ev = load_table(spark, sf_oracle, "events").select("event_id", "user_id", "ts")
    stats = ev.agg(
        F.min("event_id"), F.max("event_id"), F.min("user_id"), F.max("user_id")
    ).first()
    e_lo, e_hi, u_lo, u_hi = stats

    linear = str(tmp_path / "linear")
    (
        ev.repartitionByRange(16, "event_id")
        .sortWithinPartitions("event_id")
        .write.parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(
        ev, zpath, ["user_id", "event_id"], [(u_lo, u_hi), (e_lo, e_hi)], num_files=16
    )

    def windows(lo, hi, n=8):
        """n disjoint probe ranges, each 1/16 of the value span."""
        span = hi - lo
        w = max(span // 16, 1)
        return [(lo + (2 * i) * span // 16, lo + (2 * i) * span // 16 + w) for i in range(n)]

    # averaged over many probe windows (single windows can straddle a
    # curve boundary): the event_id-sorted layout reads EVERY group for
    # user_id predicates; Z-order must cut that by ≥ 40% while keeping
    # ≥ 40% skipping on event_id predicates too
    lin_u = z_u = z_e = lin_tot_sum = 0
    for q in windows(u_lo, u_hi):
        m, t = rowgroups_matching(linear, "user_id", *q)
        lin_u += m
        lin_tot_sum += t
        m, _ = rowgroups_matching(zpath, "user_id", *q)
        z_u += m
    for q in windows(e_lo, e_hi):
        m, _ = rowgroups_matching(zpath, "event_id", *q)
        z_e += m
    assert lin_u == lin_tot_sum  # no skipping at all on the 2nd column
    assert z_u <= lin_u * 0.6, (z_u, lin_u)
    assert z_e <= lin_tot_sum * 0.6, (z_e, lin_tot_sum)

    # the layout changes IO, never results
    u_q = windows(u_lo, u_hi)[1]
    got = spark.read.parquet(zpath).filter(
        (F.col("user_id") >= u_q[0]) & (F.col("user_id") <= u_q[1])
    ).count()
    want = ev.filter(
        (F.col("user_id") >= u_q[0]) & (F.col("user_id") <= u_q[1])
    ).count()
    assert got == want
