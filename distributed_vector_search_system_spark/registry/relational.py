"""Relational query surface (SURVEY.md §2.7 gap table).

The reference implements no general relational operators; Spark SQL
provides them all.  Each entry exercises one capability family — joins
(inner/anti/semi/as-of/range), hash aggregation, grouping sets/rollup/
cube, window functions with frames, set ops, scalar function libraries
(string / date / math / json / array), sessionization — against the
TPC-H-ish fixtures, with a DuckDB oracle.

Two tiers (VERDICT r01 item 1 — the driver verifies only the first 50
registry entries, and the LLM surface must fit inside that window):

- ``QUERIES``/``ORACLES``: the driver-verified tier.  Near-duplicate
  entries from round 1 are merged (anti+semi, the window variants, the
  grouping variants, stats+percentiles, tumbling+sliding) so every
  capability family keeps a driver row.
- ``EXTRA_QUERIES``/``EXTRA_ORACLES``: additional coverage checked by
  the repo's own mirror harness (tests/test_oracle_parity.py) with the
  identical DuckDB comparison, just not by the external driver.

Cross-engine float discipline: money sums go through DECIMAL(18,2)
(exact, bit-identical), double averages are rounded, timestamps are
rendered as formatted strings, and integer SUMs are CAST to BIGINT on
the DuckDB side (DuckDB sums integers into HUGEINT, which pandas turns
into float64 — CORRECTNESS_r01 rel_json_events/rel_pivot_status).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..tables import load_table, register_temp_views


def _sql(query: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_temp_views(spark, sf_dir)
        return spark.sql(query)

    return run


# money-exact decimal sum rendered back as double (identical both engines)
_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
)

# ---------------------------------------------------------------------------
# pricing summary (TPC-H Q1 family): wide hash aggregation

_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  {rev} AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
           * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  ROUND(AVG(l_quantity), 4) AS avg_qty,
  ROUND(AVG(l_extendedprice), 4) AS avg_price,
  ROUND(AVG(l_discount), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".format(rev=_REV)

# revenue per order for one segment (TPC-H Q3 family): 3-way join + HAVING

_REVENUE_BY_ORDER_SQL = """
SELECT o.o_orderkey, {rev} AS revenue, o.o_orderpriority
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderpriority
HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) > 100000
""".format(rev=_REV)
# ^ fact-first like _REVENUE_BY_REGION_SQL (round 14): written
# customer-first, the planner broadcast the whole lineitem projection as
# the last join's build side; lineitem now streams.

# revenue per region (TPC-H Q5 family): 5-way join through the dim chain

_REVENUE_BY_REGION_SQL = """
SELECT r.r_name, {rev} AS revenue, COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
""".format(rev=_REV)
# ^ fact-first join order (round 14, guide §3.1): written dimension-first
# (region → … → lineitem), Catalyst kept the left-deep tree and made the
# FACT table the broadcast build side of the last join — a hash relation
# over every lineitem row (the one table that cannot fit at 100 TB; plan
# showed BroadcastExchange over l_orderkey+l_extendedprice+l_discount)
# probed by orders.  Fact-first, each JOIN's right side is a dimension:
# lineitem STREAMS through four broadcast joins and nothing fact-sized
# is ever built or shuffled before the final aggregate.  Inner-join
# order is semantics-free, so the shared oracle string reorders with it
# (DuckDB replans it independently; results hash-identical).

# nation-pair shipping volume (TPC-H Q7 family): 6-way join with two
# roles of the same dim table + year extraction

_NATION_VOLUME_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
  {rev} AS volume, COUNT(*) AS n_items
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
""".format(rev=_REV)

# disjunctive range predicates (TPC-H Q19 family): OR of ANDed ranges —
# Catalyst pushes the common-factor predicates and prunes columns

_OR_RANGES_SQL = """
SELECT COUNT(*) AS n_items, {rev} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
   OR (l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
""".format(rev=_REV)

# anti-join + semi-join, one tagged entry (merged round-1
# rel_customers_without_orders + rel_suppliers_semi)

_ANTI_SEMI_SQL = """
SELECT 'no_orders' AS family, c_custkey AS entity_key, c_name AS entity_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'building_nation_supplier', s_suppkey, s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_nationkey = s.s_nationkey AND c.c_mktsegment = 'BUILDING')
"""

# window suite over one pass of orders (merged round-1 rel_running_total
# + rel_window_nav, plus a numeric RANGE frame): cumulative frame, lag
# arithmetic, ntile, first/last/lead navigation, value-distance frame

_WINDOW_SUITE_SQL_SPARK = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
  DATEDIFF(o_orderdate, LAG(o_orderdate) OVER w) AS days_since_prev,
  CAST(NTILE(4) OVER w AS INT) AS quartile,
  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_ok,
  LEAD(o_orderkey) OVER w AS next_ok,
  CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT)
       AS n_price_within_1k
FROM orders WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

_WINDOW_SUITE_SQL_DUCK = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
  CAST(DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS INT)
       AS days_since_prev,
  CAST(NTILE(4) OVER w AS INT) AS quartile,
  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_ok,
  LEAD(o_orderkey) OVER w AS next_ok,
  CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT)
       AS n_price_within_1k
FROM orders WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

# rollup + cube + grouping sets in one tagged entry (merged round-1
# rel_rollup_sales + rel_cube_orders + rel_grouping_sets) — all three
# multi-grouping operators, each with GROUPING() flags

_GROUPING_OPS_SQL = """
SELECT 'rollup' AS op,
       COALESCE(l_returnflag, 'ALL') AS k1,
       COALESCE(l_linestatus, 'ALL') AS k2,
       CAST(GROUPING(l_returnflag) AS INT) AS g1,
       CAST(GROUPING(l_linestatus) AS INT) AS g2,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube',
       COALESCE(o_orderstatus, 'ALL'),
       COALESCE(o_orderpriority, 'ALL'),
       CAST(GROUPING(o_orderstatus) AS INT),
       CAST(GROUPING(o_orderpriority) AS INT),
       COUNT(*),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets',
       COALESCE(l_returnflag, 'ALL'),
       COALESCE(o_orderpriority, 'ALL'),
       CAST(GROUPING(l_returnflag) AS INT),
       CAST(GROUPING(o_orderpriority) AS INT),
       COUNT(*),
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY GROUPING SETS ((l_returnflag), (o_orderpriority), (l_returnflag, o_orderpriority))
"""

# set operations (explicit parens; custkey domain)

_SETOPS_SQL = """
(
  (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   INTERSECT
   SELECT o_custkey FROM orders)
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY' AND c_acctbal < 0
"""

# scalar string/math functions (dialects differ only in the string cast)

_SCALAR_SQL = """
SELECT p_partkey,
  UPPER(p_brand) AS ubrand,
  LOWER(SUBSTR(p_name, 1, 8)) AS name8,
  LENGTH(p_name) AS name_len,
  CONCAT_WS('-', p_brand, p_type) AS brand_type,
  REPLACE(p_name, ' ', '_') AS name_us,
  REVERSE(p_brand) AS rbrand,
  LPAD(CAST(p_size AS {str_t}), 3, '0') AS size3,
  CAST(INSTR(p_name, 'a') AS INT) AS first_a,
  ROUND(p_retailprice * 0.9, 2) AS sale_price,
  ABS(p_size - 25) AS size_dist,
  CAST(p_size % 7 AS INT) AS size_mod,
  CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_class
FROM part WHERE p_partkey < 150
"""

_SCALAR_SQL_SPARK = _SCALAR_SQL.format(str_t="STRING")
_SCALAR_SQL_DUCK = _SCALAR_SQL.format(str_t="VARCHAR")

# date functions (Spark vs DuckDB dialects differ)

_DATE_SQL_SPARK = """
SELECT o_orderkey,
  YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mon, DAY(o_orderdate) AS dom,
  QUARTER(o_orderdate) AS qtr,
  DATE_FORMAT(DATE_TRUNC('month', o_orderdate), 'yyyy-MM-dd') AS month_start,
  DATEDIFF(o_orderdate, TIMESTAMP '1995-01-01 00:00:00') AS days_since_95,
  DATE_FORMAT(o_orderdate, 'yyyy-MM-dd') AS iso_date
FROM orders WHERE o_orderkey < 200
"""

_DATE_SQL_DUCK = """
SELECT o_orderkey,
  CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mon,
  CAST(DAY(o_orderdate) AS INT) AS dom,
  CAST(QUARTER(o_orderdate) AS INT) AS qtr,
  STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
  CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_95,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_date
FROM orders WHERE o_orderkey < 200
"""

# array construction + higher-order lambda functions.  Array outputs are
# serialized to CSV strings on BOTH sides — the driver's canonicalizer
# cannot hash array columns (CORRECTNESS_r01 rel_array_funcs TypeError);
# the element values are still compared in full through the join.

_ARRAY_SQL_SPARK = """
SELECT p_partkey,
  SIZE(SPLIT(p_name, ' ')) AS n_tokens,
  CONCAT_WS(',', ARRAY_SORT(SPLIT(p_name, ' '))) AS tokens_sorted_csv,
  CONCAT_WS(',', TRANSFORM(SPLIT(p_name, ' '), t -> CAST(LENGTH(t) AS STRING)))
    AS token_lens_csv,
  CONCAT_WS(',', FILTER(SPLIT(p_name, ' '), t -> LENGTH(t) > 4)) AS long_tokens_csv,
  ARRAY_CONTAINS(SPLIT(p_name, ' '), 'red') AS has_red
FROM part WHERE p_partkey < 100
"""

_ARRAY_SQL_DUCK = """
SELECT p_partkey,
  CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS n_tokens,
  COALESCE(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(p_name, ' ')), ','), '')
    AS tokens_sorted_csv,
  COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(STRING_SPLIT(p_name, ' '),
                                          t -> CAST(LENGTH(t) AS VARCHAR)), ','), '')
    AS token_lens_csv,
  -- empty list serializes to '' on both sides (DuckDB array_to_string
  -- yields NULL for an empty filter result; Spark concat_ws yields '')
  COALESCE(ARRAY_TO_STRING(LIST_FILTER(STRING_SPLIT(p_name, ' '),
                                       t -> LENGTH(t) > 4), ','), '')
    AS long_tokens_csv,
  LIST_CONTAINS(STRING_SPLIT(p_name, ' '), 'red') AS has_red
FROM part WHERE p_partkey < 100
"""

# ordered string aggregation

_STRAGG_SQL_SPARK = """
SELECT n.n_name,
  CONCAT_WS(',', ARRAY_SORT(COLLECT_LIST(s.s_name))) AS supplier_names,
  COUNT(*) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

_STRAGG_SQL_DUCK = """
SELECT n.n_name,
  STRING_AGG(s.s_name, ',' ORDER BY s.s_name) AS supplier_names,
  COUNT(*) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

# distinct aggregates

_DISTINCT_SQL = """
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps,
  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_distinct_qty,
  COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""

# JSON extraction over events.props.  DuckDB side: CAST(SUM(int) AS
# BIGINT) — SUM over integers yields HUGEINT, which pandas converts to
# float64 and the driver hashes `5.0` vs Spark's `5`.

_JSON_SQL_SPARK = """
SELECT event_type,
  COUNT(*) AS n_events,
  SUM(CAST(GET_JSON_OBJECT(props, '$.k') AS INT)) AS sum_k,
  ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY event_type
"""

_JSON_SQL_DUCK = """
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY event_type
"""

# statistical aggregates + exact interpolated percentiles over one pass
# (merged round-1 rel_stats_agg + rel_percentiles; Spark PERCENTILE ≡
# DuckDB QUANTILE_CONT)

_STATS_BODY = """
  ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
  ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
  ROUND(VAR_SAMP(l_discount), 8) AS var_disc,
  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qp,
  ROUND(MIN(l_extendedprice), 2) AS min_price,
  ROUND(MAX(l_extendedprice), 2) AS max_price,
"""

_STATS_PCTL_SQL_SPARK = f"""
SELECT l_returnflag,
{_STATS_BODY}
  ROUND(PERCENTILE(l_quantity, 0.25), 4) AS q25,
  ROUND(PERCENTILE(l_quantity, 0.50), 4) AS q50,
  ROUND(PERCENTILE(l_quantity, 0.75), 4) AS q75,
  ROUND(PERCENTILE(l_quantity, 0.99), 4) AS q99
FROM lineitem GROUP BY l_returnflag
"""

_STATS_PCTL_SQL_DUCK = f"""
SELECT l_returnflag,
{_STATS_BODY}
  ROUND(QUANTILE_CONT(l_quantity, 0.25), 4) AS q25,
  ROUND(QUANTILE_CONT(l_quantity, 0.50), 4) AS q50,
  ROUND(QUANTILE_CONT(l_quantity, 0.75), 4) AS q75,
  ROUND(QUANTILE_CONT(l_quantity, 0.99), 4) AS q99
FROM lineitem GROUP BY l_returnflag
"""

# correlated scalar subquery (TPC-H Q17 family) — Catalyst decorrelates
# into an aggregate + join; per-partkey average threshold

_SMALL_LOTS_SQL = """
SELECT p.p_brand, COUNT(*) AS n_small_lots,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
"""

# pivot: priority × status counts.  Spark side uses DataFrame .pivot();
# oracle is the explicit conditional-aggregation expansion (SUM(int)
# CAST to BIGINT — same HUGEINT pitfall as the json query).

_PIVOT_STATUSES = ["F", "O", "P"]


def q_rel_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _PIVOT_STATUSES)
        .count()
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _PIVOT_STATUSES],
    )


_PIVOT_SQL_DUCK = """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority
"""

# range filter + projection (reference R3 EntriesFrom, raft_log.cc:64-73)

_RANGE_FILTER_SQL = """
SELECT event_id, event_type, user_id FROM events
WHERE event_id >= 900 AND event_type IN ('purchase', 'error')
"""


# as-of join implemented with the library operator (DataFrame API side)

def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        left_key="event_id", right_prefix="click_",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


_ASOF_SQL_DUCK = """
SELECT p.event_id, p.user_id,
  STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


# point-in-interval range join against an inline quantity-band table

_RANGE_JOIN_SQL = """
SELECT b.band, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem l
JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 20.0, 'mid'), (20.0, 60.0, 'high'))
     AS b(lo, hi, band)
  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY b.band
"""


def q_rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result via the library range_join operator (DataFrame API)."""
    from ..operators.asof import range_join

    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 20.0, "mid"), (20.0, 60.0, "high")],
        "lo double, hi double, band string",
    )
    joined = range_join(li, F.broadcast(bands), left_point="l_quantity",
                        right_lo="lo", right_hi="hi")
    return joined.groupBy("band").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


# windowed event aggregation, one tagged entry (merged round-1
# rel_events_tumbling + rel_events_sliding), built on the NATIVE
# window() operator — the batch twin of the streaming plan

def q_rel_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import sliding_window_agg, tumbling_window_agg

    ev = load_table(spark, sf_dir, "events")
    tumbling = tumbling_window_agg(ev, window_duration="1 hour").select(
        F.lit("tumbling").alias("kind"),
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )
    sliding = sliding_window_agg(
        ev, window_duration="1 hour", slide_duration="30 minutes"
    ).select(
        F.lit("sliding").alias("kind"),
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.lit("ALL").alias("event_type"),
        "n_events",
        F.lit(None).cast("double").alias("sum_value"),
    )
    return tumbling.unionByName(sliding)


_EVENTS_WINDOWS_SQL_DUCK = """
SELECT 'tumbling' AS kind,
       STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'sliding',
       STRFTIME(time_bucket(INTERVAL 30 MINUTE, ts) - TO_MINUTES(30 * k.i),
                '%Y-%m-%d %H:%M:%S'),
       'ALL', COUNT(*), CAST(NULL AS DOUBLE)
FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i) k
GROUP BY 2
"""


# ---------------------------------------------------------------------------
# driver-verified tier: one entry per capability family.  Round-5
# rotation (the VERDICT r04 item-2 policy, applied to this round's
# flagships): `rel_setops` / `rel_string_agg` / `rel_small_lots_subquery`
# demoted to the pytest tier (identical DuckDB check retained below) to
# make room for `bm25_topk` / `hybrid_rrf` / `ann_knn_join` in the
# 50-row driver window.  Round-6 rotation (VERDICT r05 items 4+5):
# `rel_grouping_ops` / `rel_array_funcs` demoted in exchange for
# `ivf_trained_topk` (the serving-quality trained-centroid tier) and
# `knn_filtered` (the filtered-ANN production contract).

# round-7 window: rel_revenue_by_region / rel_nation_volume /
# rel_anti_semi_join / rel_window_suite demoted to the pytest tier in
# exchange for the round-6 retrieval/cosine flagships (VERDICT r06
# item 2); identical DuckDB check either way via test_oracle_parity.py
QUERIES = {
    "rel_pricing_summary": _sql(_PRICING_SQL),
    "rel_range_filter": _sql(_RANGE_FILTER_SQL),
    "rel_asof_purchase_click": q_asof_purchase_click,
    "rel_events_windows": q_rel_events_windows,
}

ORACLES = {
    "rel_pricing_summary": _PRICING_SQL,
    "rel_range_filter": _RANGE_FILTER_SQL,
    "rel_asof_purchase_click": _ASOF_SQL_DUCK,
    "rel_events_windows": _EVENTS_WINDOWS_SQL_DUCK,
}


# ---------------------------------------------------------------------------
# pytest-only tier (beyond the driver's 50-query window; verified with
# the identical DuckDB comparison by tests/test_oracle_parity.py)

# window rank per group via the DataFrame API (same semantics as the
# SQL window suite; kept as the API-coverage twin)

_TOP3_SQL = """
SELECT * FROM (
  SELECT n.n_name, c.c_custkey, ROUND(c.c_acctbal, 2) AS acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name
                                 ORDER BY c.c_acctbal DESC, c.c_custkey) AS INT) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) WHERE rn <= 3
"""


def q_top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"),
                F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# IN-subquery with grouped HAVING (TPC-H Q18 family)

_BIG_ORDERS_SQL = """
SELECT c.c_name, o.o_orderkey,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey
                       HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
GROUP BY c.c_name, o.o_orderkey
"""
# ^ fact-first like _REVENUE_BY_REGION_SQL (round 14): lineitem streams;
# the two broadcasts that remain are the IN-subquery's post-HAVING
# orderkey set — keys only, aggregate-reduced, the legitimate semi-join
# reduction (TPC-H Q18's shape).

# conditional aggregation (TPC-H Q12 family)

_COND_AGG_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_count,
  COUNT(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY l_returnflag
"""

# sessionization: 30-minute inactivity gap (lag + cumulative flag)

_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM g GROUP BY user_id
"""

# ordered replay fold (R11 analog over events): last state per user

_REPLAY_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts, event_id,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
    COUNT(*)    OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       ROUND(value, 6) AS last_value, n_events
FROM ranked WHERE rn = 1
"""

# native session_window aggregation, oracle = SQL sessionization
# (session start = first event ts, end = last ts + gap)


def q_rel_events_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import session_window_agg

    ev = load_table(spark, sf_dir, "events")
    s = session_window_agg(ev, gap="30 minutes")
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        "sum_value",
    )


_SESSION_NATIVE_SQL_DUCK = """
WITH g AS (
  SELECT user_id, ts, value, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
)
SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM s GROUP BY user_id, sess
"""

# approximate distinct: HLL sketches differ across engines by design, so
# the oracle checks the EXACT distinct count while pytest bounds the
# approximation error (tests/test_plans.py)


def q_rel_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("n_items"),
    )


_APPROX_DISTINCT_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts, COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""

# global top-N: orderBy + limit → TakeOrderedAndProject (per-partition
# partial top-N, no full sort — the reference Q4 partial_sort, globally)

_GLOBAL_TOPN_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""

# self-join funnel: click → purchase by the same user within 1 hour
# (interval-bounded range join; at 100 TB this becomes a bucketed
# self-join on user_id with an AQE-handled time-range predicate)

_FUNNEL_SQL = """
SELECT c.user_id, COUNT(*) AS n_pairs
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 1 HOUR
GROUP BY c.user_id
"""

# salting must never change results: the salted two-phase aggregation is
# compared against the plain GROUP BY the oracle runs (operators/skew.py
# exists for hot keys where the single final reducer is the bottleneck)

def q_rel_skew_salted_agg(spark, sf_dir):
    from ..operators.skew import salted_agg
    from ..tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        "l_returnflag",
        {
            "n_items": "count:*",
            "total_qty": "sum:l_quantity",
            "max_price": "max:l_extendedprice",
        },
        buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("n_items").cast("long").alias("n_items"),
        F.round("total_qty", 4).alias("total_qty"),
        F.round("max_price", 4).alias("max_price"),
    )


_SKEW_AGG_SQL = """
SELECT l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  ROUND(SUM(l_quantity), 4) AS total_qty,
  ROUND(MAX(l_extendedprice), 4) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def q_rel_skew_salted_join(spark, sf_dir):
    """Salted fact×dim join (operators/skew.salted_join): the dim side is
    replicated across salt buckets so one hot key spreads over ``buckets``
    reducers.  Salting must be semantics-invisible — the oracle runs the
    PLAIN join + aggregate (VERDICT r02 item 8 / r03 item 6)."""
    from ..operators.skew import salted_join
    from ..tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(
        li, part, on="l_partkey", buckets=8,
        salt_source=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        # l_quantity is integer-valued (TPC-H 1..50), so the double sum
        # is exact regardless of summation order
        F.sum("l_quantity").alias("total_qty"),
    )


_SKEW_JOIN_SQL = """
SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
       SUM(l.l_quantity) AS total_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


EXTRA_QUERIES = {
    # demoted round 7 for hybrid_indexed_rrf / bm25_stream_topk /
    # bm25_filtered / bm25_index_topk (VERDICT r06 item 2)
    "rel_revenue_by_region": _sql(_REVENUE_BY_REGION_SQL),
    "rel_nation_volume": _sql(_NATION_VOLUME_SQL),
    "rel_anti_semi_join": _sql(_ANTI_SEMI_SQL),
    "rel_window_suite": _sql(_WINDOW_SUITE_SQL_SPARK),
    "rel_skew_salted_agg": q_rel_skew_salted_agg,
    "rel_skew_salted_join": q_rel_skew_salted_join,
    # thin single/few-row driver entries demoted in round 4 to free
    # window slots for ivf_persisted_topk / ann_recall / hash_sample
    # (VERDICT r03 items 3/4/6); identical DuckDB check either way via
    # tests/test_oracle_parity.py
    "rel_or_ranges": _sql(_OR_RANGES_SQL),
    "rel_distinct_aggs": _sql(_DISTINCT_SQL),
    "rel_stats_percentiles": _sql(_STATS_PCTL_SQL_SPARK),
    # thin rows demoted in round 5 to free window slots for the round-4
    # flagship tiers ann_pq_topk / ann_ivfpq_topk / ivf_stream_topk
    # (VERDICT r04 item 2); identical DuckDB check either way
    "rel_json_events": _sql(_JSON_SQL_SPARK),
    "rel_pivot_status": q_rel_pivot_status,
    "rel_range_join": q_rel_range_join,
    # demoted late round 5 for the round-5 flagships bm25_topk /
    # hybrid_rrf / ann_knn_join; identical DuckDB check either way
    "rel_setops": _sql(_SETOPS_SQL),
    "rel_string_agg": _sql(_STRAGG_SQL_SPARK),
    "rel_small_lots_subquery": _sql(_SMALL_LOTS_SQL),
    # demoted round 6 for ivf_trained_topk / knn_filtered (VERDICT r05
    # items 4+5); identical DuckDB check either way
    "rel_grouping_ops": _sql(_GROUPING_OPS_SQL),
    "rel_array_funcs": _sql(_ARRAY_SQL_SPARK),
    # scalar/date function enumerations: demoted from the driver tier in
    # round 2 to free window slots for the quantization and curation
    # surfaces (identical DuckDB check either way)
    "rel_scalar_funcs": _sql(_SCALAR_SQL_SPARK),
    "rel_date_funcs": _sql(_DATE_SQL_SPARK),
    "rel_revenue_by_order": _sql(_REVENUE_BY_ORDER_SQL),
    "rel_top3_customers_per_nation": q_top3_customers_per_nation,
    "rel_big_orders": _sql(_BIG_ORDERS_SQL),
    "rel_cond_agg": _sql(_COND_AGG_SQL),
    "rel_events_sessions": _sql(_SESSIONS_SQL),
    "rel_replay_fold": _sql(_REPLAY_SQL),
    "rel_events_session_native": q_rel_events_session_native,
    "rel_approx_distinct": q_rel_approx_distinct,
    "rel_global_topn": _sql(_GLOBAL_TOPN_SQL),
    "rel_click_purchase_funnel": _sql(_FUNNEL_SQL),
}

EXTRA_ORACLES = {
    "rel_revenue_by_region": _REVENUE_BY_REGION_SQL,
    "rel_nation_volume": _NATION_VOLUME_SQL,
    "rel_anti_semi_join": _ANTI_SEMI_SQL,
    "rel_window_suite": _WINDOW_SUITE_SQL_DUCK,
    "rel_skew_salted_agg": _SKEW_AGG_SQL,
    "rel_skew_salted_join": _SKEW_JOIN_SQL,
    "rel_or_ranges": _OR_RANGES_SQL,
    "rel_distinct_aggs": _DISTINCT_SQL,
    "rel_stats_percentiles": _STATS_PCTL_SQL_DUCK,
    "rel_json_events": _JSON_SQL_DUCK,
    "rel_pivot_status": _PIVOT_SQL_DUCK,
    "rel_range_join": _RANGE_JOIN_SQL,
    "rel_setops": _SETOPS_SQL,
    "rel_string_agg": _STRAGG_SQL_DUCK,
    "rel_small_lots_subquery": _SMALL_LOTS_SQL,
    "rel_grouping_ops": _GROUPING_OPS_SQL,
    "rel_array_funcs": _ARRAY_SQL_DUCK,
    "rel_scalar_funcs": _SCALAR_SQL_DUCK,
    "rel_date_funcs": _DATE_SQL_DUCK,
    "rel_revenue_by_order": _REVENUE_BY_ORDER_SQL,
    "rel_top3_customers_per_nation": _TOP3_SQL,
    "rel_big_orders": _BIG_ORDERS_SQL,
    "rel_cond_agg": _COND_AGG_SQL,
    "rel_events_sessions": _SESSIONS_SQL,
    "rel_replay_fold": _REPLAY_SQL,
    "rel_events_session_native": _SESSION_NATIVE_SQL_DUCK,
    "rel_approx_distinct": _APPROX_DISTINCT_SQL,
    "rel_global_topn": _GLOBAL_TOPN_SQL,
    "rel_click_purchase_funnel": _FUNNEL_SQL,
}


# round-8 rotation (VERDICT r07 item 2): two thin relational rows leave
# the driver window for the round-7 flagships (registry/llm.py);
# rel_pricing_summary (the relational flagship) and the as-of join (the
# custom operator Spark lacks natively) stay driver-verified.  The
# demoted rows keep the identical DuckDB comparison in this tier.
for _name in ("rel_range_filter", "rel_events_windows"):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    EXTRA_ORACLES[_name] = ORACLES.pop(_name)
del _name


# --- multi-level aggregation: ROLLUP (round 8) -------------------------------
# The OLAP cube family was the one classic relational query shape with
# no row: Spark's rollup() and DuckDB's GROUP BY ROLLUP share exact
# semantics (subtotal rows carry NULL group keys), and Catalyst plans
# it as ONE Expand + hash aggregate — no per-level re-scan.  grouping
# levels are disambiguated by the NULL pattern itself (the fixture's
# group keys are never null) plus an explicit level marker from
# grouping_id / GROUPING.

def q_rel_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("lvl"),
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
        )
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

EXTRA_QUERIES["rel_rollup_pricing"] = q_rel_rollup_pricing
EXTRA_ORACLES["rel_rollup_pricing"] = _ROLLUP_SQL
