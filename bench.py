"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect overhead).  Timings include plan + execution, excluding
SparkSession startup.

Two tiers are reported:

- ``queries`` / ``value`` — first-run (cold) timings, comparable across
  rounds.  At sf0.1 these are dominated by one-time whole-stage-codegen
  JIT and parquet footer reads, not data.
- ``steady_state_queries`` / ``steady_state_total_sec`` — second run of
  the identical plan in the same session.  This is the scale-relevant
  number: the one-time costs amortize to zero over a 100 TB scan, so
  steady-state is what extrapolates to a large cluster.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Headline set: flagship vector search, mutation replay + search,
# heavy aggregation, multi-way join, sessionization window.
HEADLINE = [
    "knn_batch",
    "knn_after_mutations",
    "mutations_compact",
    "rel_pricing_summary",
    "rel_revenue_by_region",
    "rel_events_sessions",
    "rel_replay_fold",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from distributed_vector_search_system_spark import registry
    from distributed_vector_search_system_spark.session import get_spark

    spark = get_spark(app_name="dvss-bench")
    qs = registry.all_queries()  # headline names may sit in either tier
    names = [n for n in HEADLINE if n in qs]
    # warm the JVM + parquet footers once (excluded from timings)
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        t1 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        steady[name] = round(time.perf_counter() - t1, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "steady_state_total_sec": round(sum(steady.values()), 4),
                "steady_state_queries": steady,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
