"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect overhead).  Timings include plan + execution, excluding
SparkSession startup.
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
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
