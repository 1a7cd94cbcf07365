"""Benchmark harness: runs the headline queries (registry entries flagged
``bench=True``) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the ``noop`` sink — full computation, no driver-side
collection, mirroring how a production job would terminate in a write.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from flnr_wins_spark.plans.common import all_queries
    from flnr_wins_spark.session import get_spark

    spark = get_spark(app_name="flnr-wins-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    headline = {name: qd for name, qd in registry.items() if qd.bench}

    # Warm the JVM, codegen, and the parquet read path (footer decode,
    # vectorized reader init) on the smallest table so query 1 isn't charged
    # one-time session costs. The warmup is excluded from all timings.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    from flnr_wins_spark.sources import read_table

    read_table(spark, sf_dir, "region").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, qd in headline.items():
        # min of two runs: the first run of a query pays one-time plan
        # compile/codegen/broadcast-pool costs that land on whichever query
        # happens to come first — the min measures the steady-state plan,
        # which is what round-over-round comparisons should track
        best = None
        for _ in range(2):
            # isolate queries: operators that persist intermediates (MinHash
            # LSH, semdedup) must not hold executor memory across timings
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # keep notes SHORT (<300 chars): the driver captures only the
                # last 2,000 chars of stdout — a long note truncated 9 of 27
                # r5 timings out of BENCH_r05.json. Prose lives in SURVEY §8.
                "notes": "min-of-2 per query, steady-state plan; 35 "
                "headliners (r8 adds cost-based join advisor, zorder "
                "pruning witness); see SURVEY.md §8.",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
