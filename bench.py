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

    # Pre-build per-entry fixtures OUTSIDE the timings (r12 verdict task
    # 3): cached_fixture builders (and scratch-table commits) run EAGERLY
    # during fn() plan construction, so invoking each entry once WITHOUT
    # executing its returned plan materializes every pure fixture before
    # pass 1. Without this, pass 1 conflates fixture build with the
    # operator and a weather-inflated pass 2 or 3 can push the BUILD cost
    # into the median (r12: x_warc_ingest driver median 6.9 s vs 1.49 s
    # true warm). Entries whose eager work is the behavior under test
    # (scratch_dir commit sequences) simply pay one extra un-timed run.
    for qd in headline.values():
        qd.fn(spark, sf_dir)
    spark.catalog.clearCache()

    # INTERLEAVED passes + per-query MEDIAN (r9 verdict task 5): three
    # full passes over the whole set, one timing per query per pass, and
    # the recorded number is the median of the three. Interleaving
    # spreads transient host weather (shared-hypervisor CPU contention)
    # across every query in the pass instead of concentrating it on
    # whichever query was running — so one query 3x out of band while
    # its pass-neighbors sit in band reads as a real regression, and a
    # uniformly inflated pass reads as weather. The median then drops
    # that worst pass. Pass 1 additionally absorbs one-time plan
    # compile/codegen/broadcast-pool costs (the old min-of-2 rationale).
    passes: dict[str, list[float]] = {name: [] for name in headline}
    for _ in range(3):
        for name, qd in headline.items():
            # isolate queries: operators that persist intermediates
            # (MinHash LSH, semdedup) must not hold executor memory
            # across timings
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            passes[name].append(time.perf_counter() - t0)
    timings = {
        name: round(sorted(ts)[1], 3) for name, ts in passes.items()
    }

    total = round(sum(timings.values()), 3)
    # per-PASS totals (3 numbers): the direct weather witness. Host
    # contention inflates every pass of a run near-uniformly (r12: five
    # runs of identical code spanned 68-154 s), so "all three pass
    # totals high" reads as weather while "one bad pass" is exactly
    # what the median already drops — without this, a single inflated
    # BENCH artifact is indistinguishable from a plan regression.
    pass_totals = [
        round(sum(ts[i] for ts in passes.values()), 1) for i in range(3)
    ]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "pass_totals": pass_totals,
                # host-load witness (r13 VERDICT task 5): 1-min loadavg
                # at report time — high load + uniformly high pass_totals
                # adjudicates weather from the artifact alone
                "load_1m": round(os.getloadavg()[0], 2),
                # keep notes SHORT (<300 chars): the driver captures only the
                # last 2,000 chars of stdout — a long note truncated 9 of 27
                # r5 timings out of BENCH_r05.json. Prose lives in SURVEY §8.
                "notes": "median of 3 INTERLEAVED passes per query; "
                "fixtures pre-built in an un-timed warmup pass; "
                "pass_totals = per-pass sums (uniform inflation across "
                "all three = host weather, not a plan change); "
                "see SURVEY.md §8.",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
