"""Profile one or more registry entries: N timed noop-sink runs each
(median printed), plus optional .explain('formatted') capture.

Usage: python scripts/profile_query.py q1_pricing_summary x_semdedup \
         [--passes 3] [--explain-dir plans/r15] [--sf-dir /root/testdata/sf0.1]

The timing protocol mirrors bench.py: fixtures pre-built un-timed, cache
cleared between timings, noop sink forces full computation.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from flnr_wins_spark.plans.common import all_queries
    from flnr_wins_spark.session import get_spark

    spark = get_spark(app_name="flnr-wins-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    from flnr_wins_spark.sources import read_table

    read_table(spark, args.sf_dir, "region").write.format("noop").mode("overwrite").save()

    results = {}
    for name in args.names:
        qd = registry[name]
        qd.fn(spark, args.sf_dir)  # un-timed fixture build
        spark.catalog.clearCache()
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qd.fn(spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(txt)
            spark.catalog.clearCache()
        ts = []
        for _ in range(args.passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            qd.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        results[name] = ts
        print(f"{name}: median={sorted(ts)[len(ts) // 2]} all={ts} load={os.getloadavg()[0]:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
