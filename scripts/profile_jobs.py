"""Per-job wall-clock breakdown for one registry entry: runs the entry once
(un-timed fixture build), then once under a registered SparkListener-style
status poll using the event-log JSON, and prints each job's duration +
description. This attributes an entry's seconds to its eager actions
(collect/checkpoint/count jobs vs the final noop write) — the measurement
§1 of the optimization guide asks for, without the (disabled) UI.

Usage: python scripts/profile_jobs.py <entry> [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import shutil

    log_dir = "/tmp/spark-events-profile"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    from flnr_wins_spark.plans.common import all_queries
    from flnr_wins_spark.session import get_spark

    spark = get_spark(
        app_name="flnr-wins-jobprofile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    marks = {}
    for name in args.names:
        qd = registry[name]
        qd.fn(spark, args.sf_dir)  # fixture build, un-timed
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ENTRY:{name}")
        t0 = time.perf_counter()
        qd.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        marks[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse the event log: job start/end + description (v2 logs are a
    # directory; compressed members are skipped — run with
    # spark.eventLog.compress=false, the default)
    evfiles = [
        f
        for f in glob.glob(log_dir + "/**", recursive=True)
        if os.path.isfile(f) and "appstatus" not in f
    ]
    jobs = {}
    for ev in evfiles:
        with open(ev) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("Event") == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    props = e.get("Properties") or {}
                    jobs[jid] = {
                        "desc": props.get("spark.job.description", ""),
                        "start": e["Submission Time"],
                        "stages": len(e.get("Stage IDs", [])),
                        "callsite": (e.get("Stage Infos") or [{}])[-1].get("Stage Name", ""),
                    }
                elif e.get("Event") == "SparkListenerJobEnd":
                    jid = e["Job ID"]
                    if jid in jobs:
                        jobs[jid]["dur"] = (e["Completion Time"] - jobs[jid]["start"]) / 1000.0

    for name in args.names:
        print(f"\n=== {name}: total {marks[name]}s ===")
        tot = 0.0
        for jid in sorted(jobs):
            j = jobs[jid]
            if j["desc"] == f"ENTRY:{name}" and "dur" in j:
                tot += j["dur"]
                cs = j["callsite"][:90]
                print(f"  job {jid:>4} {j['dur']:7.3f}s stages={j['stages']:>2} {cs}")
        print(f"  (sum of jobs: {tot:.3f}s; gap to wall = driver/plan time)")


if __name__ == "__main__":
    main()
