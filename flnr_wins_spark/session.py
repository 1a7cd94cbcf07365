"""SparkSession construction with scale-appropriate defaults.

The reference runs single-process ArcPy (no session concept). Here the session
is tuned for correctness-determinism (UTC timezone; Spark's default ANSI mode
is kept — every query is written to be ANSI-safe so results match whatever
session the driver constructs) and for scale (AQE on, skew-join handling on,
modest shuffle partitioning that AQE coalesces at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flnr-wins-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Scale notes (100 TB stance):
      - AQE enabled: runtime shuffle-partition coalescing + skew-join splitting
        mean ``shuffle_partitions`` here is an upper bound, not a fixed fanout.
      - ``autoBroadcastJoinThreshold`` left at default (10 MB) so dimension
        tables (region/nation/POD lookup) broadcast automatically; big-side
        joins fall back to sort-merge.
      - On a real cluster these same confs apply; only ``master`` changes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
