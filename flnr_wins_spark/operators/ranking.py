"""Global ranking without a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY forces every row
through ONE task — the classic scale trap (a 100 TB sort funnels into a
single executor thread). The standard distributed rewrite, used here:

  1. range-partition by the sort key (`repartitionByRange` — Spark samples
     boundaries, giving ~equal partitions);
  2. sort within each partition (`sortWithinPartitions`, no extra shuffle);
  3. compute per-partition row counts (a partitions-sized frame), prefix-sum
     them with a window over that TINY frame, and broadcast-join the offsets
     back: global_rank = partition_offset + local row_number.

The result is independent of where the sampled range boundaries fall as long
as the sort key is a total order (callers must include a unique tiebreak
column), so the output is deterministic even though boundary sampling is not.

This is the same sharded running-sum idiom as operators/packing.py (cited
there); factored out because equi-depth binning, global top-N percent, and
pagination all need a scale-safe global rank.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based dense global row number under ``ORDER BY order_cols``
    (which MUST be a total order — include a unique key as tiebreak).
    No single-partition stage: see module docstring for the dataflow.
    """
    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    # partitions-sized frame: the unpartitioned window here is over ≤ n rows
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_offset")
    local = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.row_number().over(local) + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_offset")
    )


def equidepth_bins(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    k: int = 10,
) -> DataFrame:
    """Equi-depth (quantile) binning: assign each row to one of ``k``
    near-equal-population buckets by rank of ``value_col``.

    bucket = ((rn-1) * k) div N + 1 — pure integer arithmetic, so any SQL
    engine reproduces it bit-exactly (unlike NTILE, whose remainder-placement
    rule is easy to mis-mirror). Adds columns ``rn`` and ``bucket``.
    """
    ranked = global_row_number(df, [value_col, tiebreak_col])
    total = ranked.agg(F.count("*").alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "bucket",
            # explicit FLOOR on both engines: DuckDB's double→int cast rounds
            # half-even while Spark's truncates — floor sidesteps the mismatch
            (F.floor(((F.col("rn") - 1) * k) / F.col("_total")) + 1).cast("int"),
        )
        .drop("_total")
    )
