"""As-of join — for each left row, the most recent right value at or before
the left row's time, per key.

The reference has no temporal joins (SURVEY.md §2c); this is part of the
engine's extension surface. Spark lacks a built-in as-of join, so it is
composed from existing operators with the classic union+window technique:
interleave both sides ordered by (time, side), then ``last(value) IGNORE
NULLS`` over an unbounded-preceding frame picks the latest right value ≤ each
left row's time.

Scale notes: ONE shuffle (the window partitionBy key) regardless of
right-side size — strictly better than the per-row correlated subquery or the
join+groupBy rewrite (which shuffles both sides AND re-aggregates). Skewed
keys are split by AQE. This is the same plan shape Flink/kdb use for as-of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_col: str,
    out_col: str = "asof_value",
    strict: bool = False,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: output = left columns + ``out_col``.

    ``strict=False`` matches right rows with time <= left time (inclusive);
    ``strict=True`` uses <. Ties among right rows at the same time resolve to
    the greatest ``value_col`` (deterministic). ``tolerance_seconds`` (pandas
    ``merge_asof``-style) nulls the match when the latest right row is older
    than the window — the matched right TIME forward-fills alongside the
    value, so the bound is a pure post-filter with no extra shuffle.
    """
    lcols = [f.name for f in left.schema.fields]

    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_v"),
        F.lit(None).cast(right.schema[right_time].dataType).alias("_vt"),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.col(value_col).alias("_v"),
        F.col(right_time).alias("_vt"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    # Inclusive: right sorts before left at equal time, so last() sees it.
    # Strict: right sorts after left at equal time, so last() does not.
    side_order = F.col("_is_left").asc() if not strict else F.col("_is_left").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), side_order, F.col("_v").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        l.unionByName(r)
        .withColumn(out_col, F.last("_v", ignorenulls=True).over(w))
        .withColumn("_matched_t", F.last("_vt", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        # NTZ has no direct long cast; route both sides through LTZ. The
        # session-TZ shift cancels in the difference ONLY while both
        # timestamps resolve under one UTC offset — a DST-observing session
        # timezone would skew the window by the offset delta across a
        # transition. session.py pins spark.sql.session.timeZone=UTC (fixed
        # offset, no transitions), which this arithmetic relies on; under a
        # non-fixed session TZ, pre-render to UTC strings and unix_timestamp
        # them instead.
        def secs(c):
            return F.col(c).cast("timestamp_ltz").cast("long")

        in_window = secs("_t") - secs("_matched_t") <= F.lit(tolerance_seconds)
        out = out.withColumn(out_col, F.when(in_window, F.col(out_col)))
    return out.select(*[F.col(f"_l_{c}").alias(c) for c in lcols], F.col(out_col))
