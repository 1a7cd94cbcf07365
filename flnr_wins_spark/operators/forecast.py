"""Distributed per-group time-series smoothing.

A smoothing recurrence is inherently sequential WITHIN one series, but a
corpus of series (one per user / SKU / sensor — millions at 100 TB) is
embarrassingly parallel ACROSS series. The right Spark shape is
``groupBy(group).applyInPandas``: one shuffle on the group key, then each
series' recurrence runs inside a single Arrow batch — no driver collect,
no Python in the scan, state bounded by the longest single series.

Exactness contract (what lets the DuckDB recursive-CTE oracle hash-match):
the per-row update uses PLAIN Python floats in a fixed operation order —
``a*y + a2*(l+b)`` then ``b*(l1-l0) + b2*b0`` — which is bit-identical to
the same IEEE expression sequence in SQL. Keep the smoothing constants
dyadic (1/2, 1/4) so the products are exact; numpy vectorization is
deliberately NOT used (pairwise summation would change the bits).

Extension surface (SURVEY §2c); no analog in the reference
(``src/wins_transform_staging.py`` is a batch QA pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_smooth_grouped(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Holt linear-trend exponential smoothing, one independent series
    per ``group_col`` value, ordered by ``order_col``.

    Returns the input columns plus ``rn`` (1-based position within the
    series), ``level``, ``trend`` and ``onestep`` (the one-step-ahead
    forecast made at the previous point; NULL at rn=1). Initialization:
    level = first value, trend = 0."""
    import pandas as pd

    a, b = float(alpha), float(beta)
    a2, b2 = 1.0 - a, 1.0 - b
    order_type = dict(df.dtypes)[order_col]  # date/timestamp/numeric all fine
    out_schema = (
        f"{group_col} string, rn bigint, {order_col} {order_type}, "
        "y double, level double, trend double, onestep double"
    )

    def _one_series(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("rn")
        levels, trends, onesteps = [], [], []
        level = trend = None
        for y in pdf["y"]:
            y = float(y)
            if level is None:
                level, trend, onestep = y, 0.0, None
            else:
                onestep = level + trend
                new_level = a * y + a2 * (level + trend)
                trend = b * (new_level - level) + b2 * trend
                level = new_level
            levels.append(level)
            trends.append(trend)
            onesteps.append(onestep)
        return pdf.assign(level=levels, trend=trends, onestep=onesteps)

    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    seq = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(order_col),
        F.col(value_col).cast("double").alias("y"),
    ).withColumn("rn", F.row_number().over(w).cast("bigint"))
    return seq.groupBy(group_col).applyInPandas(_one_series, out_schema).select(
        group_col, "rn", order_col, "y", "level", "trend", "onestep"
    )
