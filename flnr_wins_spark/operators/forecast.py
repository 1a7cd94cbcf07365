"""Distributed per-group time-series smoothing.

A smoothing recurrence is inherently sequential WITHIN one series, but a
corpus of series (one per user / SKU / sensor — millions at 100 TB) is
embarrassingly parallel ACROSS series. The right Spark shape is
``groupBy(group).applyInPandas``: one shuffle on the group key, then each
series' recurrence runs inside a single Arrow batch — no driver collect,
no Python in the scan, state bounded by the longest single series.

Exactness contract (what lets the DuckDB recursive-CTE oracle hash-match):
the per-row update is ONE shared function (:func:`holt_step`) of plain
Python floats in a fixed operation order — ``a*y + (1-a)*(l+b)`` then
``b*(l1-l0) + (1-b)*b0`` — which is bit-identical to the same IEEE
expression sequence in SQL. Keep the smoothing constants dyadic (1/2,
1/4) so the products are exact; numpy vectorization is deliberately NOT
used (pairwise summation would change the bits).

Extension surface (SURVEY §2c); no analog in the reference
(``src/wins_transform_staging.py`` is a batch QA pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RESERVED = {"rn", "y", "level", "trend", "onestep"}


def holt_step(
    a: float, b: float, level: float, trend: float, y: float
) -> tuple[float, float, float]:
    """One Holt update — THE single copy of the recurrence, shared by the
    distributed operator and the driver-side single-series entry so the
    IEEE op order can never drift between them (the SQL oracles mirror
    this exact sequence). Returns (new_level, new_trend, onestep), where
    onestep is the forecast that was made for this point."""
    onestep = level + trend
    new_level = a * y + (1.0 - a) * (level + trend)
    new_trend = b * (new_level - level) + (1.0 - b) * trend
    return new_level, new_trend, onestep


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

    Output schema (other input columns are DROPPED; the group key is
    cast to string): ``group_col, rn, order_col, y, level, trend,
    onestep`` — ``rn`` is the 1-based position within the series, ``y``
    the value as double, ``onestep`` the one-step-ahead forecast made at
    the previous point (NULL at rn=1). Initialization: level = first
    value, trend = 0.

    Contract: ``order_col`` must be UNIQUE within each group (a
    recurrence has no defined answer under ties — the operator cannot
    pick an order for you deterministically across engines), and
    ``value_col`` must be non-NULL (a hole in a series is a resampling
    decision the caller owns; a NaN would silently poison every later
    point, so it raises instead)."""
    names = {group_col, order_col, value_col}
    if len(names) != 3 or names & _RESERVED:
        raise ValueError(
            f"group/order/value columns must be distinct and none of "
            f"{sorted(_RESERVED)} (got {group_col!r}, {order_col!r}, "
            f"{value_col!r})"
        )
    import math

    a, b = float(alpha), float(beta)
    order_type = dict(df.dtypes)[order_col]  # date/timestamp/numeric all fine
    out_schema = (
        f"{group_col} string, rn bigint, {order_col} {order_type}, "
        "y double, level double, trend double, onestep double"
    )

    def _one_series(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        if pdf[order_col].duplicated().any():
            raise ValueError(
                f"order column '{order_col}' has ties within group "
                f"{pdf[group_col].iat[0]!r} — a smoothing recurrence is "
                "undefined under ties; dedupe or refine the order key"
            )
        levels, trends, onesteps = [], [], []
        level = trend = None
        for y in pdf["y"]:
            y = float(y)
            if math.isnan(y):
                raise ValueError(
                    f"NULL/NaN value in group {pdf[group_col].iat[0]!r} — "
                    "fill or drop holes before smoothing (a NaN would "
                    "silently poison every later point)"
                )
            if level is None:
                level, trend, onestep = y, 0.0, None
            else:
                level, trend, onestep = holt_step(a, b, level, trend, y)
            levels.append(level)
            trends.append(trend)
            onesteps.append(onestep)
        return pdf.assign(
            rn=range(1, len(pdf) + 1),
            level=levels, trend=trends, onestep=onesteps,
        )

    seq = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(order_col),
        F.col(value_col).cast("double").alias("y"),
    )
    # rn is derived INSIDE the Arrow batch (each group is sorted there
    # anyway) — a Window row_number here would add a redundant full
    # per-partition sort pass over the corpus
    return seq.groupBy(group_col).applyInPandas(_one_series, out_schema).select(
        group_col, "rn", order_col, "y", "level", "trend", "onestep"
    )
