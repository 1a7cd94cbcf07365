"""R2+R3 — conditional field update (select-then-calculate fused to ``when``).

Reference pattern (the select/calculate micro-engine, SURVEY.md §E3): build a
selection with ``SelectLayerByAttribute`` then ``CalculateField`` over it —
e.g. ``FEATURE_CODE='EA83030000' WHERE TRRR_TAG LIKE 'RV%'``
(``src/wins_transform_staging.py:168-171``), blank-to-null normalization
(``:190-192,216-220,228-232``). In Spark the mutable selection set disappears:
each (predicate, value) pair becomes a ``when`` branch; unselected rows keep
their prior value via ``otherwise(col)``.

Scale notes: pure projection — whole-stage-codegen'd, zero shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_update(
    df: DataFrame,
    column: str,
    cases: Sequence[tuple[Column, Any]],
) -> DataFrame:
    """Apply ordered (predicate, value) cases to ``column``; first match wins,
    no match keeps the existing value.

    ``conditional_update(df, "FEATURE_CODE", [(F.col("TRRR_TAG").like("RV%"),
    "EA83030000"), (F.col("TRRR_TAG").like("RS%"), "EA83040000")])``
    reproduces ``src/wins_transform_staging.py:168-171``. A value of ``None``
    reproduces the reference's ``'None'`` CalculateField expression (-> NULL).
    Values may be Columns (join-driven updates route through enrich.py).
    """
    expr = None
    for pred, value in cases:
        val = value if isinstance(value, Column) else F.lit(value)
        expr = F.when(pred, val) if expr is None else expr.when(pred, val)
    if expr is None:
        return df
    return df.withColumn(column, expr.otherwise(F.col(column)))


def blank_to_null(df: DataFrame, *columns: str) -> DataFrame:
    """Normalize empty-string to NULL (reference selects ``col = ''`` then
    calculates ``None``: ``src/wins_transform_staging.py:190-192,216-220,228-232``).
    Equivalent to SQL ``NULLIF(col, '')``."""
    for c in columns:
        df = df.withColumn(c, F.nullif(F.col(c), F.lit("")))
    return df
