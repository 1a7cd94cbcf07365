"""R6 — frequency analysis (GROUP BY count).

Reference: ``arcpy.Frequency_analysis(RRR, TRRR_FRQ, "TRRR_TAG")`` producing a
table keyed by TRRR_TAG with a FREQUENCY column, ``src/wins_transform_staging.py:240-243``.

Scale notes: hash aggregate with map-side partial aggregation (Spark does
partial_count before the shuffle automatically) — one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequency(df: DataFrame, *keys: str, out_col: str = "FREQUENCY") -> DataFrame:
    """``SELECT keys, COUNT(*) AS FREQUENCY FROM df GROUP BY keys``."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(F.count(F.lit(1)).alias(out_col))
