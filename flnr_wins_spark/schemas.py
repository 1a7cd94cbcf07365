"""Declared schemas — the engine's analog of the reference's template
geodatabases.

The reference instantiates output schemas by *copying template gdbs*
(``src/wins_transform_staging.py:145,147-148``) and loads data with
``Append ... "NO_TEST"`` (``:155``), i.e. name-based best-effort mapping with
no validation. Here schemas are explicit ``StructType`` constants and the
align step is a deliberate operator (:func:`flnr_wins_spark.operators.append.align_to_schema`).

Two families:
  * WINS-shaped feature tables (FIXTURES.md §B, column names from
    ``src/wins_transform_staging.py:156-232`` and ``src/app.yml:8-13``).
  * The driver's TPC-H-ish test tables (FIXTURES.md §A) — used by the
    relational query surface.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# WINS-shaped feature tables (geometry carried as opaque WKB binary; the
# reference never computes on geometry content — SURVEY.md §1).
# --------------------------------------------------------------------------

RESERVES_AND_RESTRICTIONS = T.StructType(
    [
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("TRRR_TAG", T.StringType()),
        T.StructField("FEATURE_CODE", T.StringType()),
        T.StructField("DESCRIPTION", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)

NON_TRIM_HYDROGRAPHY = T.StructType(
    [
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("TNTH_TAG", T.StringType()),
        T.StructField("FEATURE_CODE", T.StringType()),
        T.StructField("STREAM_NAME", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)

WATER_LICENSED_WORKS = T.StructType(
    [
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("TWRK_TAG", T.StringType()),
        T.StructField("FEATURE_CODE", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)

FLOODED_AREA_LINES = T.StructType(
    [
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("FEATURE_CODE", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)

WATER_POD_TABLE = T.StructType(
    [
        T.StructField("PNTS_CODE", T.StringType()),
        T.StructField("PNTS_DESCR", T.StringType()),
        T.StructField("SRCE_GAZETTED", T.StringType()),
    ]
)


def with_reject_flag(schema: T.StructType) -> T.StructType:
    """Reject-table schema = source schema + REJECT_FLAG
    (reference: reject template gdb, ``src/wins_transform_staging.py:147-148,256``)."""
    return T.StructType(list(schema.fields) + [T.StructField("REJECT_FLAG", T.StringType())])


# --------------------------------------------------------------------------
# Driver test tables (FIXTURES.md §A) — names of all parquet tables.
# --------------------------------------------------------------------------

TEST_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
