"""S4/S10/R11 — catalog probes and idempotent lifecycle.

Reference: ``arcpy.Exists`` guards before every create/drop
(``src/wins_transform_staging.py:137-140`` and ~17 more sites), and item
fetch asserts dataset type (``:120-121``). In Spark most of this disappears
into ``mode("overwrite")``; what remains is path/table existence probing for
control flow and the type assertion at ingestion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dataset_exists(spark: SparkSession, path_or_table: str) -> bool:
    """Existence probe (``arcpy.Exists`` analog) for a dataset path or a
    catalog table/view name. Paths go through the Hadoop FileSystem API so
    remote URIs (s3a://, hdfs://, abfs://) resolve against the right store —
    ``os.path.exists`` only answers for the local filesystem."""
    if (
        "://" in path_or_table
        or os.path.sep in path_or_table
        or path_or_table.endswith(".parquet")
    ):
        is_remote_uri = "://" in path_or_table and not path_or_table.startswith(
            "file://"
        )
        try:
            from flnr_wins_spark.fsutil import hadoop_fs

            fs, p = hadoop_fs(spark, path_or_table)
            return bool(fs.exists(p))
        except Exception:
            if is_remote_uri:
                # s3a://... with a broken classpath must SURFACE, not
                # silently answer "missing" through an os.path fallback
                # that can never see a remote store
                raise
            return os.path.exists(path_or_table)
    try:
        return spark.catalog.tableExists(path_or_table)
    except Exception:
        return False


def drop_if_exists(spark: SparkSession, view_name: str) -> None:
    """Idempotent temp-view drop (``Delete_management`` analog for layers,
    ``src/wins_transform_staging.py:165-166`` etc.)."""
    spark.catalog.dropTempView(view_name)


def assert_schema(df: DataFrame, expected: T.StructType, name: str = "dataset") -> DataFrame:
    """Type assertion at ingestion (``assert item.type=='Feature Service'``
    analog, ``src/wins_transform_staging.py:121``): verify column names and
    types match the declared contract; raises on drift."""
    got = {f.name.lower(): f.dataType for f in df.schema.fields}
    for f in expected.fields:
        if f.name.lower() not in got:
            raise ValueError(f"{name}: missing column {f.name}")
        if got[f.name.lower()] != f.dataType:
            raise ValueError(
                f"{name}: column {f.name} is {got[f.name.lower()]}, expected {f.dataType}"
            )
    return df


def register_tables(
    spark,
    sf_dir: str,
    names: tuple[str, ...] = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ),
    prefix: str = "",
) -> list[str]:
    """Register the dataset's tables as temp views so users can drive the
    ENGINE THROUGH SQL directly (``spark.sql("SELECT ... FROM orders")``)
    — the query-language front door the reference lacks entirely
    (SURVEY §2c: its only 'SQL' is where-clause fragments,
    ``wts.py:168-268``); here Spark's own parser/Catalyst IS the engine,
    so exposing it costs one view registration per table. Views go
    through ``read_table`` (NANOS-timestamp handling included), so SQL
    users inherit the same read semantics as the DataFrame API. Returns
    the registered view names.
    """
    from flnr_wins_spark.sources import read_table

    out = []
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(f"{prefix}{n}")
        out.append(f"{prefix}{n}")
    return out
