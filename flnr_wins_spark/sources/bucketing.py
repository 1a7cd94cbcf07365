"""Bucketed-table layout for co-located (shuffle-free) joins.

The reference pre-builds attribute indexes to speed joins
(``src/wins_transform_staging.py:156-161``); the Spark analog at 100 TB is
bucketing: persist both join sides hash-bucketed on the join key, and the
sort-merge join reads co-located buckets with NO exchange on either side —
the shuffle cost is paid once at write time and amortized over every
subsequent join/aggregation on that key.

Bucketed writes go through the session catalog (``saveAsTable`` — bucket
metadata lives in the metastore; a plain ``parquet(path)`` write cannot
record it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on the join key.

    ``n_buckets`` bounds join parallelism on the read side — size it to the
    target cluster (e.g. 4-8x executor count at 100 TB), not the data volume;
    AQE cannot re-split a bucketed scan.
    """
    spark = df.sparkSession
    # idempotent across SESSIONS, not just reruns: a fresh in-memory
    # catalog doesn't know the table, so mode("overwrite") alone cannot
    # reclaim a previous session's ORPHANED managed-table location and
    # saveAsTable fails with LOCATION_ALREADY_EXISTS. Reclaim ONLY that
    # case — a directory with no catalog entry. A table the catalog
    # knows goes through Spark's own overwrite path, which keeps its
    # safety properties (a self-referential overwrite raises with data
    # intact; a failed write does not destroy the previous table).
    if not spark.catalog.tableExists(table):
        from flnr_wins_spark.fsutil import hadoop_fs

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, jpath = hadoop_fs(spark, f"{warehouse}/{table}")
        if fs.exists(jpath):
            fs.delete(jpath, True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; joins/aggregations on the bucket key skip
    their exchange when both sides share the bucket spec."""
    return spark.table(table)
