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
    if "." in table:
        # the reclaim path below derives the location from the DEFAULT
        # database's warehouse layout; a qualified name would compute a
        # wrong path and either fail to reclaim or delete an unrelated
        # directory — refuse up front rather than guess
        raise ValueError(
            f"write_bucketed supports unqualified default-database table "
            f"names only, got {table!r}"
        )
    if not spark.catalog.tableExists(table):
        from flnr_wins_spark.fsutil import hadoop_fs

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        # the catalog lowercases identifiers when it creates the directory,
        # so a mixed-case name must reclaim the LOWERCASED path (the
        # verbatim path would either miss the orphan — the original
        # LOCATION_ALREADY_EXISTS error returns — or hit an unrelated dir)
        fs, jpath = hadoop_fs(spark, f"{warehouse}/{table.lower()}")
        if fs.exists(jpath):
            # delete ONLY something that looks like Spark table output
            # (parquet part files / _SUCCESS / spark metadata, plus their
            # crc sidecars) — never an arbitrary same-named directory a
            # user parked under the warehouse
            for status in fs.listStatus(jpath):
                name = status.getPath().getName()
                ok = (
                    name.startswith(("part-", "_SUCCESS", "_committed", "."))
                    or name.endswith(".parquet")
                )
                if not ok:
                    raise ValueError(
                        f"refusing to reclaim {warehouse}/{table.lower()}: "
                        f"entry {name!r} does not look like Spark table "
                        "output — remove the directory yourself if it is "
                        "truly an orphaned table location"
                    )
            fs.delete(jpath, True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; joins/aggregations on the bucket key skip
    their exchange when both sides share the bucket spec."""
    return spark.table(table)
