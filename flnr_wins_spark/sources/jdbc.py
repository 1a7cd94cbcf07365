"""S9 — JDBC/SDE snapshot source.

Reference: the Oracle/SDE POD view is materialized into a local table with
``arcpy.CopyRows_management(sde_view_path, table)`` over a connection file
(``src/wins_transform_staging.py:55-58,174``; view id ``src/app.yml:22``).

Spark-native equivalent: ``spark.read.jdbc`` with predicate-partitioned
parallel reads, optionally snapshotted to parquet for downstream reuse.
Tests exercise BOTH paths: the parquet stand-in (``read_lookup``) and a
live JDBC endpoint via the embedded Derby driver Spark bundles
(``tests/test_job.py::test_jdbc_branch_live_embedded_derby``) — plain,
range-partitioned, and ``jdbc:<url>#<table>`` lookup reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_view(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC read of a view/table.

    Scale notes: without ``partition_column`` a JDBC read is a single-task
    bottleneck; always pass a numeric/indexed column + bounds so Spark issues
    ``num_partitions`` range-partitioned queries. For a dimension snapshot
    (the POD case) a single partition is fine — it is broadcast-sized.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read requires lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def snapshot_view(df: DataFrame, path: str) -> None:
    """Materialize a remote view locally (CopyRows analog): one overwrite
    write; downstream stages read the parquet snapshot instead of re-querying
    the source system."""
    df.write.mode("overwrite").parquet(path)


def read_lookup(
    spark: SparkSession,
    source: str,
    credentials: tuple[str, str] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Resolve a lookup source: ``jdbc:`` URLs go through read_jdbc_view
    (``table`` after a ``#`` fragment), anything else is a parquet path —
    the test-environment stand-in per SURVEY.md §1's Spark mapping.

    ``credentials`` is the (user, password) pair from
    ``config.load_credentials`` — without this pass-through the
    config-driven pipeline could never authenticate to the real source
    (the reference's whole dual-environment credential dance,
    wts.py:69-78, would be dead code)."""
    if source.startswith("jdbc:"):
        url, _, table = source.partition("#")
        if not table:
            raise ValueError("jdbc source must be 'jdbc:<url>#<table>'")
        opts = dict(options or {})
        if credentials is not None:
            opts.setdefault("user", credentials[0])
            opts.setdefault("password", credentials[1])
        return read_jdbc_view(spark, url, table, options=opts)
    return spark.read.parquet(source)
