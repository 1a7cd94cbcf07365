from flnr_wins_spark.sources.bucketing import bucketed, write_bucketed
from flnr_wins_spark.sources.catalog import assert_schema, dataset_exists, drop_if_exists
from flnr_wins_spark.sources.formats import read_any, write_any
from flnr_wins_spark.sources.jdbc import read_jdbc_view, read_lookup, snapshot_view
from flnr_wins_spark.sources.parquet import load_tables, publish, read_table

__all__ = [
    "assert_schema",
    "bucketed",
    "dataset_exists",
    "drop_if_exists",
    "load_tables",
    "publish",
    "read_any",
    "read_jdbc_view",
    "read_lookup",
    "read_table",
    "snapshot_view",
    "write_any",
    "write_bucketed",
]
