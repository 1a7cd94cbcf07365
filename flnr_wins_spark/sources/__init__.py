from flnr_wins_spark.sources.parquet import load_tables, publish, read_table

__all__ = ["read_table", "load_tables", "publish"]
