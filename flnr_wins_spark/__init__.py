"""flnr_wins_spark — a PySpark-native analytics engine with the data-processing
capabilities of bcgov/flnr-wins, rebuilt Spark-first.

The reference (``/root/reference/src/wins_transform_staging.py``, 319 LoC) is a
batch ETL/QA pipeline over geospatial feature tables. This package re-expresses
its operator surface (SURVEY.md §2) as pure ``DataFrame -> DataFrame``
transformations, adds a standard relational layer, a Structured Streaming
slice, and LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) — all designed partition-parallel for 100 TB
scale (no driver-side collection, broadcast-able lookups, window-based splits
instead of self-joins).
"""

__version__ = "0.1.0"
