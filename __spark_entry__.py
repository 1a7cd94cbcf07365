"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (full WINS staging pipeline reject table)
on sf0.001. ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2 plus the relational/streaming/LLM-pipeline
extension surface; built from the registry in
``flnr_wins_spark/plans/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full WINS staging pipeline (transform + QA reject split,
    SURVEY.md §2b R1-R8) on sf0.001; returns the reject table."""
    from flnr_wins_spark.plans.common import all_queries

    return all_queries()["wins_e2e_rejects"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flnr_wins_spark.plans.common import all_queries

    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from flnr_wins_spark.plans.common import all_queries

    return {name: qd.sql for name, qd in all_queries().items() if qd.sql is not None}
