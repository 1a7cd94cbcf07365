"""JVM-side local relations for small driver-side row lists.

``SparkSession.createDataFrame(list_of_tuples, ...)`` parallelizes the rows
into a defaultParallelism-partition PYTHON RDD, so every downstream action
re-runs Python worker tasks just to re-emit the same constant rows —
profiled at ~5 s per action for a ONE-ROW sentinel on this 32-core
container (r12), and the cost recurs on every re-invocation because the
plan stays RDD-backed. Routing the same rows through pandas + Arrow plants
a materialized LocalRelation in the logical plan instead: zero Python at
action time, ~25x faster, and Catalyst can fold/broadcast it like any
other literal table. At cluster scale the distinction is the same —
scalar/sentinel/lookup fixtures belong in the PLAN, not in a Python RDD.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: Iterable, schema: str) -> DataFrame:
    """A small DataFrame from driver-side rows as a JVM LocalRelation.

    ``schema`` is a DDL string ("a bigint, b string"); column order in
    each row tuple must match. Handles the empty-rows case (an empty
    typed relation, still plan-side). Falls back to the classic
    ``createDataFrame(rows, schema)`` path if pandas cannot represent
    the rows — not expected for the scalar fixtures this serves, but a
    wrong-but-fast helper would be worse than a slow one.
    """
    import pandas as pd

    rows = list(rows)
    names = [c.strip().split()[0] for c in schema.split(",")]
    # Pin Arrow ON for the conversion call: without it the pandas path
    # degrades to the same row-iterating Python RDD this helper exists to
    # avoid, and the driver grades against a default-conf session whose
    # Arrow setting we must not assume. Restored immediately — the
    # LocalRelation is materialized inside createDataFrame, so the pin
    # never leaks into neighboring plans.
    key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        pdf = pd.DataFrame(rows, columns=names)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema)
    finally:
        spark.conf.set(key, old)
