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
    from pyspark.sql.types import StructType

    rows = list(rows)
    # Real DDL parse for the column names: a naive split(",") mis-parses
    # any type that itself contains a comma (decimal(27,2),
    # map<string,int>, struct<...>) and the resulting column-count
    # mismatch would silently demote the call to the slow legacy path
    # this module exists to avoid (r12 ADVICE). fromDDL needs an active
    # session — local_df always has one in hand.
    names = StructType.fromDDL(schema).fieldNames()
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
    except (ValueError, TypeError) as exc:
        # Only pandas-representation failures fall back; anything else
        # (analysis errors, bad schema) must surface. The fallback is
        # logged because it re-introduces the Python-RDD cost and can
        # coerce values differently than the Arrow path (r12 ADVICE).
        import warnings

        warnings.warn(
            f"local_df: pandas/Arrow path failed ({exc!r}); falling back "
            "to legacy createDataFrame (slow Python-RDD plan)",
            RuntimeWarning,
            stacklevel=2,
        )
        return spark.createDataFrame(rows, schema)
    finally:
        spark.conf.set(key, old)
