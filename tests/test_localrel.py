"""local_df: small driver-side row lists must become JVM LocalRelations.

``createDataFrame(list, ...)`` parallelizes through a defaultParallelism-
partition Python RDD, so every downstream action pays Python-worker round
trips (~5 s per action for a ONE-ROW sentinel on this container — the r12
profile that motivated the helper). The pandas+Arrow route plants a
LocalTableScan literal instead; these tests pin the plan shape, the values
(incl. timestamps and the empty case), and that the Arrow conf pin
restores whatever setting the session had.
"""

from __future__ import annotations

import datetime

from flnr_wins_spark.localrel import local_df

ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"


def test_local_df_is_local_table_scan(spark):
    df = local_df(
        spark,
        [(-1, datetime.datetime(2024, 1, 1), -2)],
        "a bigint, ts timestamp, b bigint",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
    [r] = df.collect()
    assert (r.a, r.b) == (-1, -2)
    assert r.ts == datetime.datetime(2024, 1, 1)


def test_local_df_empty_rows_keep_schema(spark):
    df = local_df(spark, [], "k bigint, name string")
    assert df.columns == ["k", "name"]
    assert df.count() == 0
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string",
    ]


def test_local_df_restores_arrow_conf(spark):
    old = spark.conf.get(ARROW_KEY, "false")
    try:
        spark.conf.set(ARROW_KEY, "false")
        df = local_df(spark, [(1, "x")], "k bigint, name string")
        assert spark.conf.get(ARROW_KEY) == "false"
        # and the result is STILL plan-side despite the session conf
        assert "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(ARROW_KEY, old)


def test_local_df_null_and_string_values(spark):
    rows = [(1, None), (2, "qq"), (3, "")]
    df = local_df(spark, rows, "k bigint, name string")
    got = {r.k: r.name for r in df.collect()}
    assert got == {1: None, 2: "qq", 3: ""}


def test_local_df_comma_bearing_types_stay_plan_side(spark):
    # decimal(27,2) and map<string,int> contain commas: a naive
    # schema.split(',') mis-counts the columns and silently demotes to
    # the Python-RDD path (r12 ADVICE). The real DDL parse must keep
    # these on the LocalTableScan fast path.
    import decimal

    df = local_df(
        spark,
        [(1, decimal.Decimal("12.50"), {"a": 1}), (2, None, None)],
        "k bigint, amt decimal(27,2), m map<string,int>",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
    got = {r.k: (r.amt, r.m) for r in df.collect()}
    assert got[1] == (decimal.Decimal("12.50"), {"a": 1})
    assert got[2] == (None, None)


def test_local_df_fallback_is_narrow_and_warned(spark):
    # Only pandas-representation failures (ValueError/TypeError) fall
    # back to legacy createDataFrame, and the fallback warns — a silent
    # broad except would mask genuine schema bugs AND hide the
    # Python-RDD cost regression (r12 ADVICE). Rows longer than the
    # schema raise ValueError inside pd.DataFrame.
    import warnings

    import pytest

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # legacy path verifies rows against the schema eagerly and
        # raises its own ValueError — loud, never wrong rows
        with pytest.raises(ValueError):
            local_df(spark, [(1, "x", 99)], "k bigint, name string")
        rendered = [str(w.message) for w in caught]
    assert any("local_df" in m and "falling back" in m for m in rendered)
