"""Bucketed join layout: the point is the PLAN — a join of two tables
bucketed on the join key must run with no shuffle exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flnr_wins_spark.sources.bucketing import bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.range(0, 10_000).select(
        (F.col("id") % 1000).alias("orderkey"), (F.col("id") * 2).alias("qty")
    )
    od = spark.range(0, 1000).select(
        F.col("id").alias("orderkey"), (F.col("id") % 5).alias("status")
    )
    write_bucketed(li, "t_li_bucketed", ["orderkey"], n_buckets=8)
    write_bucketed(od, "t_od_bucketed", ["orderkey"], n_buckets=8)
    yield "t_li_bucketed", "t_od_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_od_bucketed")


def test_join_has_no_shuffle(spark, bucketed_tables):
    li, od = bucketed_tables
    # disable broadcast so the join would otherwise be a shuffled sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed(spark, li).join(bucketed(spark, od), "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    li, _ = bucketed_tables
    agg = bucketed(spark, li).groupBy("orderkey").agg(F.sum("qty").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == 1000


def test_write_bucketed_keeps_table_on_self_referential_overwrite(spark):
    """Review finding (r7): reclaiming an orphaned warehouse location
    must not destroy a table the catalog KNOWS — a self-referential
    overwrite goes through Spark's own guard (raises, data intact),
    never a pre-emptive drop."""
    import pytest
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.bucketing import bucketed, write_bucketed

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_bucketed(df, "t_self_ref", ["k"], n_buckets=4)
    with pytest.raises(Exception, match="overwrite the target"):
        write_bucketed(
            bucketed(spark, "t_self_ref").filter("v > 10"),
            "t_self_ref", ["k"], n_buckets=4,
        )
    assert bucketed(spark, "t_self_ref").count() == 100  # data intact
    spark.sql("DROP TABLE IF EXISTS t_self_ref")


def test_write_bucketed_reclaim_guards(spark, tmp_path):
    """ADVICE r7: the orphan-reclaim path must (a) refuse qualified
    names (it can only derive default-database locations), (b) reclaim
    the catalog's LOWERCASED directory for a mixed-case name, and (c)
    never delete a same-named warehouse directory that is not Spark
    table output."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.bucketing import bucketed, write_bucketed

    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="unqualified"):
        write_bucketed(df, "somedb.tbl", ["k"])

    # mixed-case name: catalog stores lowercase; a second write after the
    # catalog forgot the table (simulated drop of metadata only) must
    # reclaim the lowercase dir rather than erroring or missing it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    write_bucketed(df, "T_MixedCase", ["k"], n_buckets=2)
    assert os.path.isdir(f"{warehouse}/t_mixedcase")
    spark.sql("DROP TABLE t_mixedcase")  # drops metadata; dir may linger
    os.makedirs(f"{warehouse}/t_mixedcase", exist_ok=True)
    open(f"{warehouse}/t_mixedcase/part-orphan.parquet", "w").close()
    write_bucketed(df, "T_MixedCase", ["k"], n_buckets=2)
    assert bucketed(spark, "t_mixedcase").count() == 10
    spark.sql("DROP TABLE IF EXISTS t_mixedcase")

    # a non-table directory parked at the derived path is NEVER deleted
    os.makedirs(f"{warehouse}/t_guarded", exist_ok=True)
    with open(f"{warehouse}/t_guarded/notes.txt", "w") as fh:
        fh.write("user data")
    with pytest.raises(ValueError, match="refusing to reclaim"):
        write_bucketed(df, "t_guarded", ["k"])
    assert os.path.exists(f"{warehouse}/t_guarded/notes.txt")
    import shutil

    shutil.rmtree(f"{warehouse}/t_guarded")
