"""Cost-based advisor tests — sources/advisor.py (the consumer of the
ptable manifest statistics: bytes, row counts, NDV sketches, zone maps,
blooms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flnr_wins_spark.sources.advisor import (
    advise_join,
    advise_scan,
    run_advised_join,
    table_stats,
)
from flnr_wins_spark.sources.ptable import partition_bytes, write_ptable


def _fact(spark):
    return spark.createDataFrame(
        [(i, i % 7, str(i % 3), float(i)) for i in range(600)],
        "fk long, cust long, part string, v double",
    )


def _dim(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}", str(i % 2)) for i in range(7)],
        "cust long, name string, seg string",
    )


def test_broadcast_advice_from_metadata_and_result_parity(spark, tmp_path):
    """The advisor must pick broadcast for a small dim from manifest
    metadata alone, run_advised_join must pin that side, and the result
    must equal the plain join — strategy changes, answers don't."""
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(_fact(spark), fp, "part", stats_cols=["cust"], ndv_cols=["cust"])
    write_ptable(_dim(spark), dp, "seg", stats_cols=["cust"], ndv_cols=["cust"])

    adv = advise_join(spark, fp, dp, "cust")
    assert adv.strategy == "broadcast"
    assert adv.build_side == "right"  # dim bytes < fact bytes
    assert adv.left.rows_total == 600 and adv.right.rows_total == 7
    # both NDVs below k=64 -> exact; System-R estimate is exact here:
    # 600 * 7 / max(7, 7) = 600
    assert adv.est_output_rows == 600

    out = run_advised_join(spark, adv, "cust")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    got = {(r.fk, r.name) for r in out.select("fk", "name").collect()}
    want = {(i, f"name_{i % 7}") for i in range(600)}
    assert got == want


def test_shuffle_advice_sizes_partitions_from_ndv(spark, tmp_path):
    """Over the threshold the advisor says shuffle and sizes the output
    partitioning from the System-R cardinality estimate — never the
    session default for a provably huge output."""
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(_fact(spark), fp, "part", stats_cols=["cust"], ndv_cols=["cust"])
    write_ptable(_dim(spark), dp, "seg", stats_cols=["cust"], ndv_cols=["cust"])

    adv = advise_join(
        spark, fp, dp, "cust",
        broadcast_threshold_bytes=0,
        target_rows_per_partition=100,
        min_shuffle_partitions=2,
    )
    assert adv.strategy == "shuffle" and adv.build_side is None
    assert adv.est_output_rows == 600
    assert adv.shuffle_partitions == 6  # ceil(600 / 100)
    out = run_advised_join(spark, adv, "cust")
    assert out.count() == 600


def test_advice_degrades_honestly_without_optins(spark, tmp_path):
    """No stats_cols/ndv_cols: bytes still decide broadcast, but the
    cardinality estimate is None — never a fabricated number."""
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(_fact(spark), fp, "part")
    write_ptable(_dim(spark), dp, "seg")
    adv = advise_join(spark, fp, dp, "cust")
    assert adv.strategy == "broadcast"
    assert adv.left.rows_total is None and adv.right.key_ndv is None
    assert adv.est_output_rows is None

    adv2 = advise_join(spark, fp, dp, "cust", broadcast_threshold_bytes=0)
    assert adv2.strategy == "shuffle"
    assert adv2.shuffle_partitions is None  # no estimate -> session default


def test_partition_bytes_is_metadata_only_and_consistent(spark, tmp_path):
    import os

    fp = str(tmp_path / "f")
    write_ptable(_fact(spark), fp, "part")
    sizes = partition_bytes(spark, fp)
    assert set(sizes) == {"0", "1", "2"}
    assert all(v > 0 for v in sizes.values())
    # matches a direct walk of the data files
    total = 0
    for root, _dirs, files in os.walk(fp):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    assert sum(sizes.values()) == total
    ts = table_stats(spark, fp)
    assert ts.bytes_total == total and ts.n_partitions == 3


def test_advise_scan_intersects_all_sidecars(spark, tmp_path):
    """Multi-predicate pruning = intersection of zone-map and bloom
    evidence; a column with no sidecar prunes nothing; zero predicates
    is a loud error."""
    fp = str(tmp_path / "f")
    df = spark.createDataFrame(
        [(i, str(i // 100), f"u{i}") for i in range(400)],
        "id long, kb string, name string",
    )
    write_ptable(df, fp, "kb", stats_cols=["id"], bloom_cols=["name"])
    # range keeps kb in {1, 2}; point keeps only name=u150's partition
    got = advise_scan(
        spark, fp,
        ranges={"id": (120, 260)},
        points={"name": "u150"},
    )
    assert got == ["1"]
    # un-sidecarred column: conservative (prunes nothing on its own)
    assert advise_scan(spark, fp, ranges={"kb_other": (0, 1)}) == [
        "0", "1", "2", "3",
    ]
    with pytest.raises(ValueError, match="at least one predicate"):
        advise_scan(spark, fp)


def test_space_bearing_partition_values_roundtrip(spark, tmp_path):
    """Partition values with spaces (TPC-H priorities) must survive the
    manifest encode / hive-dir decode split for DATA reads and RAW FS
    listings alike; values with hive-escaped characters fail loudly at
    commit time instead of committing unreadable partitions."""
    from flnr_wins_spark.sources.ptable import read_ptable

    fp = str(tmp_path / "f")
    df = spark.createDataFrame(
        [(1, "4-NOT SPECIFIED"), (2, "1-URGENT"), (3, "4-NOT SPECIFIED")],
        "id long, pri string",
    )
    write_ptable(df, fp, "pri", stats_cols=["id"])
    assert partition_bytes(spark, fp)["4-NOT SPECIFIED"] > 0
    got = read_ptable(spark, fp, partitions=["4-NOT SPECIFIED"])
    assert sorted(r.id for r in got.collect()) == [1, 3]

    bad = spark.createDataFrame([(1, "a:b")], "id long, pri string")
    with pytest.raises(ValueError, match="path-safe"):
        write_ptable(bad, str(tmp_path / "g"), "pri")


def test_dpp_join_prunes_most_fact_partitions(spark):
    """The graded DPP entry's bloom pruning must actually bite: for the
    3-key probe over 32 orderkey buckets, the kept set is well under the
    partition count, and the pruned read equals the unpruned one."""
    from flnr_wins_spark.plans.common import all_queries
    from flnr_wins_spark.sources.ptable import (
        prune_partitions_eq,
        read_ptable,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = all_queries()["x_ptable_dpp_join"].fn(spark, sf_dir)
    got = sorted((r.o_orderkey, r.o_custkey) for r in out.collect())

    # reconstruct the pruning stats over the cached fixture the entry
    # built (THIS process's cache — never another process's leftovers)
    from flnr_wins_spark.plans import common

    path = common.fixture_path("ptable_dpp", sf_dir) + "/tbl"
    kept = set()
    for k in (1, 2, 3):
        kept |= set(prune_partitions_eq(spark, path, "o_custkey", k))
    total = read_ptable(spark, path).select("kb").distinct().count()
    # ~10 orders/customer x 3 keys land in at most ~30 of 32 buckets in
    # the worst case; observed 16/32 at sf0.001 — pin that the pruning
    # bites (strictly fewer partitions than the table has)
    assert len(kept) <= total * 0.7, (len(kept), total)
    # losslessness: pruned result == unpruned filter+join result
    full = sorted(
        (r.o_orderkey, r.o_custkey)
        for r in read_ptable(spark, path)
        .filter(F.col("o_custkey").isin([1, 2, 3]))
        .collect()
    )
    assert got == full


def test_run_advised_join_preserves_left_semantics_on_left_build(spark, tmp_path):
    """Review findings (r8): broadcasting the LEFT side must hint the
    build side WITHOUT swapping join inputs, and a build side that is
    INFEASIBLE for the join type (Spark cannot build the preserved side
    of an outer join — the hint would be silently dropped) must run the
    plain join explicitly. Auto-broadcast is disabled so nothing passes
    by accident."""
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left = spark.createDataFrame(
        [(1, "a", "0"), (2, "b", "0"), (99, "zz", "1")],
        "k long, lv string, part string",
    )
    right = spark.createDataFrame(
        [(1, "x", "0", 0.0), (2, "y", "0", 0.0), (2, "y2", "1", 0.0),
         (3, "w", "1", 0.0), (4, "u", "0", 0.0), (5, "t", "1", 0.0)]
        + [(10 + i, f"r{i}", str(i % 2), float(i)) for i in range(50)],
        "k long, rv string, part string, pad double",
    )
    write_ptable(left, lp, "part")
    write_ptable(right, rp, "part")
    adv = advise_join(spark, lp, rp, "k")
    assert adv.strategy == "broadcast" and adv.build_side == "left"

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # build-left is FEASIBLE for inner: the hint must apply
        inner = run_advised_join(spark, adv, "k", how="inner")
        plan = inner._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "BuildLeft" in plan, plan

        # build-left is INFEASIBLE for left-outer: plain join, correct
        # semantics, NO pretend-broadcast
        out = run_advised_join(spark, adv, "k", how="left")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        rows = {(r.k, r.lv, r.rv) for r in out.select("k", "lv", "rv").collect()}
        assert (99, "zz", None) in rows  # LEFT unmatched row survives
        assert not any(k in (3, 4, 5) for k, _, _ in rows)
        assert out.columns[:3] == ["k", "lv", "part"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_hive_escape_guard_covers_sparks_full_escape_set(spark, tmp_path):
    """Review finding (r8): Spark's hive writer escapes control chars,
    DEL, and " # % ' * / : = ? \\ { [ ] ^ — every one must be rejected
    at commit time (the unquote-based readers cannot find the escaped
    dir), never committed unreadably."""
    for i, ch in enumerate(['[', ']', '{', '^', '\r', '\x7f', '%', '*']):
        bad = spark.createDataFrame([(1, f"a{ch}b")], "id long, pri string")
        with pytest.raises(ValueError, match="path-safe"):
            write_ptable(bad, str(tmp_path / f"t{i}"), "pri")


def test_shuffle_advice_presizes_the_join_shuffle_itself(spark, tmp_path):
    """For a named-key equi-join the advised partition count pre-sizes
    the JOIN's own shuffle (co-partitioned inputs at N), never an extra
    exchange after it: exactly two hash Exchanges at N=6 appear in the
    plan and none follow the join."""
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(_fact(spark), fp, "part", stats_cols=["cust"], ndv_cols=["cust"])
    write_ptable(_dim(spark), dp, "seg", stats_cols=["cust"], ndv_cols=["cust"])
    adv = advise_join(
        spark, fp, dp, "cust",
        broadcast_threshold_bytes=0,
        target_rows_per_partition=100,
        min_shuffle_partitions=2,
    )
    assert adv.shuffle_partitions == 6
    out = run_advised_join(spark, adv, "cust")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "REPARTITION_BY_NUM" in plan or ", 6)" in plan, plan
    assert out.count() == 600


def test_catalog_join_advice_three_way(spark, tmp_path):
    """advise_catalog_join picks colocated ONLY when both bucket specs
    match the join keys with equal counts; a count mismatch falls back
    to the bytes rule; the colocated execution is exchange-free."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.advisor import (
        advise_catalog_join,
        bucket_spec,
        run_advised_catalog_join,
    )
    from flnr_wins_spark.sources.bucketing import write_bucketed

    a = spark.range(500).select(F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
    b = spark.range(300).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    write_bucketed(a, "t_adv_a", ["k"], n_buckets=4)
    write_bucketed(b, "t_adv_b", ["k"], n_buckets=4)
    write_bucketed(b, "t_adv_c", ["k"], n_buckets=8)  # mismatched count

    assert bucket_spec(spark, "t_adv_a") == (["k"], 4)
    adv = advise_catalog_join(spark, "t_adv_a", "t_adv_b", ["k"])
    assert adv.strategy == "colocated" and adv.n_buckets == 4
    out = run_advised_catalog_join(spark, adv, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert out.count() == 300

    adv2 = advise_catalog_join(spark, "t_adv_a", "t_adv_c", ["k"])
    assert adv2.strategy == "broadcast"  # tiny tables under threshold
    adv3 = advise_catalog_join(
        spark, "t_adv_a", "t_adv_c", ["k"], broadcast_threshold_bytes=0
    )
    assert adv3.strategy == "shuffle"
    for tname in ("t_adv_a", "t_adv_b", "t_adv_c"):
        spark.sql(f"DROP TABLE IF EXISTS {tname}")


def test_run_advised_join_column_condition_list_on_shuffle_path(spark, tmp_path):
    """Review finding (r8): a list of Column CONDITIONS is not a key
    list — the shuffle path must fall through to output sizing instead
    of crashing on repartition(n, Column(a==b))."""
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(_fact(spark), fp, "part", stats_cols=["cust"], ndv_cols=["cust"])
    write_ptable(_dim(spark), dp, "seg", stats_cols=["cust"], ndv_cols=["cust"])
    adv = advise_join(
        spark, fp, dp, "cust",
        broadcast_threshold_bytes=0,
        target_rows_per_partition=100,
        min_shuffle_partitions=2,
    )
    out = run_advised_join(
        spark, adv,
        # a CONDITION list (side-unique columns), not a key-name list
        [F.concat(F.lit("name_"), (F.col("fk") % 7).cast("string"))
         == F.col("name")],
    )
    assert out.count() == 600


def test_catalog_join_keys_resolve_like_spark(spark, tmp_path):
    """Review finding (r8): key comparison must be case- and
    order-insensitive (Spark resolves identifiers case-insensitively and
    a hash partitioning on {a,b} serves a join on {b,a}); views fail
    loudly, not with StopIteration."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.advisor import advise_catalog_join
    from flnr_wins_spark.sources.bucketing import write_bucketed

    df = spark.range(100).select(
        F.col("id").alias("ka"), (F.col("id") % 5).alias("kb")
    )
    write_bucketed(df, "t_ci_a", ["ka", "kb"], n_buckets=4)
    write_bucketed(df, "t_ci_b", ["ka", "kb"], n_buckets=4)
    adv = advise_catalog_join(
        spark, "t_ci_a", "t_ci_b", ["KB", "KA"]  # case+order scrambled
    )
    assert adv.strategy == "colocated"

    spark.range(5).createOrReplaceTempView("t_ci_view")
    with pytest.raises(Exception, match="Location|view|TABLE_OR_VIEW"):
        advise_catalog_join(spark, "t_ci_a", "t_ci_view", ["ka"])
    for tname in ("t_ci_a", "t_ci_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tname}")


def test_detect_partition_skew_reads_metadata_only(spark, tmp_path):
    """Skew detection runs off manifest row counts: a hot partition is
    named with its ratio, a balanced table reports ok, and a table
    without counts raises loudly instead of reporting 'no skew'."""
    from flnr_wins_spark.sources.advisor import detect_partition_skew

    fp = str(tmp_path / "f")
    rows = [(i, "hot") for i in range(900)] + [
        (1000 + i, str(i % 3)) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id long, kb string")
    write_ptable(df, fp, "kb", stats_cols=["id"])
    rep = detect_partition_skew(spark, fp, threshold=3.0)
    assert rep.max_partition == "hot" and rep.max_rows == 900
    assert rep.skewed == ["hot"] and rep.advice == "salt-or-split"
    assert rep.total_rows == 990 and rep.n_partitions == 4

    bp = str(tmp_path / "b")
    write_ptable(
        spark.createDataFrame([(i, str(i % 4)) for i in range(400)],
                              "id long, kb string"),
        bp, "kb", stats_cols=["id"],
    )
    assert detect_partition_skew(spark, bp).advice == "ok"

    np_ = str(tmp_path / "n")
    write_ptable(
        spark.createDataFrame([(1, "a")], "id long, kb string"), np_, "kb"
    )
    with pytest.raises(FileNotFoundError, match="row counts"):
        detect_partition_skew(spark, np_)


def test_colocated_requires_positional_cross_side_alignment(spark, tmp_path):
    """Review finding (r8): cross-side co-partitioning is POSITIONAL —
    left bucketed [a,b] vs right bucketed [d,c] under the pairing
    (a=c, b=d) is NOT exchange-free, and the advisor must not claim it;
    a consistent cross-side order IS colocated even with scrambled
    key-argument order."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.advisor import advise_catalog_join
    from flnr_wins_spark.sources.bucketing import write_bucketed

    l = spark.range(200).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    r = spark.range(200).select(
        F.col("id").alias("c"), (F.col("id") % 7).alias("d")
    )
    write_bucketed(l, "t_pos_l", ["a", "b"], n_buckets=4)
    write_bucketed(r, "t_pos_r", ["d", "c"], n_buckets=4)  # REVERSED order
    # pairing a=c, b=d: left hashes (a,b) positionally, right hashes (d,c)
    # = (b-pair, a-pair) — misaligned, Spark would shuffle a side
    adv = advise_catalog_join(
        spark, "t_pos_l", "t_pos_r", ["a", "b"], ["c", "d"]
    )
    assert adv.strategy != "colocated"
    # same tables, pairing given as a=d, b=c: alignment holds -> colocated
    adv2 = advise_catalog_join(
        spark, "t_pos_l", "t_pos_r", ["a", "b"], ["d", "c"]
    )
    assert adv2.strategy == "colocated"
    for tname in ("t_pos_l", "t_pos_r"):
        spark.sql(f"DROP TABLE IF EXISTS {tname}")


def test_prune_points_any_union_and_errors(spark, tmp_path):
    """prune_points_any unions per-key survivors from ONE manifest read;
    empty probe lists and missing tables fail loudly."""
    from flnr_wins_spark.sources.advisor import prune_points_any

    fp = str(tmp_path / "f")
    df = spark.createDataFrame(
        [(i, str(i // 10), f"u{i}") for i in range(40)],
        "id long, kb string, name string",
    )
    write_ptable(df, fp, "kb", bloom_cols=["name"])
    got = prune_points_any(spark, fp, "name", ["u5", "u25"])
    assert got == ["0", "2"]
    # absent values prune everything (union of two empty survivor sets)
    assert prune_points_any(spark, fp, "name", ["zz", "yy"]) == []
    with pytest.raises(ValueError, match="at least one probe"):
        prune_points_any(spark, fp, "name", [])
    with pytest.raises(FileNotFoundError, match="no committed manifest"):
        prune_points_any(spark, str(tmp_path / "nope"), "name", ["x"])


def test_catalog_join_mixed_bucketed_unbucketed_falls_back(spark, tmp_path):
    """One bucketed + one plain table is never colocated — the bytes
    rule decides, and the tiny plain side broadcasts."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.advisor import (
        advise_catalog_join,
        run_advised_catalog_join,
    )
    from flnr_wins_spark.sources.bucketing import write_bucketed

    big = spark.range(2000).select(F.col("id").alias("k"), (F.col("id") % 3).alias("v"))
    tiny = spark.range(20).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    write_bucketed(big, "t_mix_b", ["k"], n_buckets=4)
    tiny.write.mode("overwrite").saveAsTable("t_mix_p")
    adv = advise_catalog_join(spark, "t_mix_b", "t_mix_p", ["k"])
    assert adv.strategy == "broadcast" and adv.build_side == "right"
    assert adv.left_bytes and adv.right_bytes and adv.right_bytes < adv.left_bytes
    out = run_advised_catalog_join(spark, adv, "k")
    assert out.count() == 20
    for tname in ("t_mix_b", "t_mix_p"):
        spark.sql(f"DROP TABLE IF EXISTS {tname}")


def test_infeasible_broadcast_fallback_is_sized_from_the_estimate(spark, tmp_path):
    """ADVICE r8: when the advised build side is infeasible for the join
    type, the fallback must NOT funnel through the session-default
    partition count — broadcast advice carries
    ``fallback_shuffle_partitions`` sized from the same System-R
    estimate the shuffle path uses, and the fallback join pre-partitions
    both sides at that count."""
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(_fact(spark), fp, "part", stats_cols=["cust"], ndv_cols=["cust"])
    write_ptable(_dim(spark), dp, "seg", stats_cols=["cust"], ndv_cols=["cust"])
    adv = advise_join(
        spark, fp, dp, "cust",
        target_rows_per_partition=100,
        min_shuffle_partitions=2,
    )
    assert adv.strategy == "broadcast" and adv.build_side == "right"
    assert adv.shuffle_partitions is None           # broadcast: no shuffle
    assert adv.fallback_shuffle_partitions == 6     # ceil(600 / 100)

    # right-build is INFEASIBLE for right-outer: the fallback shuffle
    # join must be co-partitioned at the advised count, visible as
    # hashpartitioning(..., 6) exchanges in the plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = run_advised_join(spark, adv, "cust", how="right")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert plan.count("hashpartitioning(cust#") >= 2 and ", 6)" in plan, plan
        assert out.count() == 600
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_describe_table_ignores_data_columns_shadowing_metadata(spark):
    """ADVICE r8: a data column literally named 'Location' or
    'Num Buckets' must not contaminate the DESCRIBE FORMATTED parse —
    only the detailed-info section (after its header) is metadata."""
    from flnr_wins_spark.sources.advisor import _describe_table, bucket_spec

    spark.sql("DROP TABLE IF EXISTS t_shadow")
    spark.createDataFrame(
        [(1, "fake_loc", 99)], "k long, `Location` string, `Num Buckets` long"
    ).write.saveAsTable("t_shadow")
    try:
        spec, loc = _describe_table(spark, "t_shadow")
        assert spec is None  # the table is NOT bucketed, col name lies
        assert loc is not None and "t_shadow" in loc and loc != "fake_loc"
        assert bucket_spec(spark, "t_shadow") is None
    finally:
        spark.sql("DROP TABLE IF EXISTS t_shadow")


def test_range_bucket_null_key_yields_null_not_bucket_zero(spark):
    """ADVICE r8: NULL keys must map to NULL bucket ids, never silently
    to bucket 0 (indistinguishable from below-all-bounds values)."""
    from flnr_wins_spark.sources.advisor import range_bucket

    df = spark.createDataFrame([(1,), (15,), (None,)], "v int")
    got = {
        r.v: r.b
        for r in df.select(
            "v", range_bucket(F.col("v"), [10, 20]).alias("b")
        ).collect()
    }
    assert got == {1: 0, 15: 1, None: None}


# ---------------------------------------------------------------------------
# Auto-advised read path contract tests (advise_auto_join / run_auto_join /
# read_advised_scan) — round 10
# ---------------------------------------------------------------------------

def _dated_fact(spark):
    # 3 year-partitions x 100 rows; o_d is a DATE inside the year
    import datetime

    rows = []
    for y in (1995, 1996, 1997):
        for i in range(100):
            rows.append(
                (y * 1000 + i, i % 11, datetime.date(y, 1 + i % 12, 1), str(y))
            )
    return spark.createDataFrame(rows, "fk long, cust long, o_d date, yy string")


def _seg_dim(spark):
    return spark.createDataFrame(
        [(i, f"nm{i}", ["A", "B"][i % 2]) for i in range(11)],
        "cust long, name string, seg string",
    )


def _auto_paths(spark, tmp_path):
    from flnr_wins_spark.sources.ptable import write_ptable

    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(_dated_fact(spark), fp, "yy",
                 stats_cols=["o_d", "cust"], ndv_cols=["cust"])
    write_ptable(_seg_dim(spark), dp, "seg",
                 stats_cols=["cust"], ndv_cols=["cust"])
    return fp, dp


def test_auto_join_prunes_each_sidecar_tightly(spark, tmp_path):
    """Zone-map range on the fact keeps exactly the overlapping year
    partitions; hive point on the dim keeps exactly the named segment —
    pruning tightness per sidecar type, from ONE advise call."""
    from flnr_wins_spark.sources.advisor import advise_auto_join

    fp, dp = _auto_paths(spark, tmp_path)
    plan = advise_auto_join(
        spark, fp, dp, "cust",
        left_ranges={"o_d": ("1995-06-01", "1996-06-30")},
        right_points={"seg": "A"},
    )
    assert plan.left_scan.kept == ("1995", "1996")
    assert plan.left_scan.n_total == 3
    assert plan.right_scan.kept == ("A",)
    assert plan.right_scan.n_total == 2


def test_auto_join_decision_sees_pruned_stats(spark, tmp_path):
    """The SAME tables flip broadcast<->shuffle purely because pruning
    changed the small side's byte count — the decision consumes the
    PRUNED partition set's stats, not the whole table's."""
    from flnr_wins_spark.sources.advisor import advise_auto_join
    from flnr_wins_spark.sources.ptable import partition_bytes

    fp, dp = _auto_paths(spark, tmp_path)
    pb = partition_bytes(spark, dp)
    # threshold strictly between one partition's bytes and the table's
    thresh = pb["A"] + 1
    assert thresh <= sum(pb.values())
    pruned = advise_auto_join(
        spark, fp, dp, "cust",
        right_points={"seg": "A"},
        broadcast_threshold_bytes=thresh,
    )
    assert pruned.join.strategy == "broadcast"
    assert pruned.join.build_side == "right"
    unpruned = advise_auto_join(
        spark, fp, dp, "cust", broadcast_threshold_bytes=thresh
    )
    assert unpruned.join.strategy == "shuffle"


def test_read_advised_scan_all_pruned_is_empty_with_schema(spark, tmp_path):
    """A range no zone intersects yields an EMPTY result (not an error)
    with the table's schema, and run_auto_join over it yields empty."""
    from flnr_wins_spark.sources.advisor import (
        advise_auto_join,
        read_advised_scan,
        run_auto_join,
    )

    fp, dp = _auto_paths(spark, tmp_path)
    plan = advise_auto_join(
        spark, fp, dp, "cust",
        left_ranges={"o_d": ("2050-01-01", "2051-01-01")},
    )
    assert plan.left_scan.kept == ()
    left = read_advised_scan(spark, plan.left_scan)
    assert left.count() == 0
    assert set(left.columns) == {"fk", "cust", "o_d", "yy"}
    assert run_auto_join(spark, plan).count() == 0


def test_run_auto_join_residual_refilter_row_exact(spark, tmp_path):
    """Pruning is partition-granular; the residual re-filter must restore
    row semantics EXACTLY — the auto path equals the plain filtered join
    on the raw frames, row for row."""
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    fp, dp = _auto_paths(spark, tmp_path)
    lo, hi = "1995-06-01", "1996-06-30"
    plan = advise_auto_join(
        spark, fp, dp, "cust",
        left_ranges={"o_d": (lo, hi)},
        right_points={"seg": "A"},
    )
    got = run_auto_join(spark, plan)
    want = (
        _dated_fact(spark)
        .filter(F.col("o_d").between(lo, hi))
        .join(_seg_dim(spark).filter(F.col("seg") == "A"), "cust")
    )
    assert got.count() == want.count() > 0
    assert got.select(*sorted(got.columns)).exceptAll(
        want.select(*sorted(got.columns))
    ).count() == 0


def test_scan_advice_boolean_partition_normalizes_hive_form(spark, tmp_path):
    """Hive dirs encode booleans lowercase; str(True) is 'True'. A point
    probe {part: True} must keep the true partition (ADVICE r9: the old
    identity compare silently pruned EVERYTHING), and a boolean range
    must order 'false' < 'true'."""
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join
    from flnr_wins_spark.sources.ptable import write_ptable

    df = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(40)], "k long, flag boolean"
    )
    fp = str(tmp_path / "b")
    write_ptable(df, fp, "flag", stats_cols=["k"])
    dim = spark.createDataFrame([(i, str(i)) for i in range(40)], "k long, s string")
    dp = str(tmp_path / "bd")
    write_ptable(dim, dp, "s", stats_cols=["k"])

    plan = advise_auto_join(
        spark, fp, dp, "k", left_points={"flag": True}
    )
    assert plan.left_scan.kept == ("true",)
    out = run_auto_join(spark, plan)
    assert out.count() == 20
    assert all(r["flag"] is True for r in out.select("flag").distinct().collect())

    rng = advise_auto_join(
        spark, fp, dp, "k", left_ranges={"flag": (False, True)}
    )
    assert rng.left_scan.kept == ("false", "true")


def test_scan_advice_point_miss_empty_by_default_strict_raises(spark, tmp_path):
    """A partition-column point probe matching ZERO hive values is a
    VALID EMPTY QUERY by default — 'no partitions can match' means empty
    result, the same contract the range / bloom / non-partition-equality
    paths keep (ADVICE r10: the loud default was internally
    inconsistent). strict_points=True opts back into the planning-time
    KeyError for callers who want mis-encoded probes caught loudly."""
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    fp, dp = _auto_paths(spark, tmp_path)
    plan = advise_auto_join(
        spark, fp, dp, "cust", right_points={"seg": "nope"}
    )
    assert plan.right_scan.kept == ()
    out = run_auto_join(spark, plan)
    assert out.count() == 0
    # the empty scan still carries the full schema (O(1) probe path)
    assert "seg" in out.columns and "cust" in out.columns

    with pytest.raises(KeyError, match="matches no partition value"):
        advise_auto_join(
            spark, fp, dp, "cust", right_points={"seg": "nope"},
            strict_points=True,
        )


def test_detect_key_skew_reads_manifest_only_and_salted_parity(spark, tmp_path):
    """Value-level skew: balanced partitions, one hot KEY — invisible to
    detect_partition_skew, flagged by detect_key_skew from the manifest
    alone (data dirs renamed away to PROVE no data read), and
    salted_join with the detected hot_keys equals the plain join."""
    import os

    from flnr_wins_spark.operators.skew import salted_join
    from flnr_wins_spark.sources.advisor import (
        detect_key_skew,
        detect_partition_skew,
    )
    from flnr_wins_spark.sources.ptable import write_ptable

    rows = []
    rid = 0
    for i in range(400):
        rows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 41):
        for _ in range(10):
            rows.append((k, str(rid % 4), rid)); rid += 1
    big = spark.createDataFrame(rows, "k long, pb string, rid long")
    p = str(tmp_path / "t")
    write_ptable(big, p, "pb", stats_cols=["k"], heavy_cols=["k"],
                 heavy_k=8, heavy_threshold=20)

    # partition-level counts are balanced -> no partition skew
    assert detect_partition_skew(spark, p).advice == "ok"
    # key-level detection works with the data DIRS renamed away
    os.rename(f"{p}/stage", f"{p}/stage_hidden")
    try:
        rep = detect_key_skew(spark, p, "k", hot_ratio=0.05)
    finally:
        os.rename(f"{p}/stage_hidden", f"{p}/stage")
    assert rep.advice == "salt" and rep.hot_keys == [0]
    assert rep.hot_counts[0] == [400, 0]
    assert rep.floor == 40

    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 41)], "k long, nm string"
    )
    a = salted_join(big, dim, "k", "rid", buckets=8, hot_keys=rep.hot_keys)
    b = big.join(dim, "k")
    assert a.count() == b.count() == 800
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_join_hot_keys_left_null_semantics(spark):
    """hot_keys mode must preserve plain-left-join semantics for NULL
    keys and unmatched keys (null-filled once, never dropped)."""
    from flnr_wins_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, 1), (1, 2), (None, 3), (9, 4)], "k int, rid int"
    )
    dim = spark.createDataFrame([(1, "one")], "k int, nm string")
    out = salted_join(big, dim, "k", "rid", how="left", hot_keys=[1])
    want = big.join(dim, "k", "left")
    assert out.count() == 4
    assert out.exceptAll(want).count() == 0 and want.exceptAll(out).count() == 0


def test_auto_join_salts_metadata_flagged_hot_keys(spark, tmp_path):
    """On the SHUFFLE strategy, advise_auto_join must read the left
    heavy sidecar, flag the hot join key over the PRUNED partitions,
    and run_auto_join must execute the hot/tail salted split — result
    identical to the plain join, xxhash64 salt visible in the plan.
    Broadcast advice must NOT flag keys (no shuffle to straggle)."""
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join
    from flnr_wins_spark.sources.ptable import write_ptable

    rows = []
    rid = 0
    for i in range(400):
        rows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 41):
        for _ in range(10):
            rows.append((k, str(rid % 4), rid)); rid += 1
    big = spark.createDataFrame(rows, "k long, pb string, rid long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 41)], "k long, nm string"
    )
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(big, fp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=20)
    write_ptable(dim, dp, "nm", stats_cols=["k"])

    plan = advise_auto_join(
        spark, fp, dp, "k", broadcast_threshold_bytes=0  # force shuffle
    )
    assert plan.join.strategy == "shuffle"
    assert plan.hot_keys == (0,)
    out = run_auto_join(spark, plan)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in phys
    want = big.join(dim, "k")
    cols = sorted(out.columns)  # read_ptable appends the partition col last
    out_s, want_s = out.select(*cols), want.select(*cols)
    assert out.count() == want.count() == 800
    assert out_s.exceptAll(want_s).count() == 0
    assert want_s.exceptAll(out_s).count() == 0

    bcast = advise_auto_join(spark, fp, dp, "k")  # dim fits the default
    assert bcast.join.strategy == "broadcast" and bcast.hot_keys == ()


def test_auto_join_skew_respects_pruning_and_missing_sidecar(spark, tmp_path):
    """(1) hot detection runs over the PRUNED partition set: pruning away
    the partitions holding the hot key's mass drops it below the floor;
    (2) a left table without the heavy sidecar yields hot_keys == ()
    silently — automatic optimization, not a loud statistic."""
    from flnr_wins_spark.sources.advisor import advise_auto_join
    from flnr_wins_spark.sources.ptable import write_ptable

    # hot key 0 lives ONLY in partitions 0/1; partitions 2/3 are uniform
    rows = []
    rid = 0
    for i in range(200):
        rows.append((0, str(rid % 2), rid)); rid += 1       # pb in {0,1}
    for k in range(1, 21):
        for _ in range(10):
            rows.append((k, str(2 + rid % 2), rid)); rid += 1  # pb in {2,3}
    big = spark.createDataFrame(rows, "k long, pb string, rid long")
    dim = spark.createDataFrame([(k, k % 3) for k in range(0, 21)], "k long, g long")
    fp, dp = str(tmp_path / "f"), str(tmp_path / "d")
    write_ptable(big, fp, "pb", stats_cols=["k", "rid"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=20)
    write_ptable(dim, dp, "g", stats_cols=["k"])

    full = advise_auto_join(spark, fp, dp, "k", broadcast_threshold_bytes=0)
    assert full.hot_keys == (0,)
    pruned = advise_auto_join(
        spark, fp, dp, "k", broadcast_threshold_bytes=0,
        left_points={"pb": "2"},
        skew_hot_ratio=0.2,
    )
    # the hot mass was pruned away: key 0 holds ZERO of the kept rows
    # (uniform keys each hold 5% — below the 20% floor)
    assert pruned.hot_keys == ()

    # no heavy sidecar on the left: silent no-salt
    fp2 = str(tmp_path / "f2")
    write_ptable(big, fp2, "pb", stats_cols=["k"])
    plain = advise_auto_join(spark, fp2, dp, "k", broadcast_threshold_bytes=0)
    assert plain.hot_keys == ()


def test_detect_key_skew_surfaces_hot_key_via_kmin_sample(spark, tmp_path):
    """A hot key the per-partition threshold misses (threshold set above
    its per-partition count) must still be flagged when the uniform
    hash sample catches it — kmin counts are globally EXACT, so the
    evidence class is as strong as the threshold's."""
    from flnr_wins_spark.sources.advisor import detect_key_skew
    from flnr_wins_spark.sources.ptable import heavy_hitters, write_ptable

    # key 0: 25 rows per partition x 8 partitions = 200 of 360 rows;
    # threshold 50 > 25 so NO partition reports it hot. heavy_k == the
    # distinct-value count, so the kmin sample provably contains key 0.
    rows = []
    rid = 0
    for i in range(200):
        rows.append((0, str(rid % 8), rid)); rid += 1
    for k in range(1, 21):
        for _ in range(8):
            rows.append((k, str(rid % 8), rid)); rid += 1
    df = spark.createDataFrame(rows, "k long, pb string, rid long")
    p = str(tmp_path / "t")
    write_ptable(df, p, "pb", stats_cols=["k"], heavy_cols=["k"],
                 heavy_k=21, heavy_threshold=50)
    _kmin, hot = heavy_hitters(spark, p, "k")
    assert hot == {}  # the threshold statistic really did miss it
    rep = detect_key_skew(spark, p, "k", hot_ratio=0.5)
    assert rep.hot_keys == [0]
    assert rep.hot_counts[0] == [200, 0]  # exact, zero error


def test_auto_join_right_side_skew_swaps_roles(spark, tmp_path):
    """RIGHT-side key skew on an inner join: the roles swap (salt the
    heavy right, replicate only the hot keys' left rows), the column
    order stays the caller's, and the result equals the plain join.
    Left joins cannot swap — they take the degenerate (1 x N) grid
    (one-sided salting of the heavy right + the distinct-key anti
    probe for the null-padded complement); keys hot on BOTH sides
    route through the full 2-D grid (its own test)."""
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join
    from flnr_wins_spark.sources.ptable import write_ptable

    # left: uniform; right: key 0 hot (400 of 600 rows)
    lrows = [(k, str(k % 4), k * 7) for k in range(0, 41) for _ in (0,)]
    left = spark.createDataFrame(lrows, "k long, pb string, lv long")
    rrows = []
    rid = 0
    for i in range(400):
        rrows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 41):
        for _ in range(5):
            rrows.append((k, str(rid % 4), rid)); rid += 1
    right = spark.createDataFrame(rrows, "k long, pb string, rv long")
    fp, dp = str(tmp_path / "l"), str(tmp_path / "r")
    write_ptable(left, fp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=30)
    write_ptable(right, dp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=30)

    plan = advise_auto_join(spark, fp, dp, "k", broadcast_threshold_bytes=0)
    assert plan.join.strategy == "shuffle"
    assert plan.hot_keys == () and plan.hot_keys_right == (0,)

    out = run_auto_join(spark, plan)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in phys
    # layout is the caller's: [key, left-rest, right-rest], where each
    # side's read_ptable layout puts its partition col last — the shared
    # 'pb' name appears twice, exactly like the plain join of the reads
    assert out.columns == ["k", "lv", "pb", "rv", "pb"]
    from flnr_wins_spark.sources.advisor import read_advised_scan

    want = read_advised_scan(spark, plan.left_scan).join(
        read_advised_scan(spark, plan.right_scan), "k"
    )
    assert want.columns == out.columns
    got = out.toDF("k", "lv", "pb_l", "rv", "pb_r")
    wnt = want.toDF("k", "lv", "pb_l", "rv", "pb_r")
    assert got.count() == wnt.count() > 0
    assert got.exceptAll(wnt).count() == 0 and wnt.exceptAll(got).count() == 0

    # LEFT join with right-hot keys: the (1 x N) grid — the plan carries
    # the two grid explodes (the left one degenerate) and the LeftAnti
    # null-pad probe, and the result equals the plain left join exactly
    lplan = advise_auto_join(spark, fp, dp, "k", broadcast_threshold_bytes=0)
    lout = run_auto_join(spark, lplan, how="left")
    lphys = lout._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in lphys
    assert lphys.count("Generate") == 2 and "LeftAnti" in lphys
    from flnr_wins_spark.sources.advisor import read_advised_scan as _ras

    lwant = _ras(spark, lplan.left_scan).join(
        _ras(spark, lplan.right_scan), "k", "left"
    )
    assert lout.columns == lwant.columns
    ltmp = [f"_c{i}" for i in range(len(lout.columns))]
    lgot_s, lwant_s = lout.toDF(*ltmp), lwant.toDF(*ltmp)
    assert lout.count() == lwant.count() > 0
    assert lgot_s.exceptAll(lwant_s).count() == 0
    assert lwant_s.exceptAll(lgot_s).count() == 0


def test_auto_join_both_sides_hot_routes_grid(spark, tmp_path):
    """Keys hot on BOTH sides — the genuinely quadratic |L_k| x |R_k|
    case one-sided salting cannot fix — route through the 2-D
    grid-salted join: the plan carries TWO explode fan-outs (one per
    side; the 1-D salted path has exactly one) and the result equals
    the plain join. A LEFT join routes through the grid too, via the
    exact decomposition (grid inner + distinct-key anti probe for the
    null-padded complement)."""
    from flnr_wins_spark.sources.advisor import (
        advise_auto_join,
        read_advised_scan,
        run_auto_join,
    )
    from flnr_wins_spark.sources.ptable import write_ptable

    lrows, rid = [], 0
    for i in range(200):                      # key 0 hot on the LEFT
        lrows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 21):
        for _ in range(5):
            lrows.append((k, str(rid % 4), rid)); rid += 1
    rrows = []
    for i in range(100):                      # key 0 hot on the RIGHT too
        rrows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 21):
        for _ in range(4):
            rrows.append((k, str(rid % 4), rid)); rid += 1
    left = spark.createDataFrame(lrows, "k long, pb string, lv long")
    right = spark.createDataFrame(rrows, "k long, pb string, rv long")
    fp, dp = str(tmp_path / "l"), str(tmp_path / "r")
    write_ptable(left, fp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=30)
    write_ptable(right, dp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=20)

    plan = advise_auto_join(spark, fp, dp, "k", broadcast_threshold_bytes=0)
    assert plan.join.strategy == "shuffle"
    assert plan.hot_keys == (0,) and plan.hot_keys_right == (0,)

    out = run_auto_join(spark, plan)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in phys
    assert phys.count("Generate") == 2  # grid fan-out on BOTH sides
    want = read_advised_scan(spark, plan.left_scan).join(
        read_advised_scan(spark, plan.right_scan), "k"
    )
    assert out.columns == want.columns
    tmp = [f"_c{i}" for i in range(len(out.columns))]
    got_s, want_s = out.toDF(*tmp), want.toDF(*tmp)
    assert out.count() == want.count() == 200 * 100 + 20 * 5 * 4
    assert got_s.exceptAll(want_s).count() == 0
    assert want_s.exceptAll(got_s).count() == 0

    # LEFT join with both-hot keys: the grid decomposition — matched
    # pairs from the grid inner, null-padded complement via a LeftAnti
    # probe against the right side's distinct keys — still exact
    lout = run_auto_join(spark, plan, how="left")
    lphys = lout._jdf.queryExecution().executedPlan().toString()
    assert lphys.count("Generate") == 2 and "LeftAnti" in lphys
    lwant = read_advised_scan(spark, plan.left_scan).join(
        read_advised_scan(spark, plan.right_scan), "k", "left"
    )
    ltmp = [f"_c{i}" for i in range(len(lout.columns))]
    lgot_s, lwant_s = lout.toDF(*ltmp), lwant.toDF(*ltmp)
    assert lout.count() == lwant.count()
    assert lgot_s.exceptAll(lwant_s).count() == 0
    assert lwant_s.exceptAll(lgot_s).count() == 0

    # FULL join with both-hot keys: grid inner + BOTH anti probes (the
    # left-null-padded complement needs the transpose probe too)
    fout = run_auto_join(spark, plan, how="full")
    fphys = fout._jdf.queryExecution().executedPlan().toString()
    assert fphys.count("Generate") == 2 and fphys.count("LeftAnti") >= 2
    fwant = read_advised_scan(spark, plan.left_scan).join(
        read_advised_scan(spark, plan.right_scan), "k", "full"
    )
    ftmp = [f"_c{i}" for i in range(len(fout.columns))]
    fgot_s, fwant_s = fout.toDF(*ftmp), fwant.toDF(*ftmp)
    assert fout.count() == fwant.count()
    assert fgot_s.exceptAll(fwant_s).count() == 0
    assert fwant_s.exceptAll(fgot_s).count() == 0


def test_auto_join_one_side_hot_full_takes_degenerate_grid(spark, tmp_path):
    """FULL joins with one-side-hot keys route through the degenerate
    grid — (N x 1) for left-hot, (1 x N) for right-hot — with both
    anti probes restoring the null-padded complements; the result
    equals the plain full join including rows matchless on either
    side."""
    from flnr_wins_spark.sources.advisor import (
        advise_auto_join,
        read_advised_scan,
        run_auto_join,
    )
    from flnr_wins_spark.sources.ptable import write_ptable

    # hot side: key 0 holds 400 of 600 rows, plus an exclusive key 90;
    # cold side: uniform over keys 0..40 plus an exclusive key 91
    hrows, rid = [], 0
    for i in range(400):
        hrows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 41):
        for _ in range(5):
            hrows.append((k, str(rid % 4), rid)); rid += 1
    hrows.append((90, "0", rid)); rid += 1
    crows = [(k, str(k % 4), k * 7) for k in range(0, 41)] + [(91, "3", 637)]
    hot_df = spark.createDataFrame(hrows, "k long, pb string, hv long")
    cold_df = spark.createDataFrame(crows, "k long, pb string, cv long")
    hp, cp = str(tmp_path / "hot"), str(tmp_path / "cold")
    write_ptable(hot_df, hp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=30)
    write_ptable(cold_df, cp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=30)

    for lp, rp, hot_side in ((hp, cp, "left"), (cp, hp, "right")):
        plan = advise_auto_join(spark, lp, rp, "k", broadcast_threshold_bytes=0)
        assert plan.join.strategy == "shuffle"
        if hot_side == "left":
            assert plan.hot_keys == (0,) and plan.hot_keys_right == ()
        else:
            assert plan.hot_keys == () and plan.hot_keys_right == (0,)
        out = run_auto_join(spark, plan, how="full")
        phys = out._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" in phys
        assert phys.count("Generate") == 2 and phys.count("LeftAnti") >= 2
        want = read_advised_scan(spark, plan.left_scan).join(
            read_advised_scan(spark, plan.right_scan), "k", "full"
        )
        tmp = [f"_c{i}" for i in range(len(out.columns))]
        got_s, want_s = out.toDF(*tmp), want.toDF(*tmp)
        assert out.count() == want.count()
        assert got_s.exceptAll(want_s).count() == 0
        assert want_s.exceptAll(got_s).count() == 0


def test_auto_join_right_outer_covers_all_hot_patterns(spark, tmp_path):
    """RIGHT-outer joins route through the grid for every hot pattern —
    (8 x 1) for left-hot, (1 x 8) for right-hot — completing the
    inner/left/right/full x {left,right,both}-hot matrix (r12). The
    decomposition is grid inner + ONLY the transpose anti probe
    (matchless right rows left-null-padded once; matchless left rows
    dropped), and the result equals the plain right join."""
    from flnr_wins_spark.sources.advisor import (
        advise_auto_join,
        read_advised_scan,
        run_auto_join,
    )
    from flnr_wins_spark.sources.ptable import write_ptable

    hrows, rid = [], 0
    for i in range(400):
        hrows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 41):
        for _ in range(5):
            hrows.append((k, str(rid % 4), rid)); rid += 1
    hrows.append((90, "0", rid)); rid += 1
    crows = [(k, str(k % 4), k * 7) for k in range(0, 41)] + [(91, "3", 637)]
    hot_df = spark.createDataFrame(hrows, "k long, pb string, hv long")
    cold_df = spark.createDataFrame(crows, "k long, pb string, cv long")
    hp, cp = str(tmp_path / "hot"), str(tmp_path / "cold")
    write_ptable(hot_df, hp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=30)
    write_ptable(cold_df, cp, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=8, heavy_threshold=30)

    for lp, rp, hot_side in ((hp, cp, "left"), (cp, hp, "right")):
        plan = advise_auto_join(spark, lp, rp, "k", broadcast_threshold_bytes=0)
        out = run_auto_join(spark, plan, how="right")
        phys = out._jdf.queryExecution().executedPlan().toString()
        # grid inner (two explode fan-outs) + the transpose anti probe
        # (string count is >= 1: AQE stringification repeats node names)
        assert phys.count("Generate") == 2, hot_side
        assert phys.count("LeftAnti") >= 1, hot_side
        want = read_advised_scan(spark, plan.left_scan).join(
            read_advised_scan(spark, plan.right_scan), "k", "right"
        )
        tmp = [f"_c{i}" for i in range(len(out.columns))]
        got_s, want_s = out.toDF(*tmp), want.toDF(*tmp)
        assert out.count() == want.count()
        assert got_s.exceptAll(want_s).count() == 0
        assert want_s.exceptAll(got_s).count() == 0


def test_grid_dims_scale_with_measured_hot_mass():
    """r13 VERDICT task 2: the 2-D grid's dims come from the sidecars'
    measured per-side hot-key masses — split the heavy side, replicate
    the light one — instead of a constant 8x8. Cell count (parallelism)
    is invariant; replication cost |L|*br + |R|*bl is minimized."""
    from flnr_wins_spark.sources.advisor import _GRID_CELLS, _grid_dims

    assert _grid_dims(0, 0) == (8, 8)          # no sidecar evidence
    assert _grid_dims(100, 100) == (8, 8)      # balanced
    assert _grid_dims(300_000, 41) == (64, 1)  # tiny hot dim: never split
    assert _grid_dims(41, 300_000) == (1, 64)  # transpose
    for lm, rm in [(1, 1), (10, 1000), (7, 0), (10**9, 3)]:
        bl, br = _grid_dims(lm, rm)
        assert bl * br == _GRID_CELLS and 1 <= bl <= _GRID_CELLS, (lm, rm)


def test_auto_join_plan_carries_hot_mass(spark, tmp_path):
    """advise_auto_join surfaces the flagged keys' summed count lower
    bounds so run_auto_join can size the grid; a side without flagged
    keys reports zero mass."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.advisor import advise_auto_join
    from flnr_wins_spark.sources.ptable import write_ptable

    left = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 50)
        .cast("bigint").alias("k"),
        F.lit(1).alias("pb"),
        (F.col("id") % 7).alias("v"),
    )
    right = spark.range(60).select(
        F.col("id").cast("bigint").alias("k"),
        F.lit(1).alias("pb"),
        (F.col("id") % 3).alias("w"),
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_ptable(left, lp, "pb", stats_cols=["k"], heavy_cols=["k"],
                 heavy_k=8, heavy_threshold=20)
    write_ptable(right, rp, "pb", stats_cols=["k"], heavy_cols=["k"],
                 heavy_k=8, heavy_threshold=20)
    plan = advise_auto_join(
        spark, lp, rp, "k", broadcast_threshold_bytes=0,
        min_shuffle_partitions=4,
    )
    assert plan.hot_keys and plan.hot_mass >= 1000  # key 0 holds half
    assert plan.hot_keys_right == () and plan.hot_mass_right == 0
