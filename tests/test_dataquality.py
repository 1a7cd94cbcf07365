"""Data-quality expectations + column profiler (operators/dataquality.py).

Semantics on tiny inline frames (null/duplicate/out-of-range edge cases) plus
the plan contract the module header claims: every check/profile evaluates in
ONE scan of the input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flnr_wins_spark.operators.dataquality import (
    check_expectations,
    completeness,
    containment,
    distinctness,
    max_bound,
    min_bound,
    pattern_conformance,
    profile_columns,
)


def _rows(df):
    return {r["check"]: (r["metric"], r["passed"]) for r in df.collect()}


def test_expectations_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, None, 30.0)],
        "k int, s string, v double",
    )
    out = _rows(
        check_expectations(
            df,
            [
                completeness("s"),  # 2/3 -> fail at 1.0
                completeness("k"),  # 1.0 -> pass
                distinctness("k"),  # 2/3 -> fail
                min_bound("v", 0.0),
                max_bound("v", 25.0),  # 30 > 25 -> fail
                containment("s", ["a", "b"]),
                pattern_conformance("s", r"^[ab]$"),
            ],
        )
    )
    assert out["completeness(s)"][1] is False
    assert abs(out["completeness(s)"][0] - 2 / 3) < 1e-12
    assert out["completeness(k)"] == (1.0, True)
    assert out["distinctness(k)"][1] is False
    assert out["min(v)"] == (10.0, True)
    assert out["max(v)"] == (30.0, False)
    assert out["containment(s)"] == (1.0, True)
    assert out["pattern(s)"] == (1.0, True)


def test_pattern_ignores_nulls(spark):
    df = spark.createDataFrame([("x1",), (None,), ("zz",)], "s string")
    out = _rows(check_expectations(df, [pattern_conformance("s", r"^x\d$", 0.5)]))
    # 1 of 2 non-null values matches -> 0.5 meets threshold
    assert out["pattern(s)"] == (0.5, True)


def test_expectations_single_scan(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    plan = (
        check_expectations(df, [completeness("k"), min_bound("v", 0.0)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Range (0, 100") == 1, plan


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (3, "bbb"), (3, "aa")], "k int, s string"
    )
    out = {r["col_name"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    k, s = out["k"], out["s"]
    assert (k["n"], k["nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_s"], k["max_s"]) == ("1", "3")
    assert k["avg_len"] == 1.0
    assert (s["n"], s["nulls"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_s"], s["max_s"]) == ("aa", "bbb")
    assert abs(s["avg_len"] - 7 / 3) < 1e-12


def test_profile_single_scan(spark):
    df = spark.range(50).select(F.col("id").alias("a"), (F.col("id") * 2).alias("b"))
    plan = (
        profile_columns(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Range (0, 50") == 1, plan


def test_k_anonymity_report(spark):
    from flnr_wins_spark.operators.dataquality import k_anonymity_report

    df = spark.createDataFrame(
        [
            ("z1", "A"), ("z1", "A"), ("z1", "B"),       # size 3, l=2
            ("z2", "A"),                                  # size 1 -> violates k
            ("z3", "C"), ("z3", "C"), ("z3", "C"),        # l=1 -> violates l
        ],
        "zip string, diagnosis string",
    )
    out = {r.zip: r for r in k_anonymity_report(df, ["zip"], "diagnosis", k=2, l=2).collect()}
    assert (out["z1"].class_size, out["z1"].l_div) == (3, 2)
    assert not out["z1"].violates_k and not out["z1"].violates_l
    assert out["z2"].violates_k and out["z2"].violates_l
    assert out["z3"].class_size == 3 and out["z3"].violates_l and not out["z3"].violates_k


def test_empty_input_fails_closed(spark):
    from flnr_wins_spark.operators.dataquality import (
        check_expectations,
        completeness,
        profile_columns,
    )

    df = spark.createDataFrame([], "k int, s string")
    out = check_expectations(df, [completeness("k")]).collect()[0]
    # no evidence -> NULL metric -> passed is NULL-falsy, never True
    assert out.metric is None and not out.passed
    prof = {r.col_name: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert prof["k"].n == 0 and prof["k"].avg_len is None


class TestDpCounts:
    def test_noise_is_sticky_and_partition_invariant(self, spark):
        """Content-addressed noise: identical across re-runs and
        partitionings (re-drawing would let run-differencing cancel the
        noise and leak the true count)."""
        from flnr_wins_spark.operators.dataquality import dp_group_counts

        df = spark.createDataFrame(
            [(i, f"g{i % 7}") for i in range(500)], "id long, grp string"
        )
        a = sorted(map(tuple, dp_group_counts(df, "grp").collect()))
        b = sorted(map(tuple, dp_group_counts(df.repartition(13), "grp").collect()))
        assert a == b

    def test_noise_scale_tracks_epsilon(self, spark):
        """Laplace(b): mean |noise| = b = epsilon_inv. Across many groups
        the empirical mean must sit near b, and doubling epsilon_inv
        exactly doubles every (content-addressed) draw."""
        from flnr_wins_spark.operators.dataquality import dp_group_counts

        df = spark.createDataFrame(
            [(i, f"g{i}") for i in range(400)], "id long, grp string"
        )
        n2 = {r.g: r.noise_e9 for r in dp_group_counts(df, "grp", epsilon_inv=2).collect()}
        n4 = {r.g: r.noise_e9 for r in dp_group_counts(df, "grp", epsilon_inv=4).collect()}
        assert all(n4[g] == 2 * n2[g] for g in n2)
        mean_abs = sum(abs(v) for v in n2.values()) / len(n2) / 1e9
        assert 1.5 < mean_abs < 2.6  # b = 2, 400 draws
        # roughly symmetric
        pos = sum(1 for v in n2.values() if v > 0)
        assert 140 < pos < 260

    def test_noisy_count_composition(self, spark):
        from flnr_wins_spark.operators.dataquality import dp_group_counts

        df = spark.createDataFrame([(i, "only") for i in range(10)], "id long, grp string")
        r = dp_group_counts(df, "grp").collect()[0]
        assert r.n == 10
        assert r.noisy_count_e9 == 10 * 1_000_000_000 + r.noise_e9


class TestFdCheck:
    def test_holds_violations_and_null_as_value(self, spark):
        from flnr_wins_spark.operators.dataquality import fd_check

        df = spark.createDataFrame(
            [
                (1, "a", "x"), (2, "a", "x"),      # a -> x consistent
                (3, "b", "y"), (4, "b", "z"),      # b violates rhs
                (5, "c", None), (6, "c", None),    # c -> NULL consistent
                (7, "d", "w"), (8, "d", None),     # d: NULL is a SECOND value
            ],
            "id long, l string, r string",
        )
        out = {(r.lhs, r.rhs): r for r in fd_check(
            df, [("id", "l"), ("l", "r")]
        ).collect()}
        assert out[("id", "l")].holds  # unique key determines anything
        lr = out[("l", "r")]
        assert not lr.holds
        assert lr.n_groups == 4 and lr.n_violating == 2  # b and d violate
