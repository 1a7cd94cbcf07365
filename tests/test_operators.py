"""Unit tests for the reference-parity operators (SURVEY.md §2b, semantics
pinned by FIXTURES.md §B edge cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flnr_wins_spark.operators import (
    append_no_test,
    blank_to_null,
    conditional_update,
    enrich,
    frequency,
    reject_duplicates,
    reject_unmatched,
)
from flnr_wins_spark.operators.asof import asof_join
from flnr_wins_spark.operators.reject import flag_where_null


def rows(df, *cols):
    return sorted(
        [tuple(r) for r in df.select(*cols).collect()],
        key=lambda t_: tuple((v is not None, v) for v in t_),
    )


TEMPLATE = T.StructType(
    [
        T.StructField("TAG", T.StringType()),
        T.StructField("CODE", T.StringType()),
        T.StructField("N", T.LongType()),
    ]
)


class TestAppendNoTest:
    def test_name_mapping_missing_null_extra_dropped(self, spark):
        # wts.py:151-155 "NO_TEST": map by name, null missing, drop extras
        a = spark.createDataFrame([("t1", 1, "junk")], "TAG string, N int, EXTRA string")
        b = spark.createDataFrame([("t2", "c2")], "TAG string, CODE string")
        out = append_no_test(TEMPLATE, a, b)
        assert out.columns == ["TAG", "CODE", "N"]
        assert out.schema["N"].dataType == T.LongType()  # int -> bigint cast
        assert rows(out, "TAG", "CODE", "N") == [("t1", None, 1), ("t2", "c2", None)]

    def test_case_insensitive_names(self, spark):
        a = spark.createDataFrame([("t1",)], "tag string")
        out = append_no_test(TEMPLATE, a)
        assert rows(out, "TAG") == [("t1",)]


class TestConditionalUpdate:
    def test_first_match_wins_and_keep_otherwise(self, spark):
        # wts.py:168-171 RV%/RS% prefix cases; unselected rows keep value
        df = spark.createDataFrame(
            [("RV1", "old"), ("RS2", "old"), ("XX3", "old")], "TAG string, CODE string"
        )
        out = conditional_update(
            df,
            "CODE",
            [
                (F.col("TAG").like("RV%"), "EA83030000"),
                (F.col("TAG").like("R%"), "SHOULD_NOT_WIN_FOR_RV"),
            ],
        )
        got = dict(rows(out, "TAG", "CODE"))
        assert got == {"RV1": "EA83030000", "RS2": "SHOULD_NOT_WIN_FOR_RV", "XX3": "old"}

    def test_none_value_becomes_null(self, spark):
        # wts.py:190-192: CalculateField 'None' -> NULL
        df = spark.createDataFrame([("a", "x")], "TAG string, CODE string")
        out = conditional_update(df, "CODE", [(F.col("TAG") == "a", None)])
        assert rows(out, "CODE") == [(None,)]


class TestBlankToNull:
    def test_blank_vs_null_distinct(self, spark):
        # FIXTURES.md edge 2: '' and NULL coexist; only '' is converted
        df = spark.createDataFrame(
            [Row(TAG=""), Row(TAG=None), Row(TAG="x")],
            "TAG string",
        )
        out = blank_to_null(df, "TAG")
        assert rows(out, "TAG") == [(None,), (None,), ("x",)]


class TestEnrich:
    def test_left_outer_null_fill_and_null_lookup_value(self, spark):
        # wts.py:176-179 KEEP_ALL; FIXTURES.md edge 5: matched-but-NULL descr
        base = spark.createDataFrame(
            [("k1", "d0"), ("k2", "d0"), ("k3", "d0")], "KEY string, DESCR string"
        )
        lookup = spark.createDataFrame(
            [("k1", "descr-1"), ("k2", None)], "CODE string, PNTS_DESCR string"
        )
        out = enrich(base, lookup, on=("KEY", "CODE"), mapping={"DESCR": "PNTS_DESCR"})
        assert out.columns == ["KEY", "DESCR"]
        assert dict(rows(out, "KEY", "DESCR")) == {"k1": "descr-1", "k2": None, "k3": None}

    def test_new_column_appended(self, spark):
        base = spark.createDataFrame([("k1",)], "KEY string")
        lookup = spark.createDataFrame([("k1", "v")], "CODE string, VAL string")
        out = enrich(base, lookup, on=("KEY", "CODE"), mapping={"NEW": "VAL"})
        assert out.columns == ["KEY", "NEW"]
        assert rows(out, "NEW") == [("v",)]


class TestFrequency:
    def test_group_count(self, spark):
        df = spark.createDataFrame([("a",), ("a",), ("b",)], "TAG string")
        out = frequency(df, "TAG")
        assert dict(rows(out, "TAG", "FREQUENCY")) == {"a": 2, "b": 1}


class TestRejectDuplicates:
    def test_all_members_rejected_no_survivor(self, spark):
        # FIXTURES.md edge 3 / wts.py:249-256: groups of 2 and 3 fully
        # rejected, singletons kept
        df = spark.createDataFrame(
            [(i, tag) for i, tag in enumerate(["a", "a", "b", "c", "c", "c", "d"])],
            "OBJECTID long, TAG string",
        )
        kept, rejected = reject_duplicates(df, "TAG")
        assert sorted(r.TAG for r in kept.collect()) == ["b", "d"]
        assert sorted(r.TAG for r in rejected.collect()) == ["a", "a", "c", "c", "c"]
        assert set(r.REJECT_FLAG for r in rejected.collect()) == {"Duplicate TAG"}

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "OBJECTID long, TAG string")
        kept, rejected = reject_duplicates(df, "TAG")
        assert kept.count() == 0 and rejected.count() == 0

    def test_null_keys_are_kept(self, spark):
        # The reference's frequency equi-join never matches NULL tags, so
        # FREQUENCY stays NULL and 'FREQUENCY > 1' is false — NULL-keyed rows
        # are kept even when several of them exist.
        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "a"), (4, "a"), (5, "b")],
            "OBJECTID long, TAG string",
        )
        kept, rejected = reject_duplicates(df, "TAG")
        assert sorted(r.OBJECTID for r in kept.collect()) == [1, 2, 5]
        assert sorted(r.OBJECTID for r in rejected.collect()) == [3, 4]


class TestRejectUnmatched:
    def test_semi_anti_split_and_null_keys(self, spark):
        # wts.py:257-265; NULL keys never equi-match -> rejected
        df = spark.createDataFrame(
            [("t1",), ("t2",), (None,)], "TAG string"
        )
        lookup = spark.createDataFrame([("t1",), ("t1",)], "CODE string")
        kept, rejected = reject_unmatched(df, lookup, on=("TAG", "CODE"), lookup_name="POD")
        assert rows(kept, "TAG") == [("t1",)]
        assert rows(rejected, "TAG") == [(None,), ("t2",)]
        assert rejected.select("REJECT_FLAG").distinct().collect()[0][0] == "TAG not found in POD"

    def test_flag_precedence(self, spark):
        # wts.py:268-269: only null-flagged rows receive the new flag
        df = spark.createDataFrame(
            [("a", "Duplicate TAG"), ("b", None)], "TAG string, REJECT_FLAG string"
        )
        out = flag_where_null(df, "not found")
        assert dict(rows(out, "TAG", "REJECT_FLAG")) == {
            "a": "Duplicate TAG",
            "b": "not found",
        }


class TestAsofJoin:
    def test_latest_at_or_before(self, spark):
        left = spark.createDataFrame(
            [(1, "k", 100), (2, "k", 250), (3, "k", 50), (4, "z", 100)],
            "id long, key string, t long",
        )
        right = spark.createDataFrame(
            [("k", 100, "v100"), ("k", 200, "v200")], "key string, t long, val string"
        )
        out = asof_join(
            left, right, left_key="key", right_key="key",
            left_time="t", right_time="t", value_col="val", out_col="v",
        )
        got = {r.id: r.v for r in out.collect()}
        # inclusive: t=100 matches v100; t=250 -> v200; t=50 -> None; no key -> None
        assert got == {1: "v100", 2: "v200", 3: None, 4: None}

    def test_strict(self, spark):
        left = spark.createDataFrame([(1, "k", 100)], "id long, key string, t long")
        right = spark.createDataFrame([("k", 100, "v100")], "key string, t long, val string")
        out = asof_join(
            left, right, left_key="key", right_key="key",
            left_time="t", right_time="t", value_col="val", out_col="v", strict=True,
        )
        assert out.collect()[0].v is None

    def test_tolerance_nulls_stale_matches(self, spark):
        import datetime as dt

        def ts(h):
            return dt.datetime(2024, 1, 1, h)

        left = spark.createDataFrame(
            [(1, "k", ts(10)), (2, "k", ts(13)), (3, "k", ts(23))],
            "id long, key string, t timestamp_ntz",
        )
        right = spark.createDataFrame(
            [("k", ts(9), "v9"), ("k", ts(12), "v12")],
            "key string, t timestamp_ntz, val string",
        )
        out = asof_join(
            left, right, left_key="key", right_key="key",
            left_time="t", right_time="t", value_col="val", out_col="v",
            tolerance_seconds=2 * 3600,
        )
        got = {r.id: r.v for r in out.collect()}
        # 10:00 matches 09:00 (1h old, inside 2h); 13:00 matches 12:00;
        # 23:00's latest match (12:00) is 11h stale -> NULL
        assert got == {1: "v9", 2: "v12", 3: None}


class TestSaltedJoin:
    def _data(self, spark):
        # one hot key (k0: 50 rows), long tail, plus a key absent from small
        big = spark.createDataFrame(
            [(i, "k0" if i < 50 else f"k{i}") for i in range(60)]
            + [(99, "missing")],
            "row_id long, key string",
        )
        small = spark.createDataFrame(
            [("k0", "hot"), ("k55", "tail")], "key string, val string"
        )
        return big, small

    def test_inner_equals_unsalted(self, spark):
        from flnr_wins_spark.operators.skew import salted_join

        big, small = self._data(spark)
        got = salted_join(big, small, on="key", salt_col="row_id", buckets=8)
        want = big.join(small, "key")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_left_preserves_unmatched(self, spark):
        from flnr_wins_spark.operators.skew import salted_join

        big, small = self._data(spark)
        got = salted_join(big, small, on="key", salt_col="row_id", how="left", buckets=4)
        want = big.join(small, "key", "left")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        assert got.count() == 61

    def test_rejects_unsupported_how(self, spark):
        import pytest as _pytest

        from flnr_wins_spark.operators.skew import salted_join

        big, small = self._data(spark)
        with _pytest.raises(ValueError):
            salted_join(big, small, on="key", salt_col="row_id", how="full")


class TestGridSaltedJoin:
    def _data(self, spark):
        # k0 hot on BOTH sides (30 x 20 = 600 pairs — the quadratic
        # case), a tail key on each side, a key absent from the right,
        # NULL keys on both sides, and a legitimately SHARED non-key
        # column name ('v') — the layout a plain join accepts
        left = spark.createDataFrame(
            [(i, "k0", f"l{i}") for i in range(30)]
            + [(100, "t1", "lt"), (101, "only-left", "lo"), (102, None, "ln")],
            "lid long, key string, v string",
        )
        right = spark.createDataFrame(
            [(i, "k0", f"r{i}") for i in range(20)]
            + [(200, "t1", "rt"), (201, None, "rn")],
            "rid long, key string, v string",
        )
        return left, right

    def test_equals_plain_join_hot_keys_scoped(self, spark):
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        got = grid_salted_join(
            left, right, on="key", grid=(4, 3), hot_keys=["k0"]
        )
        want = left.join(right, "key")
        assert got.columns == want.columns
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert got.count() == 601  # 600 grid pairs + 1 tail pair

    def test_equals_plain_join_unscoped(self, spark):
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        got = grid_salted_join(left, right, on="key", grid=(2, 5))
        want = left.join(right, "key")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_salt_col_and_degenerate_grids(self, spark):
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        want = sorted(map(tuple, left.join(right, "key").collect()))
        for grid in ((1, 1), (1, 4), (4, 1)):
            got = grid_salted_join(
                left, right, on="key", grid=grid,
                left_salt_col="lid", right_salt_col="rid",
            )
            assert sorted(map(tuple, got.collect())) == want

    def test_pairs_meet_in_exactly_one_cell(self, spark):
        # the exactness argument: no duplicate (lid, rid) pairs
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        got = grid_salted_join(left, right, on="key", grid=(8, 8))
        pairs = [(r.lid, r.rid) for r in got.select("lid", "rid").collect()]
        assert len(pairs) == len(set(pairs))

    def test_left_equals_plain_left_join(self, spark):
        """how='left' decomposes to grid-inner + distinct-key anti probe:
        matched pairs once each, matchless left rows (incl. the
        'only-left' key and NULL keys) null-padded exactly once."""
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)

        def _key(row):  # rows carry NULLs — None sorts before values
            return tuple((x is None, x) for x in row)

        want = sorted(
            map(tuple, left.join(right, "key", "left").collect()), key=_key
        )
        for hot in (None, ["k0"]):
            got = grid_salted_join(
                left, right, on="key", how="left", grid=(4, 3),
                hot_keys=hot,
            )
            assert sorted(map(tuple, got.collect()), key=_key) == want
        # 600 grid pairs + 1 tail pair + 2 unmatched (only-left, NULL)
        assert len(want) == 603

    def test_full_equals_plain_full_join(self, spark):
        """how='full' adds the transpose probe: matched pairs once each,
        matchless LEFT rows (only-left, NULL left keys) null-padded
        right, matchless RIGHT rows (NULL right keys; add an only-right
        key) null-padded left — each exactly once."""
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        right = right.union(
            right.sparkSession.createDataFrame(
                [(300, "only-right", "ro")], right.schema
            )
        )

        def _key(row):  # rows carry NULLs — None sorts before values
            return tuple((x is None, x) for x in row)

        want = sorted(
            map(tuple, left.join(right, "key", "full").collect()), key=_key
        )
        for hot in (None, ["k0"]):
            got = grid_salted_join(
                left, right, on="key", how="full", grid=(4, 3),
                hot_keys=hot,
            )
            assert sorted(map(tuple, got.collect()), key=_key) == want
        # 600 grid pairs + 1 tail pair + 2 left-unmatched (only-left,
        # NULL) + 2 right-unmatched (only-right, NULL)
        assert len(want) == 605

    def test_right_equals_plain_right_join(self, spark):
        """how='right' is the transpose of 'left' without swapping the
        caller's layout: grid inner + ONLY the right-side anti probe —
        matched pairs once each, matchless RIGHT rows (an only-right
        key; NULL right keys) left-null-padded exactly once, matchless
        left rows dropped."""
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        right = right.union(
            right.sparkSession.createDataFrame(
                [(300, "only-right", "ro")], right.schema
            )
        )

        def _key(row):  # rows carry NULLs — None sorts before values
            return tuple((x is None, x) for x in row)

        want = sorted(
            map(tuple, left.join(right, "key", "right").collect()), key=_key
        )
        for hot in (None, ["k0"]):
            got = grid_salted_join(
                left, right, on="key", how="right", grid=(4, 3),
                hot_keys=hot,
            )
            assert sorted(map(tuple, got.collect()), key=_key) == want
        # 600 grid pairs + 1 tail pair + 2 right-unmatched (only-right,
        # NULL right key); only-left and NULL-left rows are dropped
        assert len(want) == 603

    def test_rejects_outer_and_bad_grid_and_collision(self, spark):
        import pytest as _pytest

        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        with _pytest.raises(ValueError, match="inner/left/right/full"):
            grid_salted_join(left, right, on="key", how="left_semi")
        with _pytest.raises(ValueError, match="grid dims"):
            grid_salted_join(left, right, on="key", grid=(0, 4))
        with _pytest.raises(ValueError, match="collision"):
            grid_salted_join(
                left.withColumn("_gsl", left.lid), right, on="key"
            )

    def test_empty_hot_keys_is_plain_join(self, spark):
        from flnr_wins_spark.operators.skew import grid_salted_join

        left, right = self._data(spark)
        got = grid_salted_join(left, right, on="key", hot_keys=[])
        want = left.join(right, "key")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


class TestIntervalJoin:
    def test_window_boundaries(self, spark):
        from datetime import datetime

        from flnr_wins_spark.operators.interval import interval_join

        mk = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
        left = spark.createDataFrame(
            [(1, "u", mk(0)), (2, "u", mk(30)), (3, "u", mk(59)), (4, "v", mk(30))],
            "id long, key string, ts timestamp",
        )
        out = interval_join(left, left, key="key", time_col="ts", window_seconds=30)
        pairs = sorted((r.id, r.id_r) for r in out.collect())
        # r.ts <= l.ts < r.ts + 30s (half-open); key must match:
        # (1,1) self, (2,2), (3,3), (4,4), and (3 at 59s pairs with 2 at 30s)
        assert pairs == [(1, 1), (2, 2), (3, 2), (3, 3), (4, 4)]

    def test_crosses_bucket_boundary(self, spark):
        from datetime import datetime

        from flnr_wins_spark.operators.interval import interval_join

        # 58s and 62s are in different 30s buckets but within one window
        left = spark.createDataFrame(
            [(1, "u", datetime(2024, 1, 1, 0, 0, 58)),
             (2, "u", datetime(2024, 1, 1, 0, 1, 2))],
            "id long, key string, ts timestamp",
        )
        out = interval_join(left, left, key="key", time_col="ts", window_seconds=30)
        pairs = sorted((r.id, r.id_r) for r in out.collect())
        assert (2, 1) in pairs


class TestSnapshotDiff:
    @pytest.fixture()
    def snaps(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
            "k long, s string, v double",
        )
        new = spark.createDataFrame(
            [(2, "b", 20.0), (3, "c", 99.0), (4, "x", 40.0), (5, "e", 50.0)],
            "k long, s string, v double",
        )
        return old, new

    def test_change_types(self, spark, snaps):
        from flnr_wins_spark.operators.merge import snapshot_diff

        old, new = snaps
        got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
        # 1 deleted, 2 unchanged (absent), 3 updated, 4 NULL->'x' updated, 5 inserted
        assert got == {1: "delete", 3: "update", 4: "update", 5: "insert"}

    def test_compare_cols_subset(self, spark, snaps):
        from flnr_wins_spark.operators.merge import snapshot_diff

        old, new = snaps
        got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
        assert got == {1: "delete", 3: "update", 5: "insert"}  # 4's v unchanged


class TestMergeUpsert:
    def test_update_insert_delete(self, spark):
        from flnr_wins_spark.operators.merge import merge_upsert

        target = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
        )
        source = spark.createDataFrame([(2, 99.0), (4, 40.0)], "k long, v double")
        deletes = spark.createDataFrame([(3,)], "k long")
        got = {r.k: r.v for r in merge_upsert(target, source, ["k"], deletes).collect()}
        assert got == {1: 10.0, 2: 99.0, 4: 40.0}


class TestIncrementalAgg:
    def test_merge_equals_rebuild_and_zero_groups_drop(self, spark):
        from flnr_wins_spark.operators.merge import incremental_agg

        base = spark.createDataFrame(
            [(1, 10), (1, 20), (2, 5), (3, 7)], "k long, v long"
        )
        prev = base.groupBy("k").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
        )
        # update k=1's 10 -> 11 (as -1/+1 pair), delete all of k=2, insert k=9
        delta = spark.createDataFrame(
            [(1, -1, 10), (1, 1, 11), (2, -1, 5), (9, 1, 100)],
            "k long, sign int, sv long",
        )
        got = {r.k: (r.n, r.sv) for r in incremental_agg(prev, delta, ["k"], ["sv"]).collect()}
        assert got == {1: (2, 31), 3: (1, 7), 9: (1, 100)}  # k=2 dropped at n=0

    def test_new_group_from_delta_only(self, spark):
        from flnr_wins_spark.operators.merge import incremental_agg

        prev = spark.createDataFrame([], "k long, n bigint, sv bigint")
        delta = spark.createDataFrame([(5, 1, 50), (5, 1, 60)], "k long, sign int, sv long")
        got = {r.k: (r.n, r.sv) for r in incremental_agg(prev, delta, ["k"], ["sv"]).collect()}
        assert got == {5: (2, 110)}


class TestScd2:
    def _hist(self, spark, df, batch, prev=None):
        from flnr_wins_spark.operators.merge import scd2_apply

        if prev is None:
            prev = (
                df.withColumn("valid_from", F.lit(1))
                .withColumn("valid_to", F.lit(None).cast("int"))
                .withColumn("is_current", F.lit(True))
                .limit(0)
            )
        return scd2_apply(prev, df, ["k"], batch_id=batch)

    def test_full_lifecycle(self, spark):
        b1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, s string")
        b2 = spark.createDataFrame([(1, "a"), (2, "B2"), (4, "d")], "k long, s string")
        h1 = self._hist(spark, b1, 1)
        h2 = self._hist(spark, b2, 2, prev=h1)
        rows = {(r.k, r.valid_from): r for r in h2.collect()}
        assert rows[(1, 1)].is_current and rows[(1, 1)].valid_to is None   # unchanged
        assert not rows[(2, 1)].is_current and rows[(2, 1)].valid_to == 2  # closed
        assert rows[(2, 2)].is_current and rows[(2, 2)].s == "B2"          # reopened
        assert not rows[(3, 1)].is_current and rows[(3, 1)].valid_to == 2  # soft delete
        assert rows[(4, 2)].is_current                                     # new key
        assert len(rows) == 5

    def test_closed_rows_pass_through(self, spark):
        b1 = spark.createDataFrame([(1, "a")], "k long, s string")
        b2 = spark.createDataFrame([(1, "b")], "k long, s string")
        b3 = spark.createDataFrame([(1, "c")], "k long, s string")
        h = self._hist(spark, b3, 3, prev=self._hist(spark, b2, 2, prev=self._hist(spark, b1, 1)))
        versions = sorted((r.valid_from, r.valid_to, r.is_current, r.s) for r in h.collect())
        assert versions == [(1, 2, False, "a"), (2, 3, False, "b"), (3, None, True, "c")]


class TestParityReviewFixes:
    def test_align_to_schema_best_effort_cast_yields_null(self, spark):
        """Review finding: ANSI-mode cast threw on unparsable values at
        action time; NO_TEST semantics load NULL and continue."""
        from pyspark.sql import types as T

        from flnr_wins_spark.operators.append import align_to_schema

        df = spark.createDataFrame([("N/A",), ("42",)], "k string")
        schema = T.StructType([T.StructField("k", T.LongType())])
        got = sorted(r.k for r in align_to_schema(df, schema).collect()
                     if r.k is not None)
        vals = [r.k for r in align_to_schema(df, schema).collect()]
        assert got == [42] and None in vals

    def test_align_to_schema_case_ambiguity_raises(self, spark):
        import pytest
        from pyspark.sql import types as T

        from flnr_wins_spark.operators.append import align_to_schema

        df = spark.createDataFrame([(1, 2)], ["Tag", "TAG"])
        schema = T.StructType([T.StructField("tag", T.LongType())])
        with pytest.raises(ValueError, match="collide case-insensitively"):
            align_to_schema(df, schema)

    def test_enrich_duplicate_lookup_does_not_multiply_rows(self, spark):
        """Review finding: a duplicated lookup key multiplied base rows,
        making downstream duplicate-QA reject valid unique source rows.
        The lookup now dedups deterministically (first by contributed
        columns)."""
        from flnr_wins_spark.operators.enrich import enrich

        base = spark.createDataFrame([(1, "K1"), (2, "K2")], "id long, tag string")
        lookup = spark.createDataFrame(
            [("K1", "b-desc"), ("K1", "a-desc"), ("K2", "x")],
            "code string, descr string",
        )
        out = enrich(base, lookup, on=("tag", "code"), mapping={"d": "descr"}).collect()
        assert len(out) == 2  # no row multiplication
        got = {r.id: r.d for r in out}
        assert got[1] == "a-desc"  # deterministic survivor: sorted first
        assert got[2] == "x"

    def test_reject_operators_respect_existing_flag(self, spark):
        """Review finding: reject_unmatched's unconditional withColumn
        clobbered pre-existing REJECT_FLAG values, violating the
        reference's 'REJECT_FLAG IS NULL' precedence rule."""
        from flnr_wins_spark.operators.reject import reject_unmatched

        df = spark.createDataFrame(
            [(1, "A", "earlier flag"), (2, "B", None)],
            "id long, tag string, REJECT_FLAG string",
        )
        lookup = spark.createDataFrame([("Z",)], "code string")
        _, rejected = reject_unmatched(df, lookup, on=("tag", "code"), flag="not found")
        got = {r.id: r.REJECT_FLAG for r in rejected.collect()}
        assert got == {1: "earlier flag", 2: "not found"}
