"""Versioned-snapshot (time travel) tests — sources/snapshots.py."""

from __future__ import annotations

import pytest

from flnr_wins_spark.sources.snapshots import (
    read_snapshot,
    snapshot_history,
    vacuum,
    write_snapshot,
)


def test_write_read_latest_and_explicit_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = write_snapshot(spark.range(3), path)
    v2 = write_snapshot(spark.range(10), path)
    assert (v1, v2) == (1, 2)
    assert read_snapshot(spark, path).count() == 10
    assert read_snapshot(spark, path, version=1).count() == 3
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, version=9)


def test_incomplete_version_is_invisible(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_snapshot(spark.range(5), path)
    # simulate a dead writer: v2 data exists but its _SUCCESS marker is gone
    write_snapshot(spark.range(99), path)
    (tmp_path / "tbl" / "v2" / "_SUCCESS").unlink()
    assert read_snapshot(spark, path).count() == 5
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, version=2)
    # history lists only complete versions
    assert [h["version"] for h in snapshot_history(spark, path)] == [1]
    # the NEXT write must not collide with the dead v2 directory
    v3 = write_snapshot(spark.range(7), path)
    assert v3 == 3 and read_snapshot(spark, path).count() == 7


def test_time_travel_by_timestamp(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_snapshot(spark.range(1), path)
    write_snapshot(spark.range(2), path)
    hist = snapshot_history(spark, path)
    t1 = hist[0]["committed_at_ms"]
    assert read_snapshot(spark, path, as_of_ms=t1).count() == 1
    assert read_snapshot(spark, path, as_of_ms=hist[1]["committed_at_ms"]).count() == 2
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, as_of_ms=t1 - 10_000)
    with pytest.raises(ValueError):
        read_snapshot(spark, path, version=1, as_of_ms=t1)


def test_vacuum_keeps_newest_and_readers_still_work(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for n in (1, 2, 3, 4):
        write_snapshot(spark.range(n), path)
    deleted = vacuum(spark, path, keep_last=2)
    assert deleted == [1, 2]
    assert [h["version"] for h in snapshot_history(spark, path)] == [3, 4]
    assert read_snapshot(spark, path, version=3).count() == 3
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, version=1)


def test_vacuum_is_noop_while_first_write_in_flight(spark, tmp_path):
    """Review finding: with zero complete versions, vacuum's in-flight
    guard used to collapse and delete the very first write's directory
    out from under the running job. It must be a no-op instead."""
    path = str(tmp_path / "tbl")
    write_snapshot(spark.range(5), path)
    (tmp_path / "tbl" / "v1" / "_SUCCESS").unlink()  # simulate in-flight v1
    assert vacuum(spark, path, keep_last=1) == []
    assert (tmp_path / "tbl" / "v1").exists()


class TestMergeSnapshot:
    """merge_snapshot: Delta-style MERGE-with-schema-evolution committed as
    the table's next immutable version."""

    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, score double",
        )

    def test_bootstrap_then_upsert(self, spark, tmp_path):
        from flnr_wins_spark.sources.snapshots import merge_snapshot

        path = str(tmp_path / "tbl")
        v1 = merge_snapshot(spark, path, self._base(spark), ["id"])
        assert v1 == 1
        change = spark.createDataFrame(
            [(2, "B", 21.0), (4, "d", 40.0)], "id long, name string, score double"
        )
        v2 = merge_snapshot(spark, path, change, ["id"])
        assert v2 == 2
        got = {r.id: (r.name, r.score) for r in read_snapshot(spark, path).collect()}
        assert got == {1: ("a", 10.0), 2: ("B", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}
        # time travel still sees the pre-merge table
        assert read_snapshot(spark, path, version=1).count() == 3

    def test_schema_evolution_adds_column_and_preserves_target_only(
        self, spark, tmp_path
    ):
        from flnr_wins_spark.sources.snapshots import merge_snapshot

        path = str(tmp_path / "tbl")
        merge_snapshot(spark, path, self._base(spark), ["id"])
        # changeset ADDS lang, OMITS score (target-only)
        change = spark.createDataFrame(
            [(2, "B", "en"), (4, "d", "fr")], "id long, name string, lang string"
        )
        merge_snapshot(spark, path, change, ["id"])
        cur = read_snapshot(spark, path)
        assert cur.columns == ["id", "name", "score", "lang"]
        got = {r.id: (r.name, r.score, r.lang) for r in cur.collect()}
        assert got == {
            1: ("a", 10.0, None),   # untouched: new column NULL
            2: ("B", 20.0, "en"),   # updated: target-only score PRESERVED
            3: ("c", 30.0, None),
            4: ("d", None, "fr"),   # insert: target-only score NULL
        }
        # old version keeps the OLD schema — evolution never rewrites history
        assert read_snapshot(spark, path, version=1).columns == [
            "id", "name", "score",
        ]

    def test_type_widening_and_lossy_rejection(self, spark, tmp_path):
        from flnr_wins_spark.operators.merge import merge_upsert_evolve

        target = spark.createDataFrame([(1, 10)], "id long, n int")
        source = spark.createDataFrame([(2, 2**40)], "id long, n long")
        out = merge_upsert_evolve(target, source, ["id"])
        assert dict(out.dtypes)["n"] == "bigint"
        assert {r.id: r.n for r in out.collect()} == {1: 10, 2: 2**40}
        # lossy string->int must raise, not silently cast
        bad = spark.createDataFrame([(2, "x")], "id long, n string")
        with pytest.raises(ValueError, match="cannot reconcile"):
            merge_upsert_evolve(target, bad, ["id"])

    def test_delete_keys_applied(self, spark, tmp_path):
        from flnr_wins_spark.sources.snapshots import merge_snapshot

        path = str(tmp_path / "tbl")
        merge_snapshot(spark, path, self._base(spark), ["id"])
        change = spark.createDataFrame([(4, "d", 40.0)], "id long, name string, score double")
        dels = spark.createDataFrame([(1,)], "id long")
        merge_snapshot(spark, path, change, ["id"], delete_keys=dels)
        assert {r.id for r in read_snapshot(spark, path).collect()} == {2, 3, 4}
