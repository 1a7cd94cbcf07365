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
