"""Partition-level MVCC table tests — sources/ptable.py (manifest-committed
partitioned snapshots with delta-proportional merge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flnr_wins_spark.sources.ptable import (
    merge_ptable,
    ptable_history,
    read_ptable,
    vacuum_ptable,
    write_ptable,
)


def _base(spark):
    return spark.createDataFrame(
        [
            (1, "en", 10.0), (2, "en", 20.0),
            (3, "fr", 30.0), (4, "fr", 40.0),
            (5, "de", 50.0),
        ],
        "id long, lang string, score double",
    )


def test_write_read_roundtrip_with_partition_column(spark, tmp_path):
    path = str(tmp_path / "tbl")
    k = write_ptable(_base(spark), path, "lang")
    assert k == 1
    got = read_ptable(spark, path)
    assert {tuple(r) for r in got.select("id", "lang", "score").collect()} == {
        (1, "en", 10.0), (2, "en", 20.0), (3, "fr", 30.0),
        (4, "fr", 40.0), (5, "de", 50.0),
    }
    # manifest-level pruning reads ONLY the named partition dirs
    fr = read_ptable(spark, path, partitions=["fr"])
    assert {r.id for r in fr.collect()} == {3, 4}


def test_merge_touches_only_changed_partitions(spark, tmp_path):
    """The reason this layout exists: untouched partitions carry into the
    new manifest BY REFERENCE — their files are never read or rewritten."""
    import glob

    path = str(tmp_path / "tbl")
    write_ptable(_base(spark), path, "lang")
    before = set(glob.glob(f"{path}/stage/m1/lang=fr/*.parquet"))
    change = spark.createDataFrame(
        [(2, "en", 21.0), (6, "en", 60.0)], "id long, lang string, score double"
    )
    k = merge_ptable(spark, path, change, ["id"])
    assert k == 2
    # fr/de dirs: no new stage written, manifest points at the ORIGINAL m1
    assert set(glob.glob(f"{path}/stage/m1/lang=fr/*.parquet")) == before
    assert glob.glob(f"{path}/stage/m2/lang=fr") == []
    assert glob.glob(f"{path}/stage/m2/lang=en") != []
    got = {r.id: (r.lang, r.score) for r in read_ptable(spark, path).collect()}
    assert got == {
        1: ("en", 10.0), 2: ("en", 21.0), 6: ("en", 60.0),
        3: ("fr", 30.0), 4: ("fr", 40.0), 5: ("de", 50.0),
    }


def test_time_travel_and_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_ptable(_base(spark), path, "lang")
    merge_ptable(
        spark,
        path,
        spark.createDataFrame([(2, "en", 99.0)], "id long, lang string, score double"),
        ["id"],
    )
    assert ptable_history(spark, path) == [1, 2]
    old = {r.id: r.score for r in read_ptable(spark, path, manifest=1).collect()}
    new = {r.id: r.score for r in read_ptable(spark, path).collect()}
    assert old[2] == 20.0 and new[2] == 99.0


def test_schema_evolution_nullfills_untouched_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_ptable(_base(spark), path, "lang")
    change = spark.createDataFrame(
        [(2, "en", "web")], "id long, lang string, origin string"
    )
    merge_ptable(spark, path, change, ["id"])
    cur = read_ptable(spark, path)
    assert "origin" in cur.columns and "score" in cur.columns
    got = {r.id: (r.score, r.origin) for r in cur.collect()}
    assert got[2] == (20.0, "web")   # target-only score preserved
    assert got[3] == (30.0, None)    # untouched fr partition null-fills


def test_deletes_and_partition_removal(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_ptable(_base(spark), path, "lang")
    dels = spark.createDataFrame([(5, "de")], "id long, lang string")
    empty_change = spark.createDataFrame(
        [], "id long, lang string, score double"
    )
    merge_ptable(spark, path, empty_change, ["id"], delete_keys=dels)
    cur = read_ptable(spark, path)
    assert {r.id for r in cur.collect()} == {1, 2, 3, 4}
    # the all-deleted partition left the manifest entirely
    with pytest.raises(FileNotFoundError):
        read_ptable(spark, path, partitions=["de"])


def test_vacuum_drops_unreferenced_stages_only(spark, tmp_path):
    import os

    path = str(tmp_path / "tbl")
    write_ptable(_base(spark), path, "lang")
    for i in range(3):
        merge_ptable(
            spark,
            path,
            spark.createDataFrame(
                [(2, "en", float(i))], "id long, lang string, score double"
            ),
            ["id"],
        )
    deleted = vacuum_ptable(spark, path, keep_last=2)
    # manifests m3/m4 retained; m1 is STILL referenced (fr/de partitions were
    # never rewritten) so its stage survives; only m2's stage is orphaned
    assert ptable_history(spark, path) == [3, 4]
    assert any(d.endswith("stage/m2") for d in deleted)
    assert os.path.isdir(f"{path}/stage/m1")
    assert not os.path.isdir(f"{path}/stage/m2")
    got = {r.id: r.score for r in read_ptable(spark, path).collect()}
    assert got[2] == 2.0 and got[3] == 30.0


def test_merge_requires_bootstrap_and_partition_column(spark, tmp_path):
    path = str(tmp_path / "tbl")
    src = spark.createDataFrame([(1, "en", 1.0)], "id long, lang string, score double")
    with pytest.raises(FileNotFoundError, match="bootstrap"):
        merge_ptable(spark, path, src, ["id"])
    write_ptable(_base(spark), path, "lang")
    with pytest.raises(ValueError, match="partition column"):
        merge_ptable(spark, path, src.drop("lang"), ["id"])


def test_null_partition_values_rejected_loudly(spark, tmp_path):
    """Review finding (r6): a NULL partition key writes the hive sentinel
    directory and would resurrect as the literal sentinel STRING on read.
    The stage scan must fail loudly (and clean the uncommitted stage)
    before any manifest references it."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "en", 1.0), (2, None, 2.0)], "id long, lang string, score double"
    )
    with pytest.raises(ValueError, match="non-null"):
        write_ptable(df, path, "lang")
    # no manifest committed; a clean retry with valid data works
    assert ptable_history(spark, path) == []
    write_ptable(df.filter("lang IS NOT NULL"), path, "lang")
    assert read_ptable(spark, path).count() == 1


def test_ptable_diff_prunes_unchanged_partitions_and_matches_full_diff(
    spark, tmp_path
):
    """Manifest-level CDC: partitions with identical stage dirs in both
    manifests are provably unchanged and never read; the pruned diff must
    equal the full-table snapshot_diff row for row."""
    from flnr_wins_spark.operators.merge import snapshot_diff
    from flnr_wins_spark.sources.ptable import ptable_diff

    path = str(tmp_path / "tbl")
    write_ptable(_base(spark), path, "lang")
    change = spark.createDataFrame(
        [(2, "en", 21.0), (6, "en", 60.0)], "id long, lang string, score double"
    )
    dels = spark.createDataFrame([(5, "de")], "id long, lang string")
    merge_ptable(spark, path, change, ["id"], delete_keys=dels)

    got = {tuple(r) for r in ptable_diff(spark, path, 1, 2, ["id"]).collect()}
    full = {
        tuple(r)
        for r in snapshot_diff(
            read_ptable(spark, path, manifest=1),
            read_ptable(spark, path, manifest=2),
            ["id"],
        ).collect()
    }
    assert got == full
    assert got == {(2, "update"), (6, "insert"), (5, "delete")}
    # identical manifests diff to empty without reading any data
    assert ptable_diff(spark, path, 2, 2, ["id"]).count() == 0
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        ptable_diff(spark, path, 1, 9, ["id"])

def test_compact_ptable_merges_small_files_bit_identically(spark, tmp_path):
    """OPTIMIZE: the compacted partition collapses to one data file, reads
    are row-identical before/after, untouched partitions carry by
    reference, and time travel to the pre-compaction manifest is intact."""
    import glob

    from flnr_wins_spark.sources.ptable import compact_ptable, list_partition_files

    path = str(tmp_path / "tbl")
    # force many small files: 60 rows round-robined over 8 tasks before the
    # bootstrap write -> each lang dir gets ~8 files
    langs = ["en", "fr", "de"]
    big = spark.createDataFrame(
        [(i, langs[i % 3], float(i)) for i in range(60)],
        "id long, lang string, score double",
    ).repartition(8)
    write_ptable(big, path, "lang")
    counts = list_partition_files(spark, path)
    assert counts["en"] >= 2  # the fixture actually has the small-file problem
    before = {tuple(r) for r in read_ptable(spark, path).collect()}

    k = compact_ptable(spark, path, min_files=2)
    assert k == 2
    after = {tuple(r) for r in read_ptable(spark, path).collect()}
    assert after == before  # physical rewrite, zero logical change
    # every compacted partition is now exactly one file
    new_counts = list_partition_files(spark, path)
    assert all(n == 1 for n in new_counts.values()), new_counts
    # time travel: the pre-compaction manifest still reads the old stage
    old = {tuple(r) for r in read_ptable(spark, path, manifest=1).collect()}
    assert old == before
    assert glob.glob(f"{path}/stage/m1/lang=en/*.parquet")  # old files intact
    # idempotent: nothing left to compact -> no empty commit
    assert compact_ptable(spark, path, min_files=2) is None
    assert ptable_history(spark, path) == [1, 2]


def test_compact_ptable_named_partitions_only(spark, tmp_path):
    from flnr_wins_spark.sources.ptable import compact_ptable, list_partition_files

    path = str(tmp_path / "tbl")
    write_ptable(_base(spark).repartition(8), path, "lang")
    compact_ptable(spark, path, partitions=["en"])
    counts = list_partition_files(spark, path)
    assert counts["en"] == 1
    # fr was NOT rewritten: still referenced at its m1 stage
    from flnr_wins_spark.sources.ptable import _read_manifest

    m = _read_manifest(spark, path, 2)
    assert m["partitions"]["fr"].startswith("stage/m1/")
    with pytest.raises(FileNotFoundError, match="not in manifest"):
        compact_ptable(spark, path, partitions=["zz"])


def test_compact_survives_vacuum_and_merge_continues(spark, tmp_path):
    """After compaction + vacuum, the table keeps merging normally and the
    vacuumed pre-compaction stage is gone."""
    import os

    from flnr_wins_spark.sources.ptable import compact_ptable

    path = str(tmp_path / "tbl")
    write_ptable(_base(spark).repartition(8), path, "lang")
    # explicit partition list forces a full rewrite regardless of file counts
    compact_ptable(spark, path, partitions=["en", "fr", "de"])
    vacuum_ptable(spark, path, keep_last=1)
    assert not os.path.isdir(f"{path}/stage/m1")
    merge_ptable(
        spark,
        path,
        spark.createDataFrame([(9, "fr", 9.0)], "id long, lang string, score double"),
        ["id"],
    )
    got = {r.id: r.score for r in read_ptable(spark, path).collect()}
    assert got[9] == 9.0 and got[1] == 10.0


def test_repartition_ptable_partition_evolution(spark, tmp_path):
    """Partition evolution: new spec for all FUTURE operations, old
    manifests still read under the old spec, merge works against the new
    spec, and the old partition column survives as a data column."""
    from flnr_wins_spark.sources.ptable import _read_manifest, repartition_ptable

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [
            (1, "en", "news", 10.0), (2, "en", "web", 20.0),
            (3, "fr", "news", 30.0), (4, "de", "web", 40.0),
        ],
        "id long, lang string, origin string, score double",
    )
    write_ptable(df, path, "lang")
    k = repartition_ptable(spark, path, "origin")
    assert k == 2
    m = _read_manifest(spark, path, 2)
    assert m["part_col"] == "origin"
    assert m["meta"] == {"evolved_from": "lang"}
    assert set(m["partitions"]) == {"news", "web"}
    # reads under the new spec: all columns intact
    cur = {tuple(r) for r in
           read_ptable(spark, path).select("id", "lang", "origin", "score").collect()}
    assert cur == {(1, "en", "news", 10.0), (2, "en", "web", 20.0),
                   (3, "fr", "news", 30.0), (4, "de", "web", 40.0)}
    # time travel: pre-evolution manifest still reads (old spec)
    old = read_ptable(spark, path, manifest=1)
    assert {r.id for r in old.collect()} == {1, 2, 3, 4}
    assert {r.lang for r in read_ptable(spark, path, manifest=1,
                                        partitions=["en"]).collect()} == {"en"}
    # merge now operates under the NEW spec: only the named origin partition
    change = spark.createDataFrame(
        [(2, "en", "web", 21.0)], "id long, lang string, origin string, score double"
    )
    merge_ptable(spark, path, change, ["id"])
    m3 = _read_manifest(spark, path, 3)
    assert m3["partitions"]["news"].startswith("stage/m2/")  # untouched, by ref
    got = {r.id: r.score for r in read_ptable(spark, path).collect()}
    assert got == {1: 10.0, 2: 21.0, 3: 30.0, 4: 40.0}
    with pytest.raises(ValueError, match="not in table"):
        repartition_ptable(spark, path, "nope")

def test_zone_map_stats_and_pruning(spark, tmp_path):
    """Partition-level zone maps: min/max per partition ride the manifest,
    prune_partitions answers range predicates from metadata alone, merges
    re-derive stats only for rewritten partitions, and pruning without
    stats is conservative (keeps everything)."""
    from flnr_wins_spark.sources.ptable import (
        _read_manifest, compact_ptable, prune_partitions)

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i // 10), float(i)) for i in range(40)],
        "id long, kb string, score double",
    )
    write_ptable(df, path, "kb", stats_cols=["id", "score"])
    m = _read_manifest(spark, path, 1)
    assert m["stats_cols"] == ["id", "score"]
    assert m["stats"]["0"]["id"] == [0, 9]
    assert m["stats"]["3"]["score"] == [30.0, 39.0]
    # metadata-only pruning: range [12, 25] intersects kb=1 and kb=2 only
    assert prune_partitions(spark, path, "id", 12, 25) == ["1", "2"]
    assert prune_partitions(spark, path, "id", hi=5) == ["0"]
    assert prune_partitions(spark, path, "id", lo=35) == ["3"]
    # the pruned read returns exactly the predicate's rows
    got = read_ptable(
        spark, path, partitions=prune_partitions(spark, path, "id", 12, 25)
    ).filter("id BETWEEN 12 AND 25")
    assert got.count() == 14

    # merge rewrites kb=1 only; its stats re-derive, others carry verbatim
    change = spark.createDataFrame(
        [(12, "1", 999.0)], "id long, kb string, score double"
    )
    merge_ptable(spark, path, change, ["id"])
    m2 = _read_manifest(spark, path, 2)
    assert m2["stats"]["1"]["score"] == [10.0, 999.0]
    assert m2["stats"]["0"] == m["stats"]["0"]
    # compaction carries zone maps verbatim (logically invisible)
    compact_ptable(spark, path, partitions=["1"])
    m3 = _read_manifest(spark, path, 3)
    assert m3["stats"] == m2["stats"]

    # a table without stats: pruning keeps every partition (conservative)
    path2 = str(tmp_path / "tbl2")
    write_ptable(df, path2, "kb")
    assert prune_partitions(spark, path2, "id", 12, 25) == ["0", "1", "2", "3"]


def test_zone_map_survives_partition_evolution_and_deletes(spark, tmp_path):
    from flnr_wins_spark.sources.ptable import _read_manifest, repartition_ptable

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i // 10), "ab"[i % 2], float(i)) for i in range(40)],
        "id long, kb string, grp string, score double",
    )
    write_ptable(df, path, "kb", stats_cols=["id"])
    # all-deleted partition leaves stats too
    dels = spark.createDataFrame(
        [(i, str(i // 10)) for i in range(10)], "id long, kb string"
    )
    empty = spark.createDataFrame([], "id long, kb string, score double")
    merge_ptable(spark, path, empty, ["id"], delete_keys=dels)
    m2 = _read_manifest(spark, path, 2)
    assert "0" not in m2["stats"] and "0" not in m2["partitions"]
    # evolution regroups rows -> stats re-derive under the new spec
    repartition_ptable(spark, path, "grp")
    m3 = _read_manifest(spark, path, 3)
    assert m3["stats"]["a"]["id"] == [10, 38]
    assert m3["stats"]["b"]["id"] == [11, 39]

def test_compact_with_sort_cols_clusters_rows(spark, tmp_path):
    """OPTIMIZE ... ZORDER-style layout: sort_cols sorts rows within each
    partition's single output task, so the rewritten file is physically
    clustered (tight parquet row-group stats) while the logical content
    is unchanged."""
    import glob

    import pyarrow.parquet as pq

    from flnr_wins_spark.sources.ptable import compact_ptable

    path = str(tmp_path / "tbl")
    # shuffled ids, many small files
    df = spark.createDataFrame(
        [((i * 37) % 60, "ab"[i % 2], float(i)) for i in range(60)],
        "id long, grp string, score double",
    ).repartition(8)
    write_ptable(df, path, "grp")
    before = {tuple(r) for r in read_ptable(spark, path).collect()}
    compact_ptable(spark, path, partitions=["a", "b"], sort_cols=["id"])
    after = {tuple(r) for r in read_ptable(spark, path).collect()}
    assert after == before
    for part in ("a", "b"):
        files = glob.glob(f"{path}/stage/m2/grp={part}/*.parquet")
        assert len(files) == 1
        ids = pq.read_table(files[0], columns=["id"])["id"].to_pylist()
        assert ids == sorted(ids)  # physically clustered


def test_partition_rows_metadata_counts(spark, tmp_path):
    """Exact per-partition row counts ride the manifest: carried by
    reference through merge for untouched partitions, re-derived for
    rewritten ones, verbatim through compaction, re-derived under
    partition evolution — and always equal to the data's actual counts."""
    from flnr_wins_spark.sources.ptable import (
        compact_ptable, partition_rows, repartition_ptable)

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 3), float(i)) for i in range(30)],
        "id long, kb string, score double",
    )
    write_ptable(df, path, "kb", stats_cols=["id"])
    assert partition_rows(spark, path) == {"0": 10, "1": 10, "2": 10}

    # merge: 2 inserts into kb=0, 3 deletes from kb=1; kb=2 untouched
    ins = spark.createDataFrame(
        [(100, "0", 1.0), (101, "0", 2.0)], "id long, kb string, score double"
    )
    dels = spark.createDataFrame([(1, "1"), (4, "1"), (7, "1")], "id long, kb string")
    merge_ptable(spark, path, ins, ["id"], delete_keys=dels)
    assert partition_rows(spark, path) == {"0": 12, "1": 7, "2": 10}
    # time travel reads the OLD manifest's counts
    assert partition_rows(spark, path, manifest=1) == {"0": 10, "1": 10, "2": 10}

    # compaction is logically invisible: counts carry verbatim
    compact_ptable(spark, path, min_files=1)
    assert partition_rows(spark, path) == {"0": 12, "1": 7, "2": 10}

    # partition evolution re-derives counts under the new spec
    repartition_ptable(spark, path, "id")
    rows = partition_rows(spark, path)
    assert sum(rows.values()) == 29 and all(n == 1 for n in rows.values())

    # metadata counts always equal the data's own answer
    data_counts = {
        str(r["id"]): r["n"]
        for r in read_ptable(spark, path).groupBy("id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert rows == data_counts

    # a table without stats_cols records no counts: loud, not silent
    path2 = str(tmp_path / "tbl2")
    write_ptable(df, path2, "kb")
    with pytest.raises(FileNotFoundError, match="no row counts"):
        partition_rows(spark, path2)


def test_bloom_point_pruning(spark, tmp_path):
    """Per-partition bloom sidecars prune equality probes from metadata:
    negatives are definitive (the true partition is ALWAYS kept —
    lossless), positives may be false (the read re-filters), merges
    re-derive filters for rewritten partitions, and pruning without a
    bloom is conservative."""
    from flnr_wins_spark.sources.ptable import prune_partitions_eq

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 4), f"user_{i}") for i in range(40)],
        "id long, kb string, name string",
    )
    write_ptable(df, path, "kb", bloom_cols=["name"])

    # every present value's true partition survives pruning (lossless)
    for i in (0, 7, 13, 38):
        assert str(i % 4) in prune_partitions_eq(spark, path, "name", f"user_{i}")
    # pruned read + real filter == plain filter over the full table
    cands = prune_partitions_eq(spark, path, "name", "user_13")
    got = read_ptable(spark, path, partitions=cands).filter("name = 'user_13'")
    assert [(r.id, r.kb) for r in got.collect()] == [(13, "1")]
    # an absent value prunes everything (40 values in 2048 bits: no FPs
    # for this fixed fixture — deterministic, pinned at authoring time)
    assert prune_partitions_eq(spark, path, "name", "user_999") == []

    # merge rewrites kb=2 only; its bloom re-derives and finds the new value
    ins = spark.createDataFrame([(200, "2", "brand_new")], "id long, kb string, name string")
    merge_ptable(spark, path, ins, ["id"])
    assert prune_partitions_eq(spark, path, "name", "brand_new") == ["2"]
    # untouched partitions' filters carried by reference and still work
    assert prune_partitions_eq(spark, path, "name", "user_13") == ["1"]

    # no bloom sidecar -> conservative: every partition kept
    path2 = str(tmp_path / "tbl2")
    write_ptable(df, path2, "kb")
    assert prune_partitions_eq(spark, path2, "name", "user_13") == ["0", "1", "2", "3"]

    # NULL probes are rejected loudly (blooms index non-NULL only)
    with pytest.raises(ValueError, match="non-NULL"):
        prune_partitions_eq(spark, path, "name", None)

    # unsupported bloom column types fail at write time, not probe time
    bad = spark.createDataFrame([(1, "a", 1.5)], "id long, kb string, x double")
    with pytest.raises(TypeError, match="bloom_cols"):
        write_ptable(bad, str(tmp_path / "tbl3"), "kb", bloom_cols=["x"])


def test_bloom_jvm_python_hash_parity(spark, tmp_path):
    """The portability contract: the JVM-side builder (md5 over CAST AS
    STRING, double hashing) and the Python-side prober set/check the SAME
    bits for every supported type — string, integers, date, boolean."""
    import datetime

    from flnr_wins_spark.sources.ptable import (
        _bloom_bits_py, _read_manifest)

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [
            ("p", "héllo wörld", 42, datetime.date(2024, 2, 29), True),
            ("p", "", -7, datetime.date(1999, 12, 31), False),
        ],
        "kb string, s string, i int, d date, b boolean",
    )
    write_ptable(df, path, "kb", bloom_cols=["s", "i", "d", "b"])
    blooms = _read_manifest(spark, path, 1)["blooms"]["p"]
    values = {
        "s": ["héllo wörld", ""],
        "i": [42, -7],
        "d": [datetime.date(2024, 2, 29), datetime.date(1999, 12, 31)],
        "b": [True, False],
    }
    for col, vals in values.items():
        raw = bytes.fromhex(blooms[col])
        for v in vals:
            for b in _bloom_bits_py(v, 2048, 5):
                assert (raw[b // 8] >> (b % 8)) & 1, (col, v, b)


def test_ptable_delta_signed_changeset_prunes_unchanged(spark, tmp_path):
    """ptable_delta emits +1 rows from the new side and -1 rows from the
    old side of CHANGED partitions only (manifest-pruned, no key join);
    unchanged rows cancel exactly under linear aggregates, and a no-op
    pair of manifests yields an empty, correctly-typed delta."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.ptable import ptable_delta

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 3), float(i)) for i in range(30)],
        "id long, kb string, score double",
    )
    write_ptable(df, path, "kb")
    # merge touches kb=0 only: one insert, one delete, one update
    ins = spark.createDataFrame(
        [(100, "0", 1000.0), (6, "0", 66.0)], "id long, kb string, score double"
    )
    dels = spark.createDataFrame([(3, "0")], "id long, kb string")
    merge_ptable(spark, path, ins, ["id"], delete_keys=dels)

    delta = ptable_delta(spark, path, 1, 2)
    # only partition kb=0's rows appear, both signs
    assert {r.kb for r in delta.select("kb").distinct().collect()} == {"0"}
    # signed fold: count delta = +1 insert -1 delete; sum delta =
    # 1000 (insert) - 0 (deleted id 3... score 3.0) + (66 - 6) update
    agg = delta.agg(
        F.sum("sign").alias("dn"),
        F.sum(F.col("sign") * F.col("score")).alias("ds"),
    ).collect()[0]
    assert agg.dn == 0  # +1 insert, -1 delete, updates net zero
    assert agg.ds == 1000.0 - 3.0 + (66.0 - 6.0)
    # the delta applied to the old aggregate equals the new aggregate
    old_sum = sum(r.score for r in read_ptable(spark, path, manifest=1).collect())
    new_sum = sum(r.score for r in read_ptable(spark, path, manifest=2).collect())
    assert old_sum + agg.ds == new_sum

    # identical manifests -> empty delta, schema intact
    empty = ptable_delta(spark, path, 2, 2)
    assert empty.count() == 0
    assert "sign" in empty.columns


def test_bloom_spec_validated_loudly_at_write(spark, tmp_path):
    """Review findings (r7): a misspelled bloom column, the partition
    column itself, k > 8 (JVM long overflow -> silently lossy pruning),
    or a non-byte-aligned m must all fail AT WRITE TIME, never commit a
    table whose point-lookup pruning silently misbehaves."""
    df = spark.createDataFrame(
        [(1, "en", "alpha")], "id long, kb string, name string"
    )
    path = str(tmp_path / "t")
    with pytest.raises(ValueError, match="not in the DataFrame"):
        write_ptable(df, path, "kb", bloom_cols=["nmae"])
    with pytest.raises(ValueError, match="partition column"):
        write_ptable(df, path, "kb", bloom_cols=["kb"])
    with pytest.raises(ValueError, match="bloom_hashes"):
        write_ptable(df, path, "kb", bloom_cols=["name"], bloom_hashes=9)
    with pytest.raises(ValueError, match="bloom_bits"):
        write_ptable(df, path, "kb", bloom_cols=["name"], bloom_bits=2047)
    assert ptable_history(spark, path) == []  # nothing committed


def test_rowcounts_never_fabricated_for_pre_sidecar_manifests(spark, tmp_path):
    """Review finding (r7): merging/compacting a table whose manifest
    predates the rows sidecar must NOT emit a partial 'rows' map —
    partition_rows keeps failing loudly instead of returning counts that
    silently miss the untouched partitions."""
    import json as _json

    from flnr_wins_spark.sources.ptable import compact_ptable, partition_rows

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 3), float(i)) for i in range(12)],
        "id long, kb string, score double",
    )
    write_ptable(df, path, "kb", stats_cols=["id"])
    # simulate an older writer: strip 'rows' from the committed manifest
    mpath = f"{path}/manifests/m1.json"
    with open(mpath) as fh:
        m = _json.load(fh)
    del m["rows"]
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    import os

    crc = f"{path}/manifests/.m1.json.crc"  # hadoop local-FS checksum
    if os.path.exists(crc):
        os.remove(crc)
    ins = spark.createDataFrame([(100, "0", 1.0)], "id long, kb string, score double")
    merge_ptable(spark, path, ins, ["id"])
    with pytest.raises(FileNotFoundError, match="no row counts"):
        partition_rows(spark, path)
    compact_ptable(spark, path, min_files=1)
    with pytest.raises(FileNotFoundError, match="no row counts"):
        partition_rows(spark, path)


def test_ndv_sketches_merge_and_maintain(spark, tmp_path):
    """KMV NDV sidecars: per-partition sketches are exact below k, the
    table-wide merge equals a sketch built over all data (mergeability),
    merges re-derive only rewritten partitions, compaction carries
    verbatim, and an un-opted column fails loudly."""
    from flnr_wins_spark.sources.ptable import (
        _read_manifest, compact_ptable, ndv_partitions, ndv_table)

    path = str(tmp_path / "tbl")
    # 3 partitions; 'val' has 10 distinct values per partition, 20 overall
    df = spark.createDataFrame(
        [(i, str(i % 3), f"v{(i // 3) % 20}") for i in range(120)],
        "id long, kb string, val string",
    )
    write_ptable(df, path, "kb", ndv_cols=["val"], ndv_k=8)
    per = ndv_partitions(spark, path, "val")
    # 20 distinct per partition > k=8: sketch is full, estimate ~20
    assert all(n == 8 for n, _ in per.values())
    tot_n, tot_est = ndv_table(spark, path, "val")
    assert tot_n == 8 and 5 <= tot_est <= 80  # KMV variance at k=8 is wide
    # small-cardinality column would be exact below k: rebuild with k=64
    path2 = str(tmp_path / "tbl2")
    write_ptable(df, path2, "kb", ndv_cols=["val"], ndv_k=64)
    per2 = ndv_partitions(spark, path2, "val")
    assert all((n, est) == (20, 20.0) for n, est in per2.values())
    assert ndv_table(spark, path2, "val") == (20, 20.0)

    # merge rewrites kb=0 only: its sketch re-derives, others carry
    m1 = _read_manifest(spark, path2, 1)["ndv"]
    ins = spark.createDataFrame(
        [(500, "0", "brand_new")], "id long, kb string, val string"
    )
    merge_ptable(spark, path2, ins, ["id"])
    m2 = _read_manifest(spark, path2, 2)["ndv"]
    assert m2["1"] == m1["1"] and m2["2"] == m1["2"]
    assert len(m2["0"]["val"]) == 21  # one new distinct value landed
    assert ndv_table(spark, path2, "val") == (21, 21.0)
    # compaction carries NDV verbatim
    compact_ptable(spark, path2, min_files=1)
    assert _read_manifest(spark, path2, 3)["ndv"] == m2

    with pytest.raises(FileNotFoundError, match="no NDV sketch"):
        ndv_partitions(spark, path2, "id")


def test_read_ptable_prunes_columns_and_pushes_filters(spark, tmp_path):
    """The manifest read stays DECLARATIVE: a projection over
    read_ptable reaches every per-partition parquet scan as a pruned
    ReadSchema, and a row predicate lands in PushedFilters — the union
    construction must not block Catalyst's pruning/pushdown, or a
    2-column projection over a 100 TB table would read every column."""
    import re

    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("kb"),
        F.concat(F.lit("t"), F.col("id")).alias("a"),
        F.concat(F.lit("u"), F.col("id")).alias("b"),
    )
    write_ptable(df, path, "kb")
    plan = (
        read_ptable(spark, path)
        .filter(F.col("id") > 42)
        .select("id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    schemas = set(re.findall(r"ReadSchema: \S+", plan))
    assert schemas == {"ReadSchema: struct<id:bigint>"}, schemas
    assert "GreaterThan(id,42)" in plan


def test_sidecars_key_numeric_looking_string_partitions_correctly(
    spark, tmp_path
):
    """Review finding (r7): partition-value TYPE INFERENCE on the stage
    read re-typed numeric-looking STRING partition values ('07' -> 7),
    keying sidecars under '7' while the manifest says '07' — silently
    disabling stats/blooms/NDV for those partitions. The raw stage read
    must key every sidecar under the manifest's own value."""
    from flnr_wins_spark.sources.ptable import (
        ndv_table, partition_rows, prune_partitions_eq)

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "07", "a"), (2, "07", "b"), (3, "1e2", "c"), (4, "0.50", "c")],
        "id long, kb string, val string",
    )
    write_ptable(
        df, path, "kb", stats_cols=["id"], bloom_cols=["val"], ndv_cols=["val"]
    )
    assert partition_rows(spark, path) == {"07": 2, "0.50": 1, "1e2": 1}
    assert prune_partitions_eq(spark, path, "val", "a") == ["07"]
    assert ndv_table(spark, path, "val") == (3, 3.0)


def test_ndv_spec_validated_loudly_at_write(spark, tmp_path):
    """Unlike blooms (absent filter = fail-safe keep), an absent NDV
    sketch is fail-WRONG — a misspelled ndv_cols would report an
    exact-looking zero. Validation happens at write time."""
    df = spark.createDataFrame([(1, "en", "a")], "id long, kb string, val string")
    with pytest.raises(ValueError, match="not in the DataFrame"):
        write_ptable(df, str(tmp_path / "a"), "kb", ndv_cols=["vall"])
    with pytest.raises(ValueError, match="partition column"):
        write_ptable(df, str(tmp_path / "b"), "kb", ndv_cols=["kb"])
    with pytest.raises(ValueError, match="ndv_k"):
        write_ptable(df, str(tmp_path / "c"), "kb", ndv_cols=["val"], ndv_k=1)


def test_bloom_probe_type_guard(spark, tmp_path):
    """ADVICE r7: a probe whose Python str() differs from Spark's
    CAST(col AS STRING) of the stored values must never hash — it would
    produce a definitive-looking bloom NEGATIVE and silently prune the
    true partition. Equal-under-SQL probes coerce; incompatible ones
    raise loudly. The dtype record survives merge and compaction."""
    import datetime

    from flnr_wins_spark.sources.ptable import (
        _read_manifest,
        compact_ptable,
        prune_partitions_eq,
    )

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 2), i * 10, datetime.date(2024, 1, 1 + i)) for i in range(8)],
        "id long, kb string, num bigint, d date",
    )
    write_ptable(df, path, "kb", bloom_cols=["num", "d"])

    # float probe of a bigint column: 5.0 == 5 in SQL — coerces, lossless
    assert prune_partitions_eq(spark, path, "num", 30.0) == ["1"]
    assert prune_partitions_eq(spark, path, "num", 30) == ["1"]
    # midnight datetime coerces to date; ISO string parses
    assert prune_partitions_eq(
        spark, path, "d", datetime.datetime(2024, 1, 4)
    ) == ["1"]
    assert prune_partitions_eq(spark, path, "d", "2024-01-04") == ["1"]

    # incompatible probes raise instead of lossily pruning
    for col, probe in [
        ("num", 30.5), ("num", True), ("num", "30"),
        ("d", datetime.datetime(2024, 1, 4, 12, 30)), ("d", "Jan 4 2024"),
        ("d", 20240104),
    ]:
        with pytest.raises(TypeError, match="incompatible"):
            prune_partitions_eq(spark, path, col, probe)

    # the dtype record rides merge AND compaction manifests
    ins = spark.createDataFrame(
        [(100, "0", 990, datetime.date(2024, 2, 1))],
        "id long, kb string, num bigint, d date",
    )
    merge_ptable(spark, path, ins, ["id"])
    compact_ptable(spark, path, min_files=1)
    ids = ptable_history(spark, path)
    m = _read_manifest(spark, path, ids[-1])
    assert m["bloom_dtypes"] == {"num": "bigint", "d": "date"}
    with pytest.raises(TypeError, match="incompatible"):
        prune_partitions_eq(spark, path, "num", 990.5)
    assert prune_partitions_eq(spark, path, "num", 990.0) == ["0"]


def test_sample_sidecar_merges_and_maintains(spark, tmp_path):
    """Content-addressed value samples: the merged table-wide sample
    equals a direct full-table construction (mergeability), merges
    re-derive rewritten partitions and carry the rest, compaction
    carries verbatim, and the spec is validated loudly at write time."""
    import hashlib

    from flnr_wins_spark.sources.ptable import (
        _read_manifest,
        compact_ptable,
        sample_values,
    )

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 3), i * 7 % 101) for i in range(60)],
        "id long, kb string, val long",
    )
    write_ptable(df, path, "kb", sample_cols=["val"], sample_k=16)
    got = sample_values(spark, path, "val")
    want = [v for _h, v in sorted(
        {(h60(v), v) for v in {i * 7 % 101 for i in range(60)}}
    )[:16]]
    assert got == want

    # merge: rewrites kb=1 only (new value enters its sample); others carry
    ins = spark.createDataFrame([(100, "1", 9999)], "id long, kb string, val long")
    merge_ptable(spark, path, ins, ["id"])
    m2 = _read_manifest(spark, path, 2)
    m1 = _read_manifest(spark, path, 1)
    assert m2["sample"]["0"] == m1["sample"]["0"]  # carried by reference
    vals_k1 = {v for h, v in m2["sample"]["1"]["val"]}
    full_k1 = {i * 7 % 101 for i in range(60) if str(i % 3) == "1"} | {9999}
    expect_k1 = {v for _h, v in sorted((h60(v), v) for v in full_k1)[:16]}
    assert vals_k1 == expect_k1

    # compaction: physical rewrite, sample carried verbatim
    compact_ptable(spark, path, min_files=1)
    m3 = _read_manifest(spark, path, 3)
    assert m3["sample"] == m2["sample"]
    assert m3["sample_k"] == 16

    # loud validation
    with pytest.raises(ValueError, match="sample_k"):
        write_ptable(df, str(tmp_path / "a"), "kb", sample_cols=["val"], sample_k=1)
    with pytest.raises(ValueError, match="partition column"):
        write_ptable(df, str(tmp_path / "b"), "kb", sample_cols=["kb"])
    bad = spark.createDataFrame([(1, "a", 1.5)], "id long, kb string, x double")
    with pytest.raises(TypeError, match="sample_cols"):
        write_ptable(bad, str(tmp_path / "c"), "kb", sample_cols=["x"])


def test_propose_range_bounds_balances_near_unique_key(spark, tmp_path):
    """The planner's bounds split a near-unique key into buckets whose
    row counts are within 2x of each other; too small a sample raises."""
    from flnr_wins_spark.sources.advisor import (
        propose_range_bounds,
        range_bucket,
    )
    from flnr_wins_spark.sources.ptable import read_ptable

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 4)) for i in range(2000)], "id long, kb string"
    )
    write_ptable(df, path, "kb", sample_cols=["id"], sample_k=256)
    from pyspark.sql import functions as F

    bounds = propose_range_bounds(spark, path, "id", 8)
    assert bounds == sorted(bounds) and len(bounds) == 7
    counts = [
        r.n for r in read_ptable(spark, path)
        .groupBy(range_bucket(F.col("id"), bounds).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 8
    assert max(counts) <= 2 * min(counts), counts
    with pytest.raises(ValueError, match="cannot propose"):
        propose_range_bounds(spark, path, "id", 500)


# ---------------------------------------------------------------------------
# Heavy-hitter sidecars (value-level skew statistics) — round 10
# ---------------------------------------------------------------------------

def _skewed(spark):
    # key 0 hot (200 rows), keys 1..40 cold (5 rows each); partitions
    # balanced (100 rows each) so partition-level counts see NO skew
    rows = []
    rid = 0
    for i in range(200):
        rows.append((0, str(rid % 4), rid)); rid += 1
    for k in range(1, 41):
        for _ in range(5):
            rows.append((k, str(rid % 4), rid)); rid += 1
    return spark.createDataFrame(rows, "k long, pb string, rid long")


def test_heavy_kmin_counts_are_exact_after_merge_rule(spark, tmp_path):
    """Global kmin counts from merged per-partition sidecars must equal a
    real groupBy count — the md5-smallest mergeability argument, checked
    end to end through heavy_hitters()."""
    from flnr_wins_spark.sources.ptable import heavy_hitters, write_ptable

    df = _skewed(spark)
    p = str(tmp_path / "t")
    write_ptable(df, p, "pb", stats_cols=["k"], heavy_cols=["k"],
                 heavy_k=8, heavy_threshold=10)
    kmin, hot = heavy_hitters(spark, p, "k")
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert len(kmin) == 8
    for v, c in kmin:
        assert exact[v] == c, (v, c, exact[v])
    # the hot key is reported with a TIGHT bound: >= 10 in all 4
    # partitions -> every partition reports it -> err == 0, lb exact
    assert hot[0] == [200, 0]
    # cold keys (5 per key, under the threshold everywhere) never hot
    assert set(hot) == {0}


def test_heavy_hot_bound_brackets_truth_when_partially_reported(spark, tmp_path):
    """A key above threshold in SOME partitions only: the merged lower
    bound plus the error bound must bracket the true count."""
    from flnr_wins_spark.sources.ptable import heavy_hitters, write_ptable

    # key 7: 30 copies in partition a, 3 in partition b (threshold 10)
    rows = [(7, "a", i) for i in range(30)] + [(7, "b", 100 + i) for i in range(3)]
    rows += [(i, "a", 200 + i) for i in range(10, 18)]
    rows += [(i, "b", 300 + i) for i in range(10, 18)]
    df = spark.createDataFrame(rows, "k long, pb string, rid long")
    p = str(tmp_path / "t")
    write_ptable(df, p, "pb", stats_cols=["k"], heavy_cols=["k"],
                 heavy_k=4, heavy_threshold=10)
    _kmin, hot = heavy_hitters(spark, p, "k")
    lb, err = hot[7]
    true = 33
    assert lb <= true <= lb + err, (lb, err)
    # partition b holds < threshold copies; if its kmin (k=4 smallest
    # hashes of 9 distinct values) happens to include key 7 the bound is
    # exact, else the error is one partition's worth
    assert err in (0, 9)


def test_heavy_spec_validation(spark, tmp_path):
    from flnr_wins_spark.sources.ptable import write_ptable

    df = _skewed(spark).withColumn("f", F.col("rid").cast("double"))
    p = str(tmp_path / "t")
    with pytest.raises(ValueError, match="partition column"):
        write_ptable(df, p, "pb", heavy_cols=["pb"])
    with pytest.raises(ValueError, match="heavy_threshold"):
        write_ptable(df, p, "pb", heavy_cols=["k"], heavy_threshold=1)
    with pytest.raises(ValueError, match="not in the DataFrame"):
        write_ptable(df, p, "pb", heavy_cols=["nope"])
    with pytest.raises(TypeError, match="heavy_cols"):
        write_ptable(df, p, "pb", heavy_cols=["f"])


def test_merge_carries_heavy_by_reference_and_rederives(spark, tmp_path):
    """A merge touching ONE partition must re-derive that partition's
    heavy entry and carry every other partition's byte-for-byte — then
    the merged kmin counts are exact on the post-merge table."""
    from flnr_wins_spark.sources.ptable import (
        _manifest_ids, _read_manifest, heavy_hitters, merge_ptable,
        read_ptable, write_ptable,
    )

    df = _skewed(spark)
    p = str(tmp_path / "t")
    write_ptable(df, p, "pb", stats_cols=["k"], heavy_cols=["k"],
                 heavy_k=8, heavy_threshold=10)
    m1 = _read_manifest(spark, p, _manifest_ids(spark, p)[-1])
    # upsert 5 more key-0 rows into partition '1' only (fresh rids)
    delta = spark.createDataFrame(
        [(0, "1", 10_000 + i) for i in range(5)], "k long, pb string, rid long"
    )
    merge_ptable(spark, p, delta, ["rid"])
    m2 = _read_manifest(spark, p, _manifest_ids(spark, p)[-1])
    for part in ("0", "2", "3"):
        assert m2["heavy"][part] == m1["heavy"][part]  # carried by reference
    assert m2["heavy"]["1"] != m1["heavy"]["1"]        # re-derived
    kmin, hot = heavy_hitters(spark, p, "k")
    post = read_ptable(spark, p)
    exact = {r["k"]: r["n"] for r in post.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for v, c in kmin:
        assert exact[v] == c
    assert hot[0] == [205, 0]


def test_heavy_requires_sidecar_and_bounded_hot_list(spark, tmp_path):
    from flnr_wins_spark.sources.ptable import heavy_hitters, write_ptable

    df = _skewed(spark)
    p = str(tmp_path / "t")
    write_ptable(df, p, "pb")
    with pytest.raises(FileNotFoundError, match="heavy"):
        heavy_hitters(spark, p, "k")
