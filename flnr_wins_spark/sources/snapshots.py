"""Versioned table snapshots with time travel (vanilla-parquet MVCC).

The reference pipeline drops and rewrites its staging output in place
(`/root/reference/src/wins_transform_staging.py` — overwrite semantics, no
history); a production engine wants what the table formats (Delta/Iceberg)
provide — readers isolated from in-flight writes, and the ability to read
yesterday's snapshot — without requiring their jars. This is the
poor-man's-but-correct construction on plain parquet:

  * every write lands in a fresh ``v<N>`` directory — existing data is
    NEVER mutated;
  * a version is visible only once its ``_SUCCESS`` marker exists (Spark
    writes it last), so readers can never observe a partial write;
  * ``read_snapshot`` resolves "latest complete", an explicit version, or
    an as-of timestamp (by marker mtime) — time travel;
  * ``vacuum`` prunes old versions but always keeps the newest
    ``keep_last`` so in-flight readers finish.

Single-writer-per-table is assumed (version allocation is max+1, the same
contract as the streaming sinks' versioned state); multi-writer needs a
coordination layer this engine deliberately does not fake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    from flnr_wins_spark.fsutil import hadoop_fs

    return hadoop_fs(spark, path)


def _versions(spark: SparkSession, table_path: str) -> list[int]:
    fs, jpath = _fs(spark, table_path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def _is_complete(spark: SparkSession, table_path: str, v: int) -> bool:
    fs, jpath = _fs(spark, f"{table_path}/v{v}/_SUCCESS")
    return bool(fs.exists(jpath))


def _complete_versions(spark: SparkSession, table_path: str) -> list[int]:
    return [v for v in _versions(spark, table_path) if _is_complete(spark, table_path, v)]


def write_snapshot(df: DataFrame, table_path: str) -> int:
    """Write ``df`` as the table's next version; returns the version
    number. The data becomes visible atomically when Spark drops the
    ``_SUCCESS`` marker at job completion — never mutates prior versions."""
    spark = df.sparkSession
    vs = _versions(spark, table_path)
    v = (vs[-1] + 1) if vs else 1
    df.write.mode("error").parquet(f"{table_path}/v{v}")
    return v


def snapshot_history(
    spark: SparkSession, table_path: str, _complete: list[int] | None = None
) -> list[dict]:
    """[{'version': N, 'committed_at_ms': marker mtime}] for every COMPLETE
    version, oldest first. ``_complete`` lets callers that already listed
    the versions skip a second round of remote-FS metadata RPCs."""
    out = []
    for v in (_complete if _complete is not None
              else _complete_versions(spark, table_path)):
        fs, jpath = _fs(spark, f"{table_path}/v{v}/_SUCCESS")
        out.append(
            {"version": v, "committed_at_ms": fs.getFileStatus(jpath).getModificationTime()}
        )
    return out


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Read the newest complete version (default), an explicit ``version``,
    or the newest version committed at/before ``as_of_ms`` (time travel).
    Raises ``FileNotFoundError`` when nothing qualifies — including an
    explicit version whose write never completed (no ``_SUCCESS``)."""
    if version is not None and as_of_ms is not None:
        raise ValueError("pass version OR as_of_ms, not both")
    complete = _complete_versions(spark, table_path)
    if version is not None:
        if version not in complete:
            raise FileNotFoundError(
                f"version v{version} of {table_path} does not exist or is incomplete"
            )
        pick = version
    elif as_of_ms is not None:
        eligible = [
            h["version"]
            for h in snapshot_history(spark, table_path, _complete=complete)
            if h["committed_at_ms"] <= as_of_ms
        ]
        if not eligible:
            raise FileNotFoundError(f"no snapshot of {table_path} at/before {as_of_ms}")
        pick = eligible[-1]
    else:
        if not complete:
            raise FileNotFoundError(f"no complete snapshot under {table_path}")
        pick = complete[-1]
    return spark.read.parquet(f"{table_path}/v{pick}")


def merge_snapshot(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    key_cols: list[str],
    delete_keys: DataFrame | None = None,
) -> int:
    """MERGE a changeset into the versioned table — upsert-into-version
    with schema evolution, the Delta ``MERGE ... withSchemaEvolution()``
    analog on the snapshot layer: read the newest complete version, apply
    :func:`flnr_wins_spark.operators.merge.merge_upsert_evolve` (matched
    rows updated column-wise, new rows inserted, new source columns added
    to the schema, safe type widening), and commit the result as the next
    version. Returns the new version number.

    Because every version is immutable, schema evolution is free of the
    usual in-place-ALTER hazards: old versions keep their old schema and
    stay readable via time travel; only readers of the NEW version see the
    evolved columns. Bootstrap: with no prior complete version, the source
    itself becomes v1 (MERGE into an empty table inserts everything).

    Cost shape: one full-outer join on the key plus one full rewrite of the
    table directory — the rewrite is inherent to format-less parquet MVCC
    (Delta/Iceberg avoid it with file-level manifests; this layer
    deliberately stays jar-free). For delta-proportional cost on huge
    tables, keep the aggregate small (incremental_agg) or partition the
    table path and merge only touched partitions.
    """
    try:
        target = read_snapshot(spark, table_path)
    except FileNotFoundError:
        out = source
        if delete_keys is not None:
            out = out.join(delete_keys.select(*key_cols), list(key_cols), "left_anti")
        return write_snapshot(out, table_path)
    from flnr_wins_spark.operators.merge import merge_upsert_evolve

    merged = merge_upsert_evolve(target, source, key_cols, delete_keys=delete_keys)
    return write_snapshot(merged, table_path)


def vacuum(spark: SparkSession, table_path: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` complete versions (and any
    incomplete stragglers older than them). Returns the deleted versions."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    complete = _complete_versions(spark, table_path)
    if not complete:
        # nothing committed yet: any version directory present is an
        # in-flight first write — deleting it would yank the directory out
        # from under the running job, so vacuum is a no-op here
        return []
    keep = set(complete[-keep_last:])
    deleted = []
    for v in _versions(spark, table_path):
        if v in keep or (v not in complete and complete and v > complete[-1]):
            continue  # keep retained versions and any in-flight newer write
        fs, jpath = _fs(spark, f"{table_path}/v{v}")
        fs.delete(jpath, True)
        deleted.append(v)
    return deleted
