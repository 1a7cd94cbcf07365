"""Generic format sources/sinks (CSV, JSON lines, XML, ORC, Parquet).

The reference ingests exactly one format (File Geodatabase export,
``src/wins_transform_staging.py:122-134``) and trusts it blindly via
``Append NO_TEST``. Here ingestion is format-pluggable and schema-ENFORCED:
semi-structured formats (csv/json) never infer — inference at 100 TB means a
full extra pass over the data and a schema that drifts with the sample — the
caller supplies the contract StructType and rows are aligned to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SELF_DESCRIBING = {"parquet", "orc"}
_SEMI_STRUCTURED = {"csv", "json", "xml"}
# Spark 4 ships the XML source built in; rows nest under a repeated element
_XML_DEFAULTS = {"rowTag": "row", "rootTag": "rows"}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read ``path`` in ``fmt``. csv/json REQUIRE an explicit schema (no
    inference pass); parquet/orc carry their own and ``schema`` acts as an
    assertion via select-alignment."""
    fmt = fmt.lower()
    if fmt in _SEMI_STRUCTURED and schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema at scale")
    reader = spark.read.format(fmt)
    if schema is not None and fmt in _SEMI_STRUCTURED:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt == "xml":
        reader = reader.option("rowTag", _XML_DEFAULTS["rowTag"])
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load(path)
    if schema is not None and fmt in _SELF_DESCRIBING:
        df = df.select(*[f.name for f in schema.fields])  # order + presence check
    return df


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write ``df`` to ``path`` in ``fmt``; overwrite-mode by default (the
    engine's idempotence stance, SURVEY.md §4)."""
    w = df.write.format(fmt.lower()).mode(mode)
    if fmt.lower() == "csv":
        w = w.option("header", "true")
    if fmt.lower() == "xml":
        for k, v in _XML_DEFAULTS.items():
            w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save(path)


def write_binary_files(
    df, path: str, name_col: str = "name", content_col: str = "content"
) -> None:
    """Executor-parallel binary-file sink: one file per row (media dataset
    export — the write half of Spark's built-in ``binaryFile`` source).
    Rows write from ``foreachPartition`` on the executors, so no content
    ever funnels through the driver; ``path`` must therefore be a
    filesystem every executor can reach (local dir in local mode, NFS or a
    fuse-mounted object store on a cluster — plain ``open()`` here, the
    Python workers have no JVM gateway for the Hadoop FS API).

    Names containing a path separator, ``..``, or a ``.tmp-`` prefix are
    rejected (a hostile name must not escape ``path``, and a legitimate
    ``.tmp-x`` row would collide with row x's in-flight temp file and be
    silently destroyed by its rename), and each file writes to a
    ``.tmp-`` sibling then ``os.replace``s into place so a task that dies
    mid-write leaves no partial file under the final name (task retries
    simply overwrite — the write is idempotent per name). The directory
    is created ON THE EXECUTORS (inside the partition function): the
    driver's filesystem may not even mount ``path`` in the NFS/fuse
    deployments this sink exists for."""
    import os

    def write_part(rows):
        made = False
        for r in rows:
            if not made:
                os.makedirs(path, exist_ok=True)
                made = True
            name = r[name_col]
            if (
                not name
                or os.sep in name
                or (os.altsep and os.altsep in name)
                or ".." in name
                or name.startswith(".tmp-")
            ):
                raise ValueError(
                    f"write_binary_files: unsafe file name {name!r} "
                    "(must not contain path separators, '..', or a "
                    "'.tmp-' prefix)"
                )
            final = os.path.join(path, name)
            tmp = os.path.join(path, f".tmp-{name}")
            with open(tmp, "wb") as fh:
                fh.write(bytes(r[content_col]))
            os.replace(tmp, final)

    df.select(name_col, content_col).foreachPartition(write_part)
