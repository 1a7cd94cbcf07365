"""Round-trip tests for the pluggable format sources/sinks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from flnr_wins_spark.sources.formats import read_any, write_any

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.0)], SCHEMA
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "xml"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_any(sample, path, fmt=fmt)
    got = read_any(spark, path, fmt=fmt, schema=SCHEMA)
    assert got.schema == SCHEMA
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, sample.collect()))


def test_semi_structured_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, str(tmp_path), fmt="csv")


def test_partitioned_write(spark, sample, tmp_path):
    path = str(tmp_path / "bykey")
    write_any(sample, path, fmt="parquet", partition_by=["k"])
    import os

    assert sorted(d for d in os.listdir(path) if d.startswith("k="))
    got = read_any(spark, path, fmt="parquet")
    assert got.count() == 3


def test_write_binary_files_round_trip(spark, tmp_path):
    from flnr_wins_spark.sources.formats import write_binary_files

    df = spark.createDataFrame(
        [(f"f{i}.bin", bytearray(bytes([i] * (i + 1)))) for i in range(5)],
        "name string, content binary",
    )
    out = str(tmp_path / "bin")
    write_binary_files(df, out)
    back = spark.read.format("binaryFile").load(out)
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in back.collect()}
    assert got == {f"f{i}.bin": bytes([i] * (i + 1)) for i in range(5)}
    # no temp leftovers from the write-then-rename protocol
    assert not [f for f in os.listdir(out) if f.startswith(".tmp-")]


def test_write_binary_files_rejects_traversal_names(spark, tmp_path):
    import pytest

    from flnr_wins_spark.sources.formats import write_binary_files

    out = str(tmp_path / "bin")
    for bad in ["../escape.bin", "a/b.bin", "..", ""]:
        df = spark.createDataFrame(
            [(bad, bytearray(b"x"))], "name string, content binary"
        )
        with pytest.raises(Exception, match="unsafe file name|ValueError"):
            write_binary_files(df, out)
    # nothing escaped the target directory
    assert not (tmp_path / "escape.bin").exists()


def test_write_binary_files_rejects_tmp_prefix_names(spark, tmp_path):
    """Review finding: a legitimate '.tmp-x' row collided with row 'x's
    in-flight temp file and was silently destroyed by its rename."""
    from flnr_wins_spark.sources.formats import write_binary_files

    df = spark.createDataFrame(
        [(".tmp-x", bytearray(b"a")), ("x", bytearray(b"b"))],
        "name string, content binary",
    )
    with pytest.raises(Exception, match="unsafe file name"):
        write_binary_files(df, str(tmp_path / "bin"))
