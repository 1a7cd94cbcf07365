"""Hadoop FileSystem access for driver-side control flow.

ONE copy of the py4j FileSystem-resolution idiom (previously repeated in
sources/catalog.py, sources/snapshots.py, and streaming/sinks.py): resolve
a path against whatever filesystem owns it — local, hdfs://, s3a://,
abfs:// — through the JVM Hadoop API, because ``os.path`` only answers for
the driver's local disk.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` on the filesystem that owns it."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath
